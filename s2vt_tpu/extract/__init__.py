from s2vt_tpu.extract.backbones import build_backbone, BACKBONE_SPECS  # noqa: F401
from s2vt_tpu.extract.preprocess import (  # noqa: F401
    preprocess_frames,
    fix_sample_indices,
    free_sample_indices,
)
from s2vt_tpu.extract.pipeline import FeatureExtractor, extract  # noqa: F401
