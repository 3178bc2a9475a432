from s2vt_tpu.data.corpus import (  # noqa: F401
    build_vocab,
    parse_csv,
    parse_msr_vtt,
    load_captions,
)
from s2vt_tpu.data.dataset import VideoDataset, Batch, make_synthetic_corpus  # noqa: F401
