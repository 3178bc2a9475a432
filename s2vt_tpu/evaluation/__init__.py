from s2vt_tpu.evaluation.decode import (  # noqa: F401
    CaptionDecoder,
    greedy_eval,
    beam_eval,
    ids_to_sentence,
)
from s2vt_tpu.evaluation.scorer import (  # noqa: F401
    COCOScorer,
    pred_to_coco_samples_IDs,
    score_predictions,
)
from s2vt_tpu.evaluation.coco_eval import COCOEvalCap  # noqa: F401
