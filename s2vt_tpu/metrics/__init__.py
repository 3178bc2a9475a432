from s2vt_tpu.metrics.bleu import Bleu  # noqa: F401
from s2vt_tpu.metrics.rouge import Rouge  # noqa: F401
from s2vt_tpu.metrics.cider import Cider, CiderD  # noqa: F401
from s2vt_tpu.metrics.meteor import Meteor  # noqa: F401
from s2vt_tpu.metrics.tokenizer import PTBTokenizer  # noqa: F401
