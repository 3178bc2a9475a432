from s2vt_tpu.models.s2vt import S2VT  # noqa: F401
from s2vt_tpu.models.attention import AttBaseline  # noqa: F401
from s2vt_tpu.models.beam import beam_search  # noqa: F401
