"""COCOEvalCap-equivalent all-metrics harness.

The reference vendors an upstream ``COCOEvalCap`` that is dead code (its
SPICE import is missing, /root/reference/coco_caption/pycocoevalcap/
eval.py:7) and reimplements scoring in ``COCOScorer`` (eval.py:155). This
class provides the upstream's API surface (``evaluate()``, ``eval``,
``imgToEval``, ``evalImgs``, ``params``) over plain caption dicts, backed
by the java-free metric layer; SPICE is intentionally not included (it was
never runnable in the reference either).
"""

from __future__ import annotations

from typing import Dict, List

from s2vt_tpu.evaluation.scorer import COCOScorer


class COCOEvalCap:
    """Usage: ``COCOEvalCap(gts, res).evaluate()`` where gts/res map
    image_id -> [{'caption': str}, ...] (coco annotation format).

    Thin adapter over :class:`COCOScorer` (the reference's eval.py:155
    harness) exposing the upstream attribute surface."""

    def __init__(self, gts: Dict, res: Dict, meteor_jar: str = None):
        self.evalImgs: List[dict] = []
        self.eval: Dict[str, float] = {}
        self.imgToEval: Dict[str, dict] = {}
        self.gts = gts
        self.res = res
        self.meteor_jar = meteor_jar
        self.params = {"image_id": sorted(set(gts) & set(res))}

    def evaluate(self) -> Dict[str, float]:
        scorer = COCOScorer(verbose=False, meteor_jar=self.meteor_jar)
        self.eval = scorer.score(self.gts, self.res, self.params["image_id"])
        self.imgToEval = scorer.imgToEval
        self.evalImgs = [self.imgToEval[i] for i in sorted(self.imgToEval)]
        return self.eval
