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

from s2vt_tpu.metrics import Bleu, Cider, Meteor, PTBTokenizer, Rouge


class COCOEvalCap:
    """Usage: ``COCOEvalCap(gts, res).evaluate()`` where gts/res map
    image_id -> [{'caption': str}, ...] (coco annotation format)."""

    def __init__(self, gts: Dict, res: Dict, meteor_jar: str = None):
        self.evalImgs: List[dict] = []
        self.eval: Dict[str, float] = {}
        self.imgToEval: Dict[str, dict] = {}
        self.gts = gts
        self.res = res
        self.meteor_jar = meteor_jar
        self.params = {"image_id": sorted(set(gts) & set(res))}

    def evaluate(self) -> Dict[str, float]:
        ids = self.params["image_id"]
        gts = {i: self.gts[i] for i in ids}
        res = {i: self.res[i] for i in ids}

        tokenizer = PTBTokenizer()
        gts = tokenizer.tokenize(gts)
        res = tokenizer.tokenize(res)

        scorers = [
            (Bleu(4), ["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4"]),
            (Meteor(jar_path=self.meteor_jar), "METEOR"),
            (Rouge(), "ROUGE_L"),
            (Cider(), "CIDEr"),
        ]
        for scorer, method in scorers:
            score, scores = scorer.compute_score(gts, res)
            if isinstance(method, list):
                for sc, scs, m in zip(score, scores, method):
                    self.setEval(sc, m)
                    self.setImgToEvalImgs(scs, ids, m)
            else:
                self.setEval(score, method)
                self.setImgToEvalImgs(scores, ids, method)
        self.setEvalImgs()
        return self.eval

    def setEval(self, score: float, method: str) -> None:
        self.eval[method] = score

    def setImgToEvalImgs(self, scores, img_ids, method) -> None:
        for img_id, score in zip(img_ids, scores):
            self.imgToEval.setdefault(img_id, {"image_id": img_id})[method] = score

    def setEvalImgs(self) -> None:
        self.evalImgs = [self.imgToEval[i] for i in sorted(self.imgToEval)]
