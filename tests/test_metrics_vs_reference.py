"""Metric parity against the reference's own vendored scorers.

The reference's BLEU/ROUGE-L/CIDEr are pure Python
(/root/reference/coco_caption/pycocoevalcap/...) and import cleanly under
py3, so they serve as exact oracles for our reimplementations: random
caption corpora must score IDENTICALLY (the coco-caption numbers are the
ground truth the METEOR-30.1 table was computed with).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/coco_caption")

try:
    from pycocoevalcap.bleu.bleu import Bleu as RefBleu
    from pycocoevalcap.cider.cider import Cider as RefCider
    from pycocoevalcap.rouge.rouge import Rouge as RefRouge
    HAVE_REF = True
except Exception:  # reference checkout not mounted
    HAVE_REF = False

from s2vt_tpu.metrics import Bleu, Cider, Rouge

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason="reference scorers unavailable")

_WORDS = ("a the cat dog man woman is runs jumps sits plays guitar ball "
          "red blue small big on in with and").split()


def _corpus(seed, n_imgs=12, max_refs=4, max_len=12):
    rng = np.random.default_rng(seed)
    gts, res = {}, {}
    for i in range(n_imgs):
        key = f"img{i}"
        gts[key] = [" ".join(rng.choice(_WORDS, rng.integers(2, max_len)))
                    for _ in range(rng.integers(1, max_refs + 1))]
        res[key] = [" ".join(rng.choice(_WORDS, rng.integers(1, max_len)))]
    return gts, res


@pytest.mark.parametrize("seed", range(6))
def test_bleu_exact_match(seed):
    gts, res = _corpus(seed)
    want, want_per = RefBleu(4).compute_score(gts, res)
    got, got_per = Bleu(4).compute_score(gts, res)
    np.testing.assert_allclose(got, want, atol=1e-9)
    np.testing.assert_allclose(got_per, want_per, atol=1e-9)


@pytest.mark.parametrize("seed", range(6))
def test_rouge_exact_match(seed):
    gts, res = _corpus(seed)
    want, want_per = RefRouge().compute_score(gts, res)
    got, got_per = Rouge().compute_score(gts, res)
    np.testing.assert_allclose(got, want, atol=1e-9)
    np.testing.assert_allclose(got_per, want_per, atol=1e-9)


@pytest.mark.parametrize("seed", range(6))
def test_cider_exact_match(seed):
    gts, res = _corpus(seed)
    want, want_per = RefCider().compute_score(gts, res)
    got, got_per = Cider().compute_score(gts, res)
    np.testing.assert_allclose(got, want, atol=1e-8)
    np.testing.assert_allclose(got_per, want_per, atol=1e-8)


def test_single_image_corpus():
    """n=1 exercises BLEU's 'average' reflen branch and CIDEr's
    log(#images)=0 idf corner."""
    gts = {"x": ["a cat sits on the mat", "the cat is sitting"]}
    res = {"x": ["a cat sits on a mat"]}
    for ref_cls, our_cls in ((RefBleu, Bleu), (RefRouge, Rouge),
                             (RefCider, Cider)):
        ref = ref_cls(4) if ref_cls is RefBleu else ref_cls()
        ours = our_cls(4) if our_cls is Bleu else our_cls()
        want, _ = ref.compute_score(gts, res)
        got, _ = ours.compute_score(gts, res)
        np.testing.assert_allclose(got, want, atol=1e-8)
