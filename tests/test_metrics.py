"""Golden-value and invariance tests for the metric layer.

BLEU/ROUGE-L/CIDEr are pure functions (SURVEY.md §4 recommends golden
tests); values are checked against hand-computed results of the coco-caption
formulas (/root/reference/coco_caption/pycocoevalcap/...).
"""

import math

import pytest

from s2vt_tpu.metrics import Bleu, Cider, Meteor, PTBTokenizer, Rouge


GTS = {
    "v1": ["a man is playing a guitar", "a man plays the guitar"],
    "v2": ["a cat is sleeping on the couch"],
}
RES_PERFECT = {"v1": ["a man is playing a guitar"],
               "v2": ["a cat is sleeping on the couch"]}
RES_PARTIAL = {"v1": ["a man is playing"],
               "v2": ["a dog is running outside"]}


def test_bleu_perfect_match_is_one():
    score, per_img = Bleu(4).compute_score(GTS, RES_PERFECT)
    for s in score:
        assert s == pytest.approx(1.0, abs=1e-6)
    assert len(per_img) == 4 and len(per_img[0]) == 2


def test_bleu_partial_brevity_penalty():
    """v1 hyp 'a man is playing' (len 4): all 1-grams match, closest ref len
    is 5 -> BP = exp(1 - 5/4). Corpus BLEU-1 folds in v2's 2/5 matches
    ('a', 'is') with reflen 7: p1 = (4+2)/(4+5), BP = exp(1 - 12/9)."""
    score, _ = Bleu(4).compute_score(GTS, RES_PARTIAL)
    p1 = 6.0 / 9.0
    bp = math.exp(1 - 12.0 / 9.0)
    assert score[0] == pytest.approx(p1 * bp, abs=1e-6)


def test_rouge_perfect_and_ordering():
    score, per = Rouge().compute_score(GTS, RES_PERFECT)
    assert score == pytest.approx(1.0, abs=1e-6)
    score2, per2 = Rouge().compute_score(GTS, RES_PARTIAL)
    assert 0.0 < score2 < score
    assert per2[0] > per2[1], "v1 partial overlaps more than v2"


def test_rouge_lcs_value():
    """hyp 'a man is playing' vs ref 'a man is playing a guitar':
    LCS=4, P=4/4, R=4/6, beta=1.2 -> F = (1+b^2)PR/(R+b^2*P)."""
    score, per = Rouge().compute_score(
        {"x": ["a man is playing a guitar"]}, {"x": ["a man is playing"]})
    p, r, b = 1.0, 4.0 / 6.0, 1.2
    want = (1 + b * b) * r * p / (r + b * b * p)
    assert per[0] == pytest.approx(want, abs=1e-6)


def test_cider_identity_scores_highest():
    score_perfect, per = Cider().compute_score(GTS, RES_PERFECT)
    score_partial, per2 = Cider().compute_score(GTS, RES_PARTIAL)
    assert score_perfect > score_partial
    assert per[0] > 0 and per[1] > 0
    # v2 hyp shares only stopword-ish unigrams -> near zero under tf-idf
    assert per2[1] < per[1]


def test_meteor_identical_matches_formula():
    """Identical hyp/ref: P=R=1, fmean=1, chunks=1 ->
    score = 1 - gamma * (1/m)^beta (METEOR 1.5 en parameters)."""
    m = Meteor(backend="lite")
    hyp = "a cat is sleeping on the couch"
    n = len(hyp.split())
    score, per = m.compute_score({"x": [hyp]}, {"x": [hyp]})
    want = 1.0 - 0.6 * (1.0 / n) ** 0.2
    assert per[0] == pytest.approx(want, abs=1e-6)


def test_meteor_orders_by_overlap():
    m = Meteor(backend="lite")
    score_good, _ = m.compute_score(GTS, RES_PERFECT)
    score_bad, _ = m.compute_score(GTS, RES_PARTIAL)
    assert score_good > score_bad > 0.0


def test_meteor_stem_stage():
    """'plays' vs 'playing' only match through the Porter-stem stage."""
    m = Meteor(backend="lite")
    _, per_exact = m.compute_score({"x": ["the man plays"]},
                                   {"x": ["the man plays"]})
    _, per_stem = m.compute_score({"x": ["the man plays"]},
                                  {"x": ["the man playing"]})
    assert 0.0 < per_stem[0] < per_exact[0]


def test_ptb_tokenizer_contract():
    tok = PTBTokenizer()
    out = tok.tokenize({"v": [{"caption": "A man, playing (the) guitar!"}]})
    assert out["v"][0] == "a man playing the guitar"


def test_ptb_tokenizer_contractions():
    tok = PTBTokenizer()
    out = tok.tokenize({"v": ["Don't stop the music."]})
    assert out["v"][0] in ("do n't stop the music",), out["v"][0]
