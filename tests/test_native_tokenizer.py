"""Parity for the native C++ PTB tokenizer backend.

native/s2vt_tokenize.cpp must be token-for-token identical to the nltk
Treebank backend (itself pinned to recorded Stanford-jar outputs by
test_tokenizer_golden.py) — on the golden fixtures, on adversarial
rule-chain cases, and on a deterministic fuzz corpus.
"""

import random
import shutil

import pytest

from s2vt_tpu.metrics.tokenizer import PTBTokenizer

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="g++ unavailable")


@pytest.fixture(scope="module")
def pair():
    return PTBTokenizer(backend="nltk"), PTBTokenizer(backend="native")


# Every rule in the chain gets at least one case.
CASES = [
    # golden fixture sentences (test_tokenizer_golden.py)
    '"Oh, no," she\'s saying, "our $400 blender can\'t handle something '
    'this hard!"',
    "a man is playing a guitar.",
    "the dog (a poodle) runs",
    "it's a cat",
    "don't stop... now",
    "I'll go -- you stay",
    "two-year-old child",
    "a woman is slicing an onion; the knife is sharp",
    # starting/ending quotes
    '"quoted start" and mid "quote" end',
    "he said ''double'' and `back` ``ticks``",
    # punctuation: colon/comma digit vs non-digit, trailing
    "at 3:30, we eat 3,000 grapes:",
    "costs $3.88 @home #tag 50% & more;",
    # final period with closers
    'she left (quietly).',
    "wait...",
    # contraction battery (ENDING_QUOTES + CONTRACTIONS2/3)
    "she's he'd i'm we'll they're you've isn't cannot gimme gonna gotta "
    "lemme wanna more'n d'ye 'tis 'twas",
    # possessive-after-word, quote-after-space
    "the dogs' bones and the cat 's toy",
    # brackets of all kinds
    "a [b] {c} <d> (e)",
    # double dash / hyphen mix
    "pre--post one-two --",
    # empty-ish and whitespace
    "",
    "   ",
    "word",
    # unicode passthrough (lowercased by the wrapper)
    "a café naïve 'résumé' test.",
]


@pytest.mark.parametrize("raw", CASES, ids=[c[:24] or "<empty>" for c in CASES])
def test_native_matches_nltk(pair, raw):
    nltk_tok, native_tok = pair
    assert native_tok._tokenize_line(raw) == nltk_tok._tokenize_line(raw)


def test_native_matches_nltk_fuzz(pair):
    nltk_tok, native_tok = pair
    rng = random.Random(1234)
    words = ["a", "the", "man's", "don't", "it's", "we'll", "they're",
             "i've", "isn't", "cannot", "gonna", "wanna", "dog", "cat,",
             "runs.", "fast!", "really?", "(yes)", "[no]", "{maybe}",
             "3.88", "3,000", "3:30", "$5", "50%", "a-b", "--", "...",
             '"hi"', "''", "``", "'tis", "x;", "y:", "&", "@", "#"]
    for _ in range(300):
        raw = " ".join(rng.choice(words) for _ in range(rng.randint(1, 12)))
        assert native_tok._tokenize_line(raw) == nltk_tok._tokenize_line(raw), raw


def test_native_through_metric_interface(pair):
    _, native_tok = pair
    got = native_tok.tokenize({"v1": [{"caption": "A man (quickly) "
                                                  "can't stop."}]})
    assert got == {"v1": ["a man quickly ca n't stop"]}


def test_native_long_line_buffer_growth(pair):
    nltk_tok, native_tok = pair
    raw = " ".join(["(don't)"] * 500)  # expansion > 4x triggers the retry
    assert native_tok._tokenize_line(raw) == nltk_tok._tokenize_line(raw)
