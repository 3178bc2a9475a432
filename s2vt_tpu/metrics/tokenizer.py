"""PTB tokenization for metric scoring, java-free.

The reference shells out to the Stanford CoreNLP PTBTokenizer jar with
``-preserveLines -lowerCase`` and strips a fixed punctuation list
(/root/reference/coco_caption/pycocoevalcap/tokenizer/ptbtokenizer.py:21-66);
the jar itself is a missing large blob in the reference checkout. This
implementation reproduces that behavior host-side:

 - primary backend: nltk's TreebankWordTokenizer (a faithful reimplementation
   of the PTB sed script: splits contractions "don't"->"do n't", separates
   punctuation, brackets to -LRB-/-RRB-),
 - fallback: a regex tokenizer with the same core rules, used if nltk is
   unavailable,
 - native backend (``backend='native'``): the C++ implementation of the
   same PTB rule chain (native/s2vt_tokenize.cpp, SURVEY.md's prescribed
   compiled equivalent of the jar), compiled on first use and loaded via
   ctypes; token-for-token parity with the nltk backend is enforced by
   tests/test_native_tokenizer.py,
 - optional jar backend (``backend='stanford'``) preserving the reference's
   exact subprocess contract when the user supplies the jar + java.

Same interface/IO contract as the reference wrapper:
``tokenize({image_id: [{'caption': str}, ...]}) -> {image_id: [str, ...]}``.
"""

from __future__ import annotations

import re
from typing import Dict, List

# Tokens removed after tokenization (ptbtokenizer.py:21-22).
PUNCTUATIONS = ["''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
                ".", "?", "!", ",", ":", "-", "--", "...", ";"]
_PUNCT_SET = set(PUNCTUATIONS)

# Stanford's ptb3Escaping normalizes unicode punctuation BEFORE the rule
# chain; nltk's TreebankWordTokenizer does not (measured: it leaves
# '“oh' glued and 'don’t' unsplit). Reproduce the jar's
# normalization as a pre-pass shared by every java-free backend:
# directed double quotes -> ``/'' tokens, left single quote -> `,
# right single quote -> ASCII apostrophe (so contractions split; a true
# close-quote becomes a lone ' the strip list removes), en/em dash -> --,
# ellipsis char -> ... .
_UNICODE_NORMALIZE = [
    # Directed double quotes -> ASCII '"': the PTB rule chain then emits
    # `` or '' by position exactly as the jar does (padding them here
    # instead would trip nltk's preceded-by-space `` rule on close quotes).
    ("“", '"'), ("”", '"'), ("„", '"'), ("«", '"'), ("»", '"'),
    ("‘", " ` "), ("‚", " ` "),                         # ‘ ‚
    ("’", "'"),                                              # ’
    ("–", " -- "), ("—", " -- "),                       # – —
    ("…", " ... "),                                          # …
]

# Sentence-final abbreviations: the Penn Treebank convention (which the
# Stanford PTBLexer replicates) keeps the abbreviation's own period AND
# emits a separate sentence-final period ("u.s." -> "u.s." "."); nltk
# instead strips the period into the final token ("u.s" "."). Patched in
# a post-pass: letter-dot acronyms by pattern, common title/corp
# abbreviations by list.
_ACRONYM = re.compile(r"^(?:[a-z]\.)+[a-z]$")
_ABBREVIATIONS = frozenset(
    "dr mr mrs ms prof etc jr sr vs inc ltd co corp st mt dept univ "
    "approx capt gen lt sgt col maj rev hon pres gov sen rep".split())


def _regex_ptb_tokenize(text: str) -> List[str]:
    """Minimal PTB-style tokenizer used only when nltk is absent."""
    text = re.sub(r"([?!.,;:@#$%&])", r" \1 ", text)
    text = re.sub(r"\(", " -LRB- ", text)
    text = re.sub(r"\)", " -RRB- ", text)
    text = re.sub(r"([^' ])('s|'m|'d|'ll|'re|'ve|n't)\b", r"\1 \2", text)
    return text.split()


def _restore_final_abbreviation(toks: List[str]) -> List[str]:
    """Rejoin the period nltk strips off a sentence-final abbreviation
    ('u.s' '.' -> 'u.s.' '.'), keeping the separate final period token per
    the PTB/Stanford convention (see _ABBREVIATIONS above)."""
    if len(toks) >= 2 and toks[-1] == ".":
        prev = toks[-2]
        if _ACRONYM.match(prev) or prev in _ABBREVIATIONS:
            toks = toks[:-2] + [prev + ".", "."]
    return toks


class _NativePTB:
    """ctypes wrapper over native/s2vt_tokenize.cpp (built on first use)."""

    def __init__(self):
        import ctypes
        import pathlib

        from s2vt_tpu.data.native_loader import build_lib

        src = (pathlib.Path(__file__).resolve().parents[2] / "native" /
               "s2vt_tokenize.cpp")
        lib = ctypes.CDLL(str(build_lib(src, "libs2vt_tokenize.so")))
        lib.s2vt_ptb_tokenize.restype = ctypes.c_long
        lib.s2vt_ptb_tokenize.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                          ctypes.c_long]
        self._ctypes = ctypes
        self._fn = lib.s2vt_ptb_tokenize

    def tokenize(self, line: str) -> List[str]:
        data = line.encode("utf-8")
        cap = 4 * len(data) + 256
        while True:
            buf = self._ctypes.create_string_buffer(cap)
            needed = self._fn(data, buf, cap)
            if needed + 1 <= cap:
                return buf.value.decode("utf-8").split()
            cap = needed + 1


class PTBTokenizer:
    def __init__(self, backend: str = "auto", jar_path: str = None):
        self.jar_path = jar_path
        if backend == "auto":
            try:
                from nltk.tokenize import TreebankWordTokenizer
                self._tok = TreebankWordTokenizer()
                backend = "nltk"
            except Exception:
                backend = "regex"
        elif backend == "nltk":
            from nltk.tokenize import TreebankWordTokenizer
            self._tok = TreebankWordTokenizer()
        elif backend == "native":
            self._tok = _NativePTB()
        self.backend = backend

    def _tokenize_line(self, line: str) -> List[str]:
        line = line.replace("\n", " ").lower()
        for src, dst in _UNICODE_NORMALIZE:
            if src in line:
                line = line.replace(src, dst)
        if self.backend == "nltk":
            # convert_parentheses=True emits -LRB-/-RRB- like the Stanford
            # jar, which the PUNCTUATIONS strip list then removes.
            toks = self._tok.tokenize(line, convert_parentheses=True)
        elif self.backend == "native":
            toks = self._tok.tokenize(line)
        else:
            toks = _regex_ptb_tokenize(line)
        return _restore_final_abbreviation(toks)

    def tokenize(self, captions_for_image: Dict) -> Dict[str, List[str]]:
        if self.backend == "stanford":
            return self._tokenize_stanford(captions_for_image)
        out: Dict[str, List[str]] = {}
        for img_id, caps in captions_for_image.items():
            out[img_id] = []
            for cap in caps:
                text = cap["caption"] if isinstance(cap, dict) else cap
                words = [w for w in self._tokenize_line(text)
                         if w not in _PUNCT_SET]
                out[img_id].append(" ".join(words))
        return out

    def _tokenize_stanford(self, captions_for_image: Dict) -> Dict[str, List[str]]:
        """Exact reference contract: one sentence per line through the jar
        with -preserveLines -lowerCase (requires java + the jar)."""
        import subprocess
        ids, lines = [], []
        for img_id, caps in captions_for_image.items():
            for cap in caps:
                text = cap["caption"] if isinstance(cap, dict) else cap
                ids.append(img_id)
                lines.append(text.replace("\n", " "))
        proc = subprocess.run(
            ["java", "-cp", self.jar_path, "edu.stanford.nlp.process.PTBTokenizer",
             "-preserveLines", "-lowerCase"],
            input="\n".join(lines).encode(), capture_output=True, check=True)
        out: Dict[str, List[str]] = {}
        for img_id, line in zip(ids, proc.stdout.decode().split("\n")):
            words = [w for w in line.rstrip().split(" ") if w not in _PUNCT_SET]
            out.setdefault(img_id, []).append(" ".join(words))
        return out
