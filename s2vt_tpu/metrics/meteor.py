"""METEOR scoring — jar-compatible wrapper + a pure-Python implementation.

The reference drives the METEOR 1.5 jar over a persistent stdio protocol
(/root/reference/coco_caption/pycocoevalcap/meteor/meteor.py:15-84:
per-segment 'SCORE ||| ref1 ||| ... ||| hyp' lines, then one 'EVAL' line).
The jar (and its paraphrase-en.gz) are missing large blobs in the reference
checkout and java is absent from this image, so:

 - backend='jar': preserves the reference's exact subprocess contract for
   environments that have java + meteor-1.5.jar (pass ``jar_path``).
 - backend='lite' (default fallback): a pure-Python METEOR 1.5
   (Denkowski & Lavie 2014) with the English rank-task parameters
   (alpha=0.85, beta=0.2, gamma=0.6, delta=0.75; stage weights exact=1.0,
   stem=0.6, synonym=0.8) implementing:
     * matcher stages: exact, Porter stem, WordNet synonymy (first stage
       that matches a word pair marks it, like the jar's matcher order),
     * the jar's CHUNK-MINIMIZING beam-search aligner: partial alignments
       over hypothesis positions ranked by (word coverage desc, chunks asc,
       total |i-j| distance asc), beam width 40 — Meteor Aligner.java's
       resolution order, replacing the r1 greedy aligner,
     * the DELTA function-word discount: matched/total word counts weight
       content words by delta and function words by 1-delta. The jar reads
       its function.words list (a data blob); here the list is the standard
       English closed class, documented below.
   Remaining deviations from the jar, both data-blob-gated: the paraphrase
   stage (paraphrase-en.gz unavailable offline) and — only when the nltk
   WordNet corpus is absent from the image — the synonym stage. Both
   stages only ADD matches, so lite <= jar on segments where they fire and
   is equal elsewhere (bounded deviation by construction; see
   tests/test_meteor_aligner.py).

Corpus aggregation matches the jar's EVAL semantics: per segment the best
reference (by segment score) contributes its match statistics to a corpus
accumulator, and the final score is computed from the aggregate statistics,
not by averaging segment scores.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

# METEOR 1.5 'en' rank-task defaults.
ALPHA = 0.85
BETA = 0.2
GAMMA = 0.6
DELTA = 0.75                       # content-word weight (function = 1-delta)
STAGE_WEIGHTS = (1.0, 0.6, 0.8)    # exact, stem, synonym
BEAM_WIDTH = 40                    # the jar Aligner's default beam

# English function words: approximates meteor-1.5/data/function.words (the
# jar derives it as words with relative corpus frequency > 1e-3 — i.e. the
# closed class plus high-frequency auxiliaries/pronouns). The jar's exact
# list is a data blob; this is the standard closed-class inventory.
FUNCTION_WORDS = frozenset("""
a an the
am is are was were be been being
do does did done doing
have has had having
will would shall should can could may might must ought
i you he she it we they me him her us them
my your his its our their mine yours hers ours theirs
this that these those there here
who whom whose which what when where why how
of in to for with on at by from up down about into over after under
between out against during without before around among through
and or but if while because as until although though so nor yet than
not no nor n't 's 'll 're 've 'd 'm
""".split())


def _porter():
    from nltk.stem import PorterStemmer
    return PorterStemmer()


def _wordnet_synsets():
    try:
        from nltk.corpus import wordnet as wn
        wn.synsets("dog")  # trigger corpus lookup
        return wn
    except Exception:
        return None


class _Aligner:
    """Meteor 1.5-style 1-1 word aligner (beam search, chunk-minimizing)."""

    def __init__(self, beam: int = BEAM_WIDTH):
        self.stemmer = _porter()
        self.wn = _wordnet_synsets()
        self.beam = beam
        self._stem_cache: Dict[str, str] = {}
        self._syn_cache: Dict[str, frozenset] = {}

    def _stem(self, w: str) -> str:
        s = self._stem_cache.get(w)
        if s is None:
            s = self.stemmer.stem(w)
            self._stem_cache[w] = s
        return s

    def _synonyms(self, w: str) -> frozenset:
        syns = self._syn_cache.get(w)
        if syns is None:
            acc = {w}
            if self.wn is not None:
                for ss in self.wn.synsets(w):
                    for lemma in ss.lemmas():
                        acc.add(lemma.name().lower())
            syns = frozenset(acc)
            self._syn_cache[w] = syns
        return syns

    def match_stage(self, hw: str, rw: str) -> int:
        """First matcher stage (0 exact, 1 stem, 2 synonym) that matches the
        pair, or -1 — the jar marks each pair with its earliest stage."""
        if hw == rw:
            return 0
        if self._stem(hw) == self._stem(rw):
            return 1
        if self.wn is not None and rw in self._synonyms(hw):
            return 2
        return -1

    def align(self, hyp: List[str], ref: List[str]) -> List[Tuple[int, int, int]]:
        """Best 1-1 alignment [(hyp_i, ref_j, stage)], selected by the jar's
        resolution order: max word coverage, then min chunks, then min total
        |i - j| start distance. Beam search over hypothesis positions."""
        n, m = len(hyp), len(ref)
        if n == 0 or m == 0:
            return []
        poss = [[self.match_stage(hw, rw) for rw in ref] for hw in hyp]

        # state: (used_ref_mask, last_i, last_j, matches, chunks, dist, pairs)
        beam = [(0, -2, -2, 0, 0, 0, ())]
        for i in range(n):
            cand = list(beam)  # skipping hyp word i keeps the state as-is
            for used, li, lj, mt, ch, ds, pairs in beam:
                row = poss[i]
                for j in range(m):
                    stage = row[j]
                    if stage < 0 or (used >> j) & 1:
                        continue
                    contiguous = (i == li + 1 and j == lj + 1)
                    cand.append((used | (1 << j), i, j, mt + 1,
                                 ch + (0 if contiguous else 1),
                                 ds + abs(i - j),
                                 pairs + ((i, j, stage),)))
            cand.sort(key=lambda s: (-s[3], s[4], s[5]))
            beam = cand[:self.beam]
        return list(beam[0][6])

    @staticmethod
    def count_chunks(matches: List[Tuple[int, int, int]]) -> int:
        """Contiguous-in-both-sides runs of the alignment (METEOR chunks).
        ``matches`` must be sorted by hyp index (align() returns them so)."""
        if not matches:
            return 0
        chunks = 1
        for (i0, j0, _), (i1, j1, _) in zip(matches, matches[1:]):
            if not (i1 == i0 + 1 and j1 == j0 + 1):
                chunks += 1
        return chunks


def _word_weight(w: str) -> float:
    return (1.0 - DELTA) if w in FUNCTION_WORDS else DELTA


class _Stats:
    """Sufficient statistics of one segment (or a corpus accumulation)."""

    __slots__ = ("weighted_h", "weighted_r", "wlen_h", "wlen_r",
                 "matches", "chunks")

    def __init__(self, weighted_h=0.0, weighted_r=0.0, wlen_h=0.0,
                 wlen_r=0.0, matches=0, chunks=0):
        self.weighted_h = weighted_h
        self.weighted_r = weighted_r
        self.wlen_h = wlen_h
        self.wlen_r = wlen_r
        self.matches = matches
        self.chunks = chunks

    def add(self, other: "_Stats") -> None:
        self.weighted_h += other.weighted_h
        self.weighted_r += other.weighted_r
        self.wlen_h += other.wlen_h
        self.wlen_r += other.wlen_r
        self.matches += other.matches
        self.chunks += other.chunks

    def score(self) -> float:
        if self.wlen_h == 0.0 or self.wlen_r == 0.0 or self.matches == 0:
            return 0.0
        p = self.weighted_h / self.wlen_h
        r = self.weighted_r / self.wlen_r
        if p == 0.0 or r == 0.0:
            return 0.0
        fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
        # METEOR 1.5 fragmentation penalty: Pen = gamma * frag^beta.
        frag = self.chunks / self.matches
        pen = GAMMA * (frag ** BETA)
        return (1.0 - pen) * fmean


class Meteor:
    def __init__(self, backend: str = "auto", jar_path: Optional[str] = None):
        self.jar_path = jar_path
        if backend == "auto":
            backend = "jar" if self._jar_available() else "lite"
        self.backend = backend
        if backend == "lite":
            self.aligner = _Aligner()
        elif backend == "jar":
            self._start_jar()

    def method(self) -> str:
        return "METEOR"

    # ------------------------------------------------------------------
    # lite backend
    # ------------------------------------------------------------------

    def _segment_stats(self, hyp: str, refs: List[str]) -> _Stats:
        hyp_w = hyp.split()
        wlen_h = sum(_word_weight(w) for w in hyp_w)
        best: Optional[_Stats] = None
        for ref in refs:
            ref_w = ref.split()
            matches = self.aligner.align(hyp_w, ref_w)
            sw = STAGE_WEIGHTS
            st = _Stats(
                weighted_h=sum(sw[s] * _word_weight(hyp_w[i])
                               for i, _, s in matches),
                weighted_r=sum(sw[s] * _word_weight(ref_w[j])
                               for _, j, s in matches),
                wlen_h=wlen_h,
                wlen_r=sum(_word_weight(w) for w in ref_w),
                matches=len(matches),
                chunks=self.aligner.count_chunks(matches))
            if best is None or st.score() > best.score():
                best = st
        return best if best is not None else _Stats()

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, List[float]]:
        assert sorted(gts.keys()) == sorted(res.keys())
        ids = sorted(gts.keys())
        if self.backend == "jar":
            return self._compute_score_jar(gts, res, ids)
        total = _Stats()
        scores = []
        for i in ids:
            assert len(res[i]) == 1
            st = self._segment_stats(res[i][0], gts[i])
            scores.append(st.score())
            total.add(st)
        return total.score(), scores

    # ------------------------------------------------------------------
    # jar backend (reference stdio protocol, meteor.py:18-47)
    # ------------------------------------------------------------------

    def _jar_available(self) -> bool:
        import shutil
        return (self.jar_path is not None and shutil.which("java") is not None)

    def _start_jar(self):
        import subprocess
        import threading
        self._lock = threading.Lock()
        self._proc = subprocess.Popen(
            ["java", "-jar", "-Xmx2G", self.jar_path, "-", "-", "-stdio",
             "-l", "en", "-norm"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE)

    def _compute_score_jar(self, gts, res, ids):
        with self._lock:
            eval_parts = ["EVAL"]
            for i in ids:
                hyp = res[i][0].replace("|||", "").replace("  ", " ")
                line = " ||| ".join(("SCORE", " ||| ".join(gts[i]), hyp))
                self._proc.stdin.write((line + "\n").encode())
                self._proc.stdin.flush()
                eval_parts.append(self._proc.stdout.readline().decode().strip())
            self._proc.stdin.write((" ||| ".join(eval_parts) + "\n").encode())
            self._proc.stdin.flush()
            scores = [float(self._proc.stdout.readline().decode().strip())
                      for _ in ids]
            corpus = float(self._proc.stdout.readline().decode().strip())
        return corpus, scores
