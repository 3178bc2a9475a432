"""Learnable synthetic corpus: a generative rule the model must GENERALIZE.

The reference's de-facto quality oracle is its MSVD results table
(/root/reference/README.md:84-88); that needs the MSVD videos, which are
not shipped. ``tests/test_overfit_quality.py`` proves the loop is lossless
by memorizing 12 clips — but memorization asserts nothing about learning.
This module builds a corpus where quality on HELD-OUT clips is achievable
only by learning the feature->language mapping:

 - a catalog of atoms: subjects, verbs, objects, each with a FIXED random
   pattern vector in its own third of the feature dimensions
   (near-orthogonal within the subspace),
 - each clip's latent state is a DISTINCT (subject, verb, object) triple;
   EVERY frame carries the three subspace patterns plus per-frame
   Gaussian noise — content is present throughout the clip, the way real
   CNN features behave. (A frame-band variant — subject frames then verb
   frames then object frames — measured EQUIVALENT held-out scores at
   L=80/H=512 on-chip, ~0.14-0.17 METEOR; the subspace form is kept
   because it removes the recurrent-memory-span confound from the gate's
   interpretation, leaving feature->language learning as the only thing
   measured),
 - captions are 2-4 templated realizations of the triple ("a {s} is {v}
   a {o}", ...), multi-reference like MSVD,
 - the valid/test splits hold UNSEEN triples whose individual atoms all
   appear in training — compositional generalization, so a model that
   memorized training clips scores ~0 while one that learned the
   per-band pattern->word mapping scores near the METEOR identical-
   sentence ceiling (~0.59 for 7-word captions).

Artifacts use the same schema as ``parse_csv`` (captions.json + gts.json
+ feats/*.npy), so VideoDataset / Trainer / the metric eval consume them
unchanged. The MSVD-shaped default (1400/450/120, [80, 4096] float32,
vocab ~1k) is the bench's e2e workload; tests use a small CPU shape.
"""

from __future__ import annotations

import json
import pathlib
from collections import Counter
from typing import Dict, Optional

import numpy as np

TEMPLATES = (
    "a {s} is {v} a {o}",
    "the {s} is {v} the {o}",
    "{s} {v} {o}",
    "a {s} {v} the {o}",
)


def make_learnable_corpus(root: str, n_train: int = 1400, n_valid: int = 450,
                          n_test: int = 120, n_subjects: int = 440,
                          n_verbs: int = 280, n_objects: int = 280,
                          feat_len: int = 80, feat_dim: int = 4096,
                          noise: float = 0.1, seed: int = 0,
                          pattern_scale: float = 1.0,
                          max_captions_per_clip: int = 4) -> Dict[str, str]:
    """Build the corpus under ``root``. Returns paths + metadata.

    Guarantees: every atom occurs in at least one TRAIN clip (train clips
    are assigned round-robin over each catalog before random fill), and
    all clips carry distinct triples — so every valid/test triple is an
    unseen combination of seen atoms.
    """
    from s2vt_tpu.data.corpus import build_vocab, tokenize_caption

    n_total = n_train + n_valid + n_test
    if n_subjects * n_verbs * n_objects < n_total * 2:
        raise ValueError("catalog too small for distinct triples")
    if n_train < max(n_subjects, n_verbs, n_objects):
        raise ValueError("n_train must cover every atom at least once")

    rng = np.random.default_rng(seed)
    subjects = [f"subj{i}" for i in range(n_subjects)]
    verbs = [f"verb{i}" for i in range(n_verbs)]
    objects = [f"obj{i}" for i in range(n_objects)]

    # Fixed atom patterns, each role in its own third of the feature
    # dims; N(0,1)/sqrt(d) rows are near-orthogonal unit-ish vectors, so
    # a linear readout separates them — learnable, not trivial (noise +
    # subspace structure still have to be discovered).
    d1, d2 = feat_dim // 3, 2 * feat_dim // 3
    dims = {"s": (0, d1), "v": (d1, d2), "o": (d2, feat_dim)}
    pat = {}
    for role, n_atoms in (("s", n_subjects), ("v", n_verbs),
                          ("o", n_objects)):
        lo, hi = dims[role]
        scale = pattern_scale / np.sqrt(hi - lo)
        pat[role] = (rng.normal(size=(n_atoms, hi - lo)).astype(np.float32)
                     * scale)

    # Distinct triples; train covers each catalog round-robin first.
    seen = set()
    triples = []
    for i in range(n_train):
        for _ in range(1000):
            t = (i % n_subjects if i < n_subjects else rng.integers(n_subjects),
                 i % n_verbs if i < n_verbs else rng.integers(n_verbs),
                 i % n_objects if i < n_objects else rng.integers(n_objects))
            t = tuple(int(x) for x in t)
            if t not in seen:
                break
        else:
            # appending the last collision would silently break the
            # distinct-triples / held-out-unseen guarantee the gate tests
            # rely on (ADVICE r4)
            raise RuntimeError(
                f"could not draw a fresh (s,v,o) triple for train clip {i} "
                f"in 1000 tries; enlarge the atom catalogs")
        seen.add(t)
        triples.append(t)
    misses = 0
    while len(triples) < n_total:
        t = (int(rng.integers(n_subjects)), int(rng.integers(n_verbs)),
             int(rng.integers(n_objects)))
        if t not in seen:
            misses = 0
            seen.add(t)
            triples.append(t)
        else:
            misses += 1
            if misses > 1000:   # same exhaustion guard as the train loop
                raise RuntimeError(
                    f"could not draw a fresh (s,v,o) triple for clip "
                    f"{len(triples)} in 1000 tries; enlarge the atom "
                    f"catalogs")

    root_p = pathlib.Path(root)
    feat_dir = root_p / "feats"
    feat_dir.mkdir(parents=True, exist_ok=True)

    sentences: Dict[str, list] = {}
    counter: Counter = Counter()
    gts: Dict[str, list] = {}
    names = []
    for i, (si, vi, oi) in enumerate(triples):
        vid = f"clip{i:05d}"
        names.append(vid)
        feats = rng.normal(size=(feat_len, feat_dim)).astype(np.float32) * noise
        feats[:, dims["s"][0]:dims["s"][1]] += pat["s"][si]
        feats[:, dims["v"][0]:dims["v"][1]] += pat["v"][vi]
        feats[:, dims["o"][0]:dims["o"][1]] += pat["o"][oi]
        np.save(feat_dir / f"{vid}.npy", feats)

        k = int(rng.integers(2, max_captions_per_clip + 1))
        tmpl_ix = rng.choice(len(TEMPLATES), size=k, replace=False)
        sentences[vid] = []
        gts[vid] = []
        for c, ti in enumerate(tmpl_ix):
            sent = TEMPLATES[ti].format(s=subjects[si], v=verbs[vi],
                                        o=objects[oi])
            toks = tokenize_caption(sent)
            counter.update(toks)
            sentences[vid].append(toks)
            gts[vid].append({"image_id": vid, "cap_id": c, "caption": sent,
                             "tokenized": sent})

    word2ix, ix2word = build_vocab(counter)
    unk = word2ix["<unk>"]
    captions = {vid: [[word2ix.get(w, unk) for w in toks] for toks in caps]
                for vid, caps in sentences.items()}
    split_dict = {"train": names[:n_train],
                  "valid": names[n_train:n_train + n_valid],
                  "test": names[n_train + n_valid:]}

    with open(root_p / "captions.json", "w", encoding="utf-8") as f:
        json.dump({"word2ix": word2ix, "ix2word": ix2word,
                   "captions": captions, "splits": split_dict}, f)
    with open(root_p / "gts.json", "w", encoding="utf-8") as f:
        json.dump({"gts": gts}, f)

    return {"captions_file": str(root_p / "captions.json"),
            "gts_file": str(root_p / "gts.json"),
            "feat_path": str(feat_dir), "vocab_size": len(word2ix),
            "feat_len": feat_len, "feat_dim": feat_dim}
