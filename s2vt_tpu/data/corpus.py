"""Corpus preparation: MSVD CSV / MSR-VTT JSON -> captions.json + gts.json.

Capability parity with /root/reference/prepare_captions.py, with the same
on-disk artifact schema so downstream tooling interoperates:

  captions.json: {word2ix, ix2word, captions: {video_id: [[ix,...],...]},
                  splits: {train, valid, test}}
  gts.json:      {gts: {video_id: [{image_id, cap_id, caption, tokenized}]}}

Differences from the reference (all deliberate, documented):
 - The train/valid/test shuffle is SEEDABLE (the reference uses bare
   np.random.shuffle, prepare_captions.py:99, so its split is
   irreproducible without the original process seed).
 - ``build_vocab`` keeps the reference's contract — <pad>=0, <unk>=1, then
   frequency-ordered indices from 2 (prepare_captions.py:9-23) — and
   additionally *reports* where <sos>/<eos> landed, since the reference
   hardcodes sos=3/eos=4 (S2VTModel.py:12) while its own vocab builder
   assigns them by frequency.
"""

from __future__ import annotations

import json
import re
from collections import Counter
from typing import Dict, List, Optional, Tuple

import numpy as np

# Punctuation stripped by the reference tokenizer (prepare_captions.py:57).
_PUNCT_RE = re.compile(r"[~\\/().!,;?:]")

PAD, UNK, SOS, EOS = "<pad>", "<unk>", "<sos>", "<eos>"


def tokenize_caption(sentence: str) -> List[str]:
    """lowercase -> strip punctuation -> whitespace split -> wrap <sos>/<eos>."""
    cleaned = _PUNCT_RE.sub(" ", sentence.lower())
    return [SOS] + cleaned.split() + [EOS]


def build_vocab(counter: Counter, min_feq: int = 1) -> Tuple[Dict[str, int], Dict[int, str]]:
    """<pad>=0, <unk>=1, then Counter.most_common order from index 2."""
    word2ix: Dict[str, int] = {PAD: 0, UNK: 1}
    ix = 2
    for word, feq in counter.most_common():
        if feq < min_feq:
            continue
        word2ix[word] = ix
        ix += 1
    ix2word = {v: k for k, v in word2ix.items()}
    return word2ix, ix2word


class _CorpusAccumulator:
    """Collects (video_id, sentence) pairs and materializes the artifacts."""

    def __init__(self):
        self.counter: Counter = Counter()
        self.entries: List[Tuple[str, List[str]]] = []  # (video_id, tokens)
        self.gts: Dict[str, list] = {}

    def add(self, video_id: str, sentence: str) -> None:
        tokens = tokenize_caption(sentence)
        self.counter.update(tokens)
        self.entries.append((video_id, tokens))
        bucket = self.gts.setdefault(video_id, [])
        bucket.append({
            "image_id": video_id,
            "cap_id": len(bucket),
            "caption": sentence,
            # gts 'tokenized' is the pre-split cleaned string (prepare_captions.py:56-58)
            "tokenized": _PUNCT_RE.sub(" ", sentence.lower()),
        })

    def materialize(self, min_feq: int = 1):
        word2ix, ix2word = build_vocab(self.counter, min_feq)
        unk = word2ix[UNK]
        captions: Dict[str, List[List[int]]] = {}
        for vid, tokens in self.entries:
            captions.setdefault(vid, []).append(
                [word2ix.get(w, unk) for w in tokens])
        return word2ix, ix2word, captions


def _save_artifacts(captions_file: str, gts_file: str, word2ix, ix2word,
                    captions, splits, gts) -> None:
    with open(captions_file, "w", encoding="utf-8") as f:
        json.dump({"word2ix": word2ix, "ix2word": ix2word,
                   "captions": captions, "splits": splits}, f)
    with open(gts_file, "w", encoding="utf-8") as f:
        json.dump({"gts": gts}, f)


def parse_csv(csv_file: str, captions_file: str, gts_file: str,
              clean_only: bool = False, min_feq: int = 1,
              split_sizes: Tuple[int, int] = (1400, 450),
              seed: Optional[int] = None) -> dict:
    """MSVD video_corpus.csv -> artifacts (reference parse_csv semantics:
    English-only rows, optional Source=='clean' filter, video id
    '{VideoID}_{Start}_{End}', random 1400/450/rest split)."""
    import pandas as pd

    df = pd.read_csv(csv_file, encoding="utf-8").dropna(axis=0)
    df = df[df["Language"] == "English"]
    if clean_only:
        df = df[df["Source"] == "clean"]

    acc = _CorpusAccumulator()
    for row in df[["VideoID", "Start", "End", "Description"]].itertuples(index=False):
        vid = f"{row.VideoID}_{row.Start}_{row.End}"
        acc.add(vid, row.Description)

    word2ix, ix2word, captions = acc.materialize(min_feq)

    names = list(captions.keys())
    rng = np.random.default_rng(seed) if seed is not None else np.random
    rng.shuffle(names)
    n_train, n_valid = split_sizes
    splits = {"train": names[:n_train],
              "valid": names[n_train:n_train + n_valid],
              "test": names[n_train + n_valid:]}

    _save_artifacts(captions_file, gts_file, word2ix, ix2word, captions,
                    splits, acc.gts)
    return {"word2ix": word2ix, "ix2word": ix2word, "captions": captions,
            "splits": splits, "gts": acc.gts}


def parse_msr_vtt(train_source_file: str, test_source_file: str,
                  captions_file: str, gts_file: str, min_feq: int = 1) -> dict:
    """MSR-VTT train_val/test JSON -> artifacts. Splits come from the
    dataset's own 'split' field ('validate' -> valid), matching
    prepare_captions.py:118-197."""
    with open(train_source_file, encoding="utf-8") as f:
        data = json.load(f)
    videos = list(data["videos"])
    with open(test_source_file, encoding="utf-8") as f:
        videos += json.load(f)["videos"]

    acc = _CorpusAccumulator()
    for item in data["sentences"]:
        acc.add(item["video_id"], item["caption"])
    word2ix, ix2word, captions = acc.materialize(min_feq)

    splits = {"train": [], "valid": [], "test": []}
    for video in videos:
        key = {"train": "train", "validate": "valid"}.get(video["split"], "test")
        splits[key].append(video["video_id"])

    _save_artifacts(captions_file, gts_file, word2ix, ix2word, captions,
                    splits, acc.gts)
    return {"word2ix": word2ix, "ix2word": ix2word, "captions": captions,
            "splits": splits, "gts": acc.gts}


def load_captions(captions_file: str) -> dict:
    with open(captions_file, encoding="utf-8") as f:
        return json.load(f)


def special_token_indices(word2ix: Dict[str, int]) -> Dict[str, int]:
    """Resolve the actual indices of the special tokens. The reference
    hardcodes sos=3/eos=4; on real MSVD one word (typically 'a') outranks
    them, so verify against this before training."""
    return {"pad_ix": word2ix.get(PAD, 0), "unk_ix": word2ix.get(UNK, 1),
            "sos_ix": word2ix.get(SOS, 3), "eos_ix": word2ix.get(EOS, 4)}
