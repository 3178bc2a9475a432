"""GloVe embedding warm-start for the caption embedding table.

Capability parity with /root/reference/S2VTModel.py:112-147
(``load_glove_weights``): parse ``glove.6B.{dim}d.txt``, cache the
vocab-filtered vectors as JSON, initialize missing rows Xavier-uniform, and
overwrite the rows of words present in GloVe. Returns a [V, dim] numpy
array to drop into ``params['embedding']['weight']``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


def parse_glove_file(glove_path: str, vocab: Dict[str, int]) -> Dict[str, list]:
    """Read a GloVe text file, keeping only words in ``vocab``."""
    found: Dict[str, list] = {}
    with open(glove_path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            if parts[0] in vocab:
                found[parts[0]] = [float(v) for v in parts[1:]]
    return found


def load_glove_embeddings(glove_path: str, word2ix: Dict[str, int],
                          dim_embed: int, cache_path: Optional[str] = None,
                          seed: int = 0) -> np.ndarray:
    """Build the warm-started embedding matrix [vocab, dim_embed].

    Matches the reference's behavior: cache ``word2embed`` JSON next to the
    GloVe file (S2VTModel.py:117-128), xavier-uniform init for all rows
    (S2VTModel.py:133), overwrite rows found in GloVe (S2VTModel.py:135-141).
    """
    if cache_path is None:
        cache_path = os.path.join(os.path.dirname(os.path.abspath(glove_path)),
                                  "word2embed.json")
    if os.path.exists(cache_path):
        with open(cache_path, encoding="utf-8") as f:
            word2embed = json.load(f)
    else:
        word2embed = parse_glove_file(glove_path, word2ix)
        with open(cache_path, "w", encoding="utf-8") as f:
            json.dump(word2embed, f)

    V = len(word2ix)
    rng = np.random.default_rng(seed)
    # Xavier-uniform over [V, dim]: bound = sqrt(6 / (fan_in + fan_out)).
    bound = np.sqrt(6.0 / (V + dim_embed))
    table = rng.uniform(-bound, bound, (V, dim_embed)).astype(np.float32)
    n_hit = 0
    for word, vec in word2embed.items():
        ix = word2ix.get(word)
        if ix is None:
            continue
        v = np.asarray(vec, np.float32)
        if v.shape[0] != dim_embed:
            raise ValueError(
                f"GloVe dim {v.shape[0]} != dim_embed {dim_embed}; use the "
                f"matching glove.6B.{dim_embed}d.txt file")
        table[ix] = v
        n_hit += 1
    return table


def warm_start_embedding(params: dict, glove_path: str,
                         word2ix: Dict[str, int],
                         cache_path: Optional[str] = None,
                         seed: int = 0) -> dict:
    """Return params with embedding/weight rows warm-started from GloVe.
    Handles a vocab-padded table (extra rows keep their init)."""
    import jax.numpy as jnp

    weight = params["embedding"]["weight"]
    dim = int(weight.shape[1])
    table = load_glove_embeddings(glove_path, word2ix, dim, cache_path, seed)
    new_w = np.asarray(weight).copy()
    new_w[:table.shape[0]] = table
    out = dict(params)
    out["embedding"] = dict(params["embedding"], weight=jnp.asarray(new_w))
    return out
