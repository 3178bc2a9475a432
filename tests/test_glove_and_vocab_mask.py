"""GloVe warm start (S2VTModel.py:112-147 parity) + padded-vocab decode
masking tests."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from s2vt_tpu.data.glove import load_glove_embeddings, warm_start_embedding
from s2vt_tpu.models import S2VT
from s2vt_tpu.ops.layers import mask_invalid_vocab


def _write_glove(path, words, dim):
    rng = np.random.default_rng(0)
    vecs = {}
    with open(path, "w", encoding="utf-8") as f:
        for w in words:
            v = rng.normal(size=dim)
            vecs[w] = v
            f.write(w + " " + " ".join(f"{x:.5f}" for x in v) + "\n")
    return vecs


def test_glove_rows_overwritten_and_cached(tmp_path):
    dim = 6
    word2ix = {"<pad>": 0, "<unk>": 1, "dog": 2, "cat": 3, "zzz": 4}
    vecs = _write_glove(tmp_path / "glove.txt", ["dog", "cat", "bird"], dim)
    table = load_glove_embeddings(str(tmp_path / "glove.txt"), word2ix, dim)
    assert table.shape == (5, dim)
    np.testing.assert_allclose(table[2], vecs["dog"], atol=1e-5)
    np.testing.assert_allclose(table[3], vecs["cat"], atol=1e-5)
    # 'zzz' not in glove: stays xavier-init, bounded
    bound = np.sqrt(6.0 / (5 + dim))
    assert np.abs(table[4]).max() <= bound + 1e-6
    # cache written next to the file (reference caches word2embed.json)
    cache = tmp_path / "word2embed.json"
    assert cache.exists()
    assert set(json.load(open(cache))) == {"dog", "cat"}
    # second load goes through the cache
    table2 = load_glove_embeddings(str(tmp_path / "glove.txt"), word2ix, dim)
    np.testing.assert_allclose(table2[2], table[2])


def test_warm_start_embedding_with_padded_vocab(tmp_path):
    dim = 4
    word2ix = {"<pad>": 0, "dog": 1}
    _write_glove(tmp_path / "glove.txt", ["dog"], dim)
    params = {"embedding": {"weight": jnp.zeros((8, dim))}}  # padded to 8
    out = warm_start_embedding(params, str(tmp_path / "glove.txt"), word2ix)
    w = np.asarray(out["embedding"]["weight"])
    assert not np.allclose(w[1], 0.0)       # dog row overwritten
    np.testing.assert_allclose(w[2:], 0.0)  # padding rows untouched


def test_mask_invalid_vocab():
    logits = jnp.ones((2, 8))
    out = np.asarray(mask_invalid_vocab(logits, 5))
    assert (out[:, :5] == 1.0).all()
    assert (out[:, 5:] < -1e29).all()
    # no-op cases
    assert mask_invalid_vocab(logits, None) is logits
    assert mask_invalid_vocab(logits, 8) is logits


def test_s2vt_greedy_never_emits_padding_rows():
    V_pad, V_real = 32, 20
    m = S2VT(vocab_size=V_pad, feat_dim=6, length=8, dim_hid=8, dim_embed=8,
             sos_ix=3, eos_ix=4, valid_vocab=V_real)
    feats = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 6))
    params = m.init(jax.random.PRNGKey(1), feats, mode="test")
    # bias the out_linear so padding rows would otherwise win argmax
    params = jax.tree_util.tree_map(lambda x: x, params)
    bias = params["params"]["out_linear"]["bias"]
    params["params"]["out_linear"]["bias"] = bias.at[V_real:].set(100.0)
    toks = np.asarray(m.apply(params, feats, mode="test"))
    assert toks.max() < V_real

    res = m.apply(params, feats, mode="beam_search", beam_width=2,
                  max_beam_depth=6)
    assert np.asarray(res.tokens).max() < V_real
