"""Fused linear+argmax decode kernel: exact selection parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2vt_tpu.ops.layers import apply_linear, mask_invalid_vocab
from s2vt_tpu.ops.pallas_decode import argmax_linear, argmax_linear_ok

B, H, V = 8, 128, 2048


def _ref(h, w, b, valid_vocab, cdt):
    logits = apply_linear(h, w, b, cdt)
    logits = mask_invalid_vocab(logits, valid_vocab)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@pytest.mark.parametrize("cdt", [None, jnp.bfloat16],
                         ids=["f32", "bf16"])
@pytest.mark.parametrize("valid", [None, V - 100])
def test_matches_jnp_path(cdt, valid):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    h = jax.random.normal(k1, (B, H), jnp.float32)
    w = jax.random.normal(k2, (V, H), jnp.float32) * 0.1
    b = jax.random.normal(k3, (V,), jnp.float32)
    got = argmax_linear(h, w, b, valid, cdt)
    want = _ref(h, w, b, valid, cdt)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_tie_breaks_to_first_index():
    """Bitwise-identical logits columns (duplicated weight rows + bias)
    must resolve to the LOWER index, matching jnp.argmax — including
    across vocab blocks."""
    h = jax.random.normal(jax.random.PRNGKey(1), (B, H), jnp.float32)
    w = jnp.zeros((V, H), jnp.float32)
    hot = jax.random.normal(jax.random.PRNGKey(2), (H,), jnp.float32)
    # same winning column planted in block 0 and block 1
    w = w.at[37].set(hot).at[1024 + 512].set(hot)
    # big equal bias so the duplicated columns always beat the zero ones
    b = jnp.zeros((V,), jnp.float32).at[37].set(100.).at[1024 + 512].set(100.)
    got = np.asarray(argmax_linear(h, w, b, None, None))
    want = np.asarray(_ref(h, w, b, None, None))
    np.testing.assert_array_equal(got, want)
    assert set(got.tolist()) <= {37}  # never the duplicate at 1536


def test_gate():
    assert argmax_linear_ok(8, 128, 2048)
    assert argmax_linear_ok(2048, 512, 10240)
    assert not argmax_linear_ok(7, 128, 2048)      # B % 8
    assert not argmax_linear_ok(8, 100, 2048)      # H % 128
    assert not argmax_linear_ok(8, 128, 2000)      # V has no 128-divisor blk
    assert not argmax_linear_ok(4096, 512, 10240)  # B too large


def test_s2vt_greedy_tokens_identical_use_pallas():
    """use_pallas greedy (fused chains, interpret mode on CPU) decodes
    token-for-token like the jnp path. (The fused-argmax kernel itself is
    NOT wired into the models — measured slower than XLA's epilogue
    fusion; see ops/pallas_decode.py.)"""
    from s2vt_tpu.models import S2VT
    L, E = 6, 128
    feats = jax.random.normal(jax.random.PRNGKey(3), (B, L, H), jnp.float32)
    ref = S2VT(vocab_size=V, feat_dim=H, length=L, dim_hid=H, dim_embed=E,
               sos_ix=3, eos_ix=4, use_pallas=False)
    params = ref.init(jax.random.PRNGKey(4), feats, mode="test")["params"]
    fused = S2VT(vocab_size=V, feat_dim=H, length=L, dim_hid=H, dim_embed=E,
                 sos_ix=3, eos_ix=4, use_pallas=True)
    want = np.asarray(ref.apply({"params": params}, feats, mode="test"))
    got = np.asarray(fused.apply({"params": params}, feats, mode="test"))
    np.testing.assert_array_equal(got, want)
