"""Parity of the fused attention-decoder kernel (interpret mode on CPU)
against a pure-jnp scan implementing the exact step math of
models/attention.py::teacher_forced (LSTM cell i,f,g,o + additive
attention with softmax over L)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2vt_tpu.ops.pallas_att_decode import (att_decode_sequence_pallas,
                                            att_decode_sequence_scan,
                                            att_decode_shapes_ok)


def scan_reference(xp_t, w_ctx, w_hh, w_att, b_att, w_apply, enc_wh,
                   enc_out, context0):
    T, B, G = xp_t.shape
    H = G // 4

    def attention(h):
        dw = h @ w_att + b_att
        s = jnp.tanh(enc_wh + dw[:, None, :])
        et = jnp.sum(s * w_apply[None, None, :], axis=2)
        at = jax.nn.softmax(et, axis=1)
        return jnp.sum(at[:, :, None] * enc_out, axis=1)

    def step(carry, xp):
        h, c, ctx = carry
        gates = xp + ctx @ w_ctx + h @ w_hh
        ig = jax.nn.sigmoid(gates[:, :H])
        fg = jax.nn.sigmoid(gates[:, H:2 * H])
        gg = jnp.tanh(gates[:, 2 * H:3 * H])
        og = jax.nn.sigmoid(gates[:, 3 * H:])
        c = fg * c + ig * gg
        h = og * jnp.tanh(c)
        ctx = attention(h)
        return (h, c, ctx), h

    z = jnp.zeros((B, H), jnp.float32)
    _, hs = jax.lax.scan(step, (z, z, context0), xp_t)
    return hs


def _inputs(T=7, B=8, H=128, L=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 9)
    sc = 0.1
    xp_t = jax.random.normal(ks[0], (T, B, 4 * H)) * sc
    w_ctx = jax.random.normal(ks[1], (2 * H, 4 * H)) * sc
    w_hh = jax.random.normal(ks[2], (H, 4 * H)) * sc
    w_att = jax.random.normal(ks[3], (H, H)) * sc
    b_att = jax.random.normal(ks[4], (H,)) * sc
    w_apply = jax.random.normal(ks[5], (H,)) * sc
    enc_wh = jax.random.normal(ks[6], (B, L, H)) * sc
    enc_out = jax.random.normal(ks[7], (B, L, 2 * H)) * sc
    ctx0 = jax.random.normal(ks[8], (B, 2 * H)) * sc
    return xp_t, w_ctx, w_hh, w_att, b_att, w_apply, enc_wh, enc_out, ctx0


@pytest.mark.parametrize("T,B,H,L", [(7, 8, 128, 16),   # T % CHUNK != 0
                                     (8, 8, 128, 16),
                                     (5, 16, 128, 8)])
def test_fused_matches_scan(T, B, H, L):
    args = _inputs(T, B, H, L)
    want = np.asarray(scan_reference(*args))           # [T, B, H]
    got = np.asarray(att_decode_sequence_pallas(*args))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_scan_twin_matches_oracle():
    """The shared A/B scan baseline computes the same function as this
    test's independent oracle (f32 path: bit-equal math)."""
    args = _inputs()
    want = np.asarray(scan_reference(*args))
    got = np.asarray(att_decode_sequence_scan(*args))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_bf16_close():
    args = _inputs()
    want = np.asarray(scan_reference(*args))
    got = np.asarray(att_decode_sequence_pallas(
        *args, compute_dtype=jnp.bfloat16))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_shape_gate():
    assert att_decode_shapes_ok(16, 512, 80)
    assert att_decode_shapes_ok(32, 512, 80)
    assert not att_decode_shapes_ok(64, 512, 80)   # VMEM envelope
    assert not att_decode_shapes_ok(10, 512, 80)   # B % 8
    assert not att_decode_shapes_ok(16, 500, 80)   # H % 128
