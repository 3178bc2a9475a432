"""Pallas LSTM sequence kernel: forward + VJP parity vs the lax.scan
reference (interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2vt_tpu.ops.rnn import LSTMState, init_lstm_params, rnn_sequence
from s2vt_tpu.ops.pallas_rnn import lstm_sequence_pallas

B, T, IN, H = 4, 6, 5, 8


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = init_lstm_params(key, IN, H)
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))
    return params, xs


def test_forward_parity(setup):
    params, xs = setup
    want_out, want_st = rnn_sequence(xs, params)
    got_out, got_st = lstm_sequence_pallas(xs, params)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_st.h), np.asarray(want_st.h),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_st.c), np.asarray(want_st.c),
                               atol=1e-5)


def test_forward_parity_nonzero_init(setup):
    params, xs = setup
    h0 = LSTMState(jnp.ones((B, H)) * 0.3, jnp.ones((B, H)) * -0.2)
    want_out, _ = rnn_sequence(xs, params, h0)
    got_out, _ = lstm_sequence_pallas(xs, params, h0)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               atol=1e-5)


def test_gradient_parity(setup):
    params, xs = setup
    tgt = jax.random.normal(jax.random.PRNGKey(2), (B, T, H))

    def loss_ref(params, xs):
        out, st = rnn_sequence(xs, params)
        return jnp.sum((out - tgt) ** 2) + jnp.sum(st.h) + 0.5 * jnp.sum(st.c)

    def loss_pal(params, xs):
        out, st = lstm_sequence_pallas(xs, params)
        return jnp.sum((out - tgt) ** 2) + jnp.sum(st.h) + 0.5 * jnp.sum(st.c)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, xs)
    g_pal = jax.grad(loss_pal, argnums=(0, 1))(params, xs)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-4)


def test_jit_and_vmap_shapes(setup):
    params, xs = setup
    out, st = jax.jit(lambda p, x: lstm_sequence_pallas(x, p))(params, xs)
    assert out.shape == (B, T, H) and st.h.shape == (B, H)


def test_s2vt_use_pallas_parity():
    """S2VT with use_pallas=True matches the lax.scan model exactly
    (same params, same inputs) in train and greedy modes."""
    from s2vt_tpu.models import S2VT

    kw = dict(vocab_size=20, feat_dim=12, length=10, dim_hid=8, dim_embed=8,
              sos_ix=3, eos_ix=4)
    m_ref = S2VT(**kw)
    m_pal = S2VT(use_pallas=True, **kw)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 12))
    tgts = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0, 20)
    params = m_ref.init(jax.random.PRNGKey(2), feats, tgts, mode="train",
                        deterministic=True)

    ref = m_ref.apply(params, feats, tgts, mode="train", deterministic=True)
    pal = m_pal.apply(params, feats, tgts, mode="train", deterministic=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-4)

    ref_g = m_ref.apply(params, feats, mode="test")
    pal_g = m_pal.apply(params, feats, mode="test")
    np.testing.assert_array_equal(np.asarray(pal_g), np.asarray(ref_g))


def test_bidirectional_pallas_parity():
    """Bidirectional routing: reverse direction = flip around the fwd-only
    kernel; outputs + finals match the scan path (the attention baseline's
    encoder config)."""
    from s2vt_tpu.ops.rnn import TorchRNN

    B2, T2, H2 = 8, 5, 128
    xs = jax.random.normal(jax.random.PRNGKey(3), (B2, T2, H2))
    m_ref = TorchRNN(hidden_size=H2, input_size=H2, bidirectional=True)
    m_pal = TorchRNN(hidden_size=H2, input_size=H2, bidirectional=True,
                     use_pallas=True)
    params = m_ref.init(jax.random.PRNGKey(4), xs)
    ref_out, ref_fin = m_ref.apply(params, xs)
    pal_out, pal_fin = m_pal.apply(params, xs)
    np.testing.assert_allclose(np.asarray(pal_out), np.asarray(ref_out),
                               atol=1e-5)
    for (rf, rb), (pf, pb) in zip(ref_fin, pal_fin):
        np.testing.assert_allclose(np.asarray(pf.h), np.asarray(rf.h), atol=1e-5)
        np.testing.assert_allclose(np.asarray(pb.h), np.asarray(rb.h), atol=1e-5)


def test_att_baseline_use_pallas_parity():
    """AttBaseline(use_pallas=True): identical logits + greedy tokens."""
    from s2vt_tpu.models.attention import AttBaseline

    kw = dict(vocab_size=24, dim_feat=12, length=6, dim_hid=128,
              dim_embed=128, sos_ix=3, eos_ix=4)
    m_ref, m_pal = AttBaseline(**kw), AttBaseline(use_pallas=True, **kw)
    feats = jax.random.normal(jax.random.PRNGKey(0), (8, 6, 12))
    tgts = jax.random.randint(jax.random.PRNGKey(1), (8, 5), 0, 24)
    params = m_ref.init(jax.random.PRNGKey(2), feats, tgts, mode="train",
                        deterministic=True)
    ref = m_ref.apply(params, feats, tgts, mode="train", deterministic=True)
    pal = m_pal.apply(params, feats, tgts, mode="train", deterministic=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(m_pal.apply(params, feats, mode="test")),
        np.asarray(m_ref.apply(params, feats, mode="test")))
