"""Pallas GRU sequence kernel: forward + VJP parity vs the lax.scan
reference (interpret mode on CPU; the same kernel compiles on TPU), plus
torch-oracle parity and the S2VT gru config end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2vt_tpu.ops.rnn import LSTMState, init_gru_params, rnn_sequence
from s2vt_tpu.ops.pallas_gru import gru_sequence_pallas

B, T, IN, H = 4, 6, 5, 8


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = init_gru_params(key, IN, H)
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))
    return params, xs


def test_forward_parity(setup):
    params, xs = setup
    want_out, want_st = rnn_sequence(xs, params, rnn_type="gru")
    got_out, got_st = gru_sequence_pallas(xs, params)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_st.h), np.asarray(want_st.h),
                               atol=1e-5)


def test_forward_parity_nonzero_init(setup):
    params, xs = setup
    h0 = LSTMState(jnp.ones((B, H)) * 0.3, jnp.zeros((B, H)))
    want_out, _ = rnn_sequence(xs, params, h0, rnn_type="gru")
    got_out, _ = gru_sequence_pallas(xs, params, h0)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               atol=1e-5)


def test_gradient_parity(setup):
    """All four params (w_ih/w_hh/b_ih/b_hh), the inputs, and h0 get the
    same gradients as the scan path — incl. the reset-gated b_hh, which is
    the GRU-specific backward wrinkle."""
    params, xs = setup
    tgt = jax.random.normal(jax.random.PRNGKey(2), (B, T, H))
    h0 = LSTMState(jnp.full((B, H), 0.1), jnp.zeros((B, H)))

    def loss(seq_fn):
        def fn(params, xs, h):
            out, st = seq_fn(xs, params, LSTMState(h, jnp.zeros_like(h)))
            return jnp.sum((out - tgt) ** 2) + jnp.sum(st.h)
        return fn

    ref_fn = loss(lambda x, p, s: rnn_sequence(x, p, s, rnn_type="gru"))
    pal_fn = loss(gru_sequence_pallas)
    g_ref = jax.grad(ref_fn, argnums=(0, 1, 2))(params, xs, h0.h)
    g_pal = jax.grad(pal_fn, argnums=(0, 1, 2))(params, xs, h0.h)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                            jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_torch_oracle_parity(setup):
    """Kernel output matches torch.nn.GRU bit-for-bit semantics."""
    torch = pytest.importorskip("torch")
    params, xs = setup
    gru = torch.nn.GRU(IN, H, batch_first=True)
    with torch.no_grad():
        gru.weight_ih_l0.copy_(torch.from_numpy(np.asarray(params["w_ih"])))
        gru.weight_hh_l0.copy_(torch.from_numpy(np.asarray(params["w_hh"])))
        gru.bias_ih_l0.copy_(torch.from_numpy(np.asarray(params["b_ih"])))
        gru.bias_hh_l0.copy_(torch.from_numpy(np.asarray(params["b_hh"])))
        want, _ = gru(torch.from_numpy(np.asarray(xs)))
    got, _ = gru_sequence_pallas(xs, params)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_torchrnn_routes_gru_to_pallas():
    """TorchRNN(use_pallas=True, rnn_type='gru') output equals the scan
    path on aligned shapes (B=8, H=128 passes pallas_shapes_ok)."""
    from s2vt_tpu.ops.rnn import TorchRNN

    B2, T2, H2 = 8, 5, 128
    xs = jax.random.normal(jax.random.PRNGKey(0), (B2, T2, H2))
    m_ref = TorchRNN(hidden_size=H2, input_size=H2, rnn_type="gru")
    m_pal = TorchRNN(hidden_size=H2, input_size=H2, rnn_type="gru",
                     use_pallas=True)
    params = m_ref.init(jax.random.PRNGKey(1), xs)
    ref_out, _ = m_ref.apply(params, xs)
    pal_out, _ = m_pal.apply(params, xs)
    np.testing.assert_allclose(np.asarray(pal_out), np.asarray(ref_out),
                               atol=1e-5)


def test_s2vt_gru_use_pallas_parity():
    """S2VT(rnn_type='gru', use_pallas=True) matches the scan model in
    train and greedy modes (the fused dual kernel is LSTM-only, so the
    per-layer GRU kernel carries this config)."""
    from s2vt_tpu.models import S2VT

    kw = dict(vocab_size=24, feat_dim=12, length=6, dim_hid=128,
              dim_embed=128, rnn_type="gru", sos_ix=3, eos_ix=4)
    m_ref = S2VT(**kw)
    m_pal = S2VT(use_pallas=True, **kw)
    feats = jax.random.normal(jax.random.PRNGKey(0), (8, 6, 12))
    tgts = jax.random.randint(jax.random.PRNGKey(1), (8, 5), 0, 24)
    params = m_ref.init(jax.random.PRNGKey(2), feats, tgts, mode="train",
                        deterministic=True)

    ref = m_ref.apply(params, feats, tgts, mode="train", deterministic=True)
    pal = m_pal.apply(params, feats, tgts, mode="train", deterministic=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-4)

    ref_g = m_ref.apply(params, feats, mode="test")
    pal_g = m_pal.apply(params, feats, mode="test")
    np.testing.assert_array_equal(np.asarray(pal_g), np.asarray(ref_g))
