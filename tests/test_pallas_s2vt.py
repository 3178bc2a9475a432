"""Fused dual-layer S2VT kernel: parity vs the composed per-layer path.

Runs in interpret mode on CPU. With compute_dtype=None the fused kernel
uses float32 matmuls + residuals (like the scan path), so parity is exact;
bfloat16 engages only when the model requests compute_dtype=bfloat16.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2vt_tpu.models import S2VT

B, L, F, H, V = 8, 6, 16, 128, 32
E = H


@pytest.fixture(scope="module")
def setup():
    kw = dict(vocab_size=V, feat_dim=F, length=L, dim_hid=H, dim_embed=E,
              sos_ix=3, eos_ix=4)
    m_ref = S2VT(**kw)
    m_fused = S2VT(use_pallas=True, **kw)
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, L, F))
    tgts = jax.random.randint(jax.random.PRNGKey(1), (B, L - 1), 0, V)
    params = m_ref.init(jax.random.PRNGKey(2), feats, tgts, mode="train",
                        deterministic=True)
    return m_ref, m_fused, params, feats, tgts


def test_fused_is_engaged(setup):
    _, m_fused, *_ = setup
    from s2vt_tpu.ops.pallas_s2vt import fused_shapes_ok
    assert fused_shapes_ok(B, H, E, 1, "lstm")


def test_fused_gate_is_dtype_aware():
    """f32 W_all at H=512 (16.8MB) can't be VMEM-resident; the bf16 run can
    (ADVICE r1: the gate must consider compute_dtype, not assume bf16)."""
    from s2vt_tpu.ops.pallas_s2vt import fused_shapes_ok
    assert fused_shapes_ok(64, 512, 512, 1, "lstm", jnp.bfloat16)
    assert not fused_shapes_ok(64, 512, 512, 1, "lstm", None)
    assert fused_shapes_ok(64, 256, 256, 1, "lstm", None)


def test_large_batch_chunk1_path_parity(setup):
    """B>64 engages 1-step chunks + split backward weights (the extended
    VMEM envelope); parity vs the scan path must hold through fwd+bwd."""
    _, _, _, _, tgts_small = setup
    B_big = 72  # > 64 -> _chunk_for routes to C=1
    kw = dict(vocab_size=V, feat_dim=F, length=L, dim_hid=H, dim_embed=E,
              sos_ix=3, eos_ix=4)
    m_ref, m_fused = S2VT(**kw), S2VT(use_pallas=True, **kw)
    feats = jax.random.normal(jax.random.PRNGKey(5), (B_big, L, F))
    tgts = jax.random.randint(jax.random.PRNGKey(6), (B_big, L - 1), 0, V)
    params = m_ref.init(jax.random.PRNGKey(7), feats, tgts, mode="train",
                        deterministic=True)
    from s2vt_tpu.ops.pallas_s2vt import _chunk_for
    assert _chunk_for(B_big) == 1 and m_fused._fused_ok(B_big)

    want = m_ref.apply(params, feats, tgts, mode="train", deterministic=True)
    got = m_fused.apply(params, feats, tgts, mode="train", deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)

    def loss(model):
        def fn(p):
            out = model.apply({"params": p}, feats, tgts, mode="train",
                              deterministic=True)
            return jnp.sum(out ** 2) * 1e-3
        return fn

    g_ref = jax.grad(loss(m_ref))(params["params"])
    g_fus = jax.grad(loss(m_fused))(params["params"])
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                            jax.tree_util.tree_leaves(g_fus)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-3, rtol=2e-3,
            err_msg=jax.tree_util.keystr(path))


def test_fused_bf16_mode_runs(setup):
    """compute_dtype=bfloat16 engages bf16 matmuls/residuals and still
    tracks the scan path to bf16 tolerance."""
    _, _, params, feats, tgts = setup
    kw = dict(vocab_size=V, feat_dim=F, length=L, dim_hid=H, dim_embed=E,
              sos_ix=3, eos_ix=4, compute_dtype=jnp.bfloat16)
    m_ref = S2VT(**kw)
    m_fused = S2VT(use_pallas=True, **kw)
    want = m_ref.apply(params, feats, tgts, mode="train", deterministic=True)
    got = m_fused.apply(params, feats, tgts, mode="train", deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.15, rtol=0.15)


def test_teacher_forced_parity(setup):
    m_ref, m_fused, params, feats, tgts = setup
    want = m_ref.apply(params, feats, tgts, mode="train", deterministic=True)
    got = m_fused.apply(params, feats, tgts, mode="train", deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_gradient_parity(setup):
    m_ref, m_fused, params, feats, tgts = setup

    def loss(model):
        def fn(p, f):
            logits = model.apply({"params": p}, f, tgts, mode="train",
                                 deterministic=True)
            return jnp.sum(logits ** 2) * 1e-3
        return fn

    g_ref = jax.grad(loss(m_ref), argnums=(0, 1))(params["params"], feats)
    g_fus = jax.grad(loss(m_fused), argnums=(0, 1))(params["params"], feats)
    leaves_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    leaves_fus = jax.tree_util.tree_leaves(g_fus)
    for (path, a), b in zip(leaves_ref, leaves_fus):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-3, rtol=2e-3,
            err_msg=jax.tree_util.keystr(path))


def test_greedy_parity(setup):
    m_ref, m_fused, params, feats, _ = setup
    want = np.asarray(m_ref.apply(params, feats, mode="test"))
    got = np.asarray(m_fused.apply(params, feats, mode="test"))
    np.testing.assert_array_equal(got, want)
