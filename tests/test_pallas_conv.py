"""Correctness of the fused 3x3 conv+BN+ReLU Pallas kernel vs the XLA
formulation (interpret mode on CPU; the TPU A/B is bench-side)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2vt_tpu.ops.pallas_conv import (conv3x3_shapes_ok,
                                      fused_conv3x3_bn_relu,
                                      pick_block_rows, xla_conv3x3_bn_relu)

SHAPES = [  # (H, W, C, K) — VGG block shapes scaled down + one full-size
    (8, 8, 64, 64),
    (14, 14, 128, 64),
    (7, 10, 64, 128),   # W not divisible by anything convenient
    (28, 28, 64, 64),
]


@pytest.mark.parametrize("H,W,C,K", SHAPES)
def test_fused_matches_xla_f32(H, W, C, K):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(k1, (2, H, W, C), jnp.float32)
    w = jax.random.normal(k2, (3, 3, C, K), jnp.float32) * 0.05
    scale = jax.random.normal(k3, (K,)) * 0.3 + 1.0
    shift = jax.random.normal(k4, (K,)) * 0.1
    want = xla_conv3x3_bn_relu(x, w, scale, shift, compute_bf16=False)
    got = fused_conv3x3_bn_relu(x, w, scale, shift, compute_bf16=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_matches_xla_bf16():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (1, 14, 14, 128), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 128, 128), jnp.float32) * 0.05
    scale = jnp.ones((128,))
    shift = jnp.zeros((128,))
    want = xla_conv3x3_bn_relu(x, w, scale, shift, compute_bf16=True)
    got = fused_conv3x3_bn_relu(x, w, scale, shift, compute_bf16=True)
    # both paths are bf16 matmuls with f32 accumulation; tiny residual
    # differences come from the 9-matmul accumulation order
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_zero_padding_edges_exact():
    """Border pixels exercise the zero halo; check one by hand."""
    x = jnp.ones((1, 8, 8, 64), jnp.float32)
    w = jnp.ones((3, 3, 64, 64), jnp.float32)
    out = fused_conv3x3_bn_relu(x, w, jnp.ones((64,)), jnp.zeros((64,)),
                                compute_bf16=False)
    out = np.asarray(out)
    # interior: 9 taps * 64 channels; corner: 4 taps * 64
    np.testing.assert_allclose(out[0, 4, 4, 0], 9 * 64, rtol=1e-6)
    np.testing.assert_allclose(out[0, 0, 0, 0], 4 * 64, rtol=1e-6)
    np.testing.assert_allclose(out[0, 0, 4, 0], 6 * 64, rtol=1e-6)


def test_block_row_picker_and_gate():
    # full-size VGG shapes all gate in under the VMEM budget
    for (H, W, C, K) in [(224, 224, 64, 64), (112, 112, 128, 128),
                         (56, 56, 256, 256), (28, 28, 512, 512),
                         (14, 14, 512, 512)]:
        assert conv3x3_shapes_ok((80, H, W, C), K)
        bh = pick_block_rows(H, W, C, K, True)
        assert H % bh == 0 and bh >= 1
    assert not conv3x3_shapes_ok((80, 224, 224, 3), 64)   # C=3 unaligned
    assert not conv3x3_shapes_ok((80, 224, 224), 64)      # not NHWC
