"""Fused 3x3 conv + folded-BN + ReLU Pallas kernel (NHWC, stride 1, SAME).

The extraction backbones run inference-mode BatchNorm, so BN folds into a
per-channel affine: y = relu(conv(x, w) * scale + shift) with
scale = gamma / sqrt(var + eps) and shift = beta - mean * scale (+ the
conv bias folded through scale). This kernel computes that whole block in
one pass — the op SURVEY.md §7 names as the backbone performance layer
("Pallas-fused conv+BN blocks", reference workload extract_features.py:
106-107, one VGG forward per clip).

Formulation: a 3x3 SAME conv is nine shifted [BH*W, C] x [C, K] matmuls
accumulated in f32. The host pads the image once and passes three
row-shifted views so each grid step's block needs no halo exchange:

    grid (N, H / BH); program (n, i) owns output rows [i*BH, (i+1)*BH)
    inputs: rows dy = -1 / 0 / +1 of the padded image for that strip
    for dy in 0..2, dx in 0..2:
        acc += x_view[dy][:, dx : dx + W, :] @ w[dy, dx]   (MXU, f32 acc)
    out = relu(acc * scale + shift)

Measured A/B on one v5e (bf16, VGG16-bn shapes, B=80 frames) is recorded
in README.md §performance — XLA's conv emitter wins on the large-C layers
and this kernel is therefore OFF by default in the backbones; it exists to
make that choice a measured one, and `fused_conv3x3_bn_relu` remains
available for shapes where a fused custom block wins.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False
_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16MB core budget


def _interpret() -> bool:
    return _INTERPRET or jax.default_backend() != "tpu"


def _footprint(BH: int, W: int, C: int, K: int, isz: int) -> int:
    ins = 3 * BH * (W + 2) * C * isz * 2          # 3 shifted views, x2 buf
    wgt = 9 * C * K * isz
    acc = BH * W * K * 4                          # f32 accumulator
    out = BH * W * K * isz * 2                    # x2 buf
    # Mosaic's scoped stack additionally materializes the per-(dy,dx)
    # window slices and dot operands; measured overhead on the VGG shapes
    # is ~2x the streamed-block estimate (a BH=32 224x224x64 block
    # estimated 9.2MB but needed 17.8MB of scoped VMEM).
    return 2 * (ins + acc + out) + wgt


def pick_block_rows(H: int, W: int, C: int, K: int,
                    compute_bf16: bool) -> int:
    """Largest divisor of H whose VMEM footprint fits the budget."""
    isz = 2 if compute_bf16 else 4
    for bh in sorted({d for d in range(1, H + 1) if H % d == 0},
                     reverse=True):
        if _footprint(bh, W, C, K, isz) <= _VMEM_BUDGET:
            return bh
    return 1


def conv3x3_shapes_ok(x_shape: Tuple[int, ...], k: int,
                      compute_bf16: bool = True) -> bool:
    """Gate: NHWC, 3x3 SAME stride-1, MXU-aligned channels, VMEM fit."""
    if len(x_shape) != 4:
        return False
    _, H, W, C = x_shape
    if C % 64 != 0 or k % 64 != 0:
        return False
    bh = pick_block_rows(H, W, C, k, compute_bf16)
    isz = 2 if compute_bf16 else 4
    return _footprint(bh, W, C, k, isz) <= _VMEM_BUDGET


def _conv_kernel(r0, r1, r2, w_ref, sb_ref, out_ref, *, BH: int, W: int):
    rows = (r0, r1, r2)
    acc = None
    for dy in range(3):
        blk = rows[dy][0]                           # [BH, W+2, C]
        for dx in range(3):
            win = blk[:, dx:dx + W, :].reshape(BH * W, blk.shape[-1])
            part = jnp.dot(win, w_ref[dy, dx],
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    y = jnp.maximum(acc * sb_ref[0][None, :] + sb_ref[1][None, :], 0.0)
    out_ref[:] = y.reshape(1, BH, W, -1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("compute_bf16",))
def fused_conv3x3_bn_relu(x: jax.Array, kernel: jax.Array,
                          scale: jax.Array, shift: jax.Array,
                          compute_bf16: bool = True) -> jax.Array:
    """relu(conv3x3_same(x, kernel) * scale + shift), NHWC.

    x: [N, H, W, C]; kernel: [3, 3, C, K] (HWIO); scale/shift: [K].
    Output dtype matches the matmul dtype (bf16 unless compute_bf16=False).
    """
    N, H, W, C = x.shape
    K = kernel.shape[-1]
    mmdt = jnp.bfloat16 if compute_bf16 else jnp.float32
    xp = jnp.pad(x.astype(mmdt), ((0, 0), (1, 1), (1, 1), (0, 0)))
    views = [xp[:, dy:dy + H] for dy in range(3)]   # each [N, H, W+2, C]
    BH = pick_block_rows(H, W, C, K, compute_bf16)
    sb = jnp.stack([scale, shift]).astype(jnp.float32)  # [2, K]

    in_spec = pl.BlockSpec((1, BH, W + 2, C), lambda n, i: (n, i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_conv_kernel, BH=BH, W=W),
        grid=(N, H // BH),
        in_specs=[in_spec, in_spec, in_spec,
                  pl.BlockSpec((3, 3, C, K), lambda n, i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((2, K), lambda n, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BH, W, K), lambda n, i: (n, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, K), mmdt),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * 9 * C * K,
            bytes_accessed=3 * N * H * (W + 2) * C * 2 + N * H * W * K * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(views[0], views[1], views[2], kernel.astype(mmdt), sb)


def xla_conv3x3_bn_relu(x: jax.Array, kernel: jax.Array, scale: jax.Array,
                        shift: jax.Array,
                        compute_bf16: bool = True) -> jax.Array:
    """The XLA formulation of the same fused block (A/B reference)."""
    mmdt = jnp.bfloat16 if compute_bf16 else jnp.float32
    y = jax.lax.conv_general_dilated(
        x.astype(mmdt), kernel.astype(mmdt), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y * scale[None, None, None, :].astype(jnp.float32)
                    + shift[None, None, None, :].astype(jnp.float32), 0.0)
    return y.astype(mmdt)
