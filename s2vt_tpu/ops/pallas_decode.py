"""Fused out-projection + argmax Pallas kernel — a MEASURED NEGATIVE.

Each greedy step computes ``argmax(mask(h @ W_out^T + b))`` over the
vocab. Hypothesis: XLA materializes the [B, V] logits to HBM (84MB f32
at B=2048, V=10240) just to argmax them, so streaming W_out in vocab
blocks with a running (max, argmax) in VMEM should win. Measured on one
v5e: it LOSES — 38.9k vs 44.2k clips/s at B=2048 (35.0k vs 38.3k at
1024). XLA already fuses the argmax reduce into the matmul epilogue (no
HBM round-trip to eliminate), and the blocked grid pays per-block VPU
argmax sweeps instead. The models therefore keep the jnp path; this
kernel stays as the recorded experiment + a correct reference for shapes
where a custom epilogue IS needed (selection parity proven in
tests/test_pallas_decode.py, including cross-block tie-breaking).

Kernel structure:

    grid over vocab blocks i:
      blk = h @ W[i·VB:(i+1)·VB]^T + b[i·VB:...]        (MXU, f32 acc)
      blk = where(col < valid_vocab, blk, NEG_INF)       (pad-vocab mask)
      fold (max(blk), argmax(blk)+i·VB) into running scratch, strict '>'
      so the FIRST global maximum wins — jnp.argmax tie semantics.

Selection is exact: same matmul op (bf16/f32 with f32 accumulation on
the MXU), same mask constant, same first-occurrence tie-breaking as
``jnp.argmax(mask_invalid_vocab(apply_linear(...)))`` (reference greedy
semantics, S2VTModel.py:98-107).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30   # identical constant to ops.layers.mask_invalid_vocab
_INTERPRET = False


def _interpret() -> bool:
    return _INTERPRET or jax.default_backend() != "tpu"


def _pick_vb(B: int, V: int) -> int:
    """Largest vocab block (multiple of 128, divisor of V, <=1024) whose
    f32 logits block stays under ~4MB of VMEM stack."""
    cap = max(128, min(1024, (4 * 1024 * 1024) // (4 * B) // 128 * 128))
    for vb in range(cap, 0, -128):
        if V % vb == 0:
            return vb
    return 0


def argmax_linear_ok(B: int, H: int, V: int) -> bool:
    return (B % 8 == 0 and B <= 2048 and H % 128 == 0 and
            _pick_vb(B, V) >= 128)


def _kernel(h_ref, w_ref, b_ref, idx_ref, max_s, *,
            VB: int, valid_vocab: Optional[int]):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        max_s[:] = jnp.full_like(max_s, -jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    blk = jax.lax.dot_general(
        h_ref[:], w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0]
    if valid_vocab is not None:
        cols = i * VB + jax.lax.broadcasted_iota(jnp.int32, (1, VB), 1)
        blk = jnp.where(cols < valid_vocab, blk, NEG_INF)
    bmax = jnp.max(blk, axis=1, keepdims=True)                # [B, 1]
    bidx = (jnp.argmax(blk, axis=1).astype(jnp.int32)[:, None]
            + i * VB)
    better = bmax > max_s[:]      # strict: earlier block wins ties
    idx_ref[:] = jnp.where(better, bidx, idx_ref[:])
    max_s[:] = jnp.where(better, bmax, max_s[:])


@functools.partial(jax.jit,
                   static_argnames=("valid_vocab", "compute_dtype"))
def argmax_linear(h: jax.Array, weight: jax.Array, bias: jax.Array,
                  valid_vocab: Optional[int] = None,
                  compute_dtype=None) -> jax.Array:
    """argmax over ``mask_invalid_vocab(apply_linear(h, weight, bias))``.

    h: [B, H]; weight: torch-layout [V, H]; bias: [V]. Returns int32 [B].
    """
    B, H = h.shape
    V = weight.shape[0]
    VB = _pick_vb(B, V)
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
        weight = weight.astype(compute_dtype)
    if valid_vocab is not None and valid_vocab >= V:
        valid_vocab = None
    bias2 = bias.astype(jnp.float32).reshape(1, V)

    kernel = functools.partial(_kernel, VB=VB, valid_vocab=valid_vocab)
    idx = pl.pallas_call(
        kernel,
        grid=(V // VB,),
        in_specs=[
            pl.BlockSpec((B, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((VB, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * V,
            bytes_accessed=V * H * h.dtype.itemsize + B * H * h.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(h, weight, bias2)
    return idx[:, 0]
