"""Fused out-projection + argmax Pallas kernel — a MEASURED NEGATIVE.

Each greedy step computes ``argmax(mask(h @ W_out^T + b))`` over the
vocab. Hypothesis: XLA materializes the [B, V] logits to HBM (84MB f32
at B=2048, V=10240) just to argmax them, so streaming W_out in vocab
blocks with a running (max, argmax) in VMEM should win. Measured on one
v5e (B=2048, V=10240, bf16, isolated op):

    XLA  matmul + mask + argmax ............ 282 us
    v1   auto-pipelined grid, jnp.argmax .... 329 us  (38.9k vs 44.2k
                                                       clips/s end-to-end)
    v2   manual double-buffered DMA +
         masked-iota-min epilogue (this file) 287 us

i.e. XLA already fuses the argmax reduce into the matmul epilogue —
there is no HBM round-trip to eliminate — and the best hand-written
version only reaches parity. The models therefore keep the jnp path;
this kernel stays as the recorded experiment + a correct reference for
shapes where a custom epilogue IS needed (selection parity proven in
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


def _kernel(h_ref, w_hbm, b_ref, idx_ref, wbuf, sem, max_s, idx_s, *,
            VB: int, n_blocks: int, valid_vocab: Optional[int]):
    """Single invocation; vocab blocks advance under manual double-buffered
    DMA so block j+1's weight transfer rides under block j's dot+epilogue
    (the guide's double-buffer pattern — the auto grid pipeline measured
    16.5us/block here, mostly serialization)."""

    def w_dma(slot, j):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(j * VB, VB), :], wbuf.at[slot], sem.at[slot])

    w_dma(0, 0).start()
    max_s[:] = jnp.full_like(max_s, -jnp.inf)
    idx_s[:] = jnp.zeros_like(idx_s)

    def body(j, _):
        slot = j % 2

        @pl.when(j + 1 < n_blocks)
        def _():
            w_dma((j + 1) % 2, j + 1).start()

        w_dma(slot, j).wait()
        blk = jax.lax.dot_general(
            h_ref[:], wbuf[slot],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        blk = blk + b_ref[0, pl.ds(j * VB, VB)]
        if valid_vocab is not None:
            cols = j * VB + jax.lax.broadcasted_iota(jnp.int32, (1, VB), 1)
            blk = jnp.where(cols < valid_vocab, blk, NEG_INF)
        bmax = jnp.max(blk, axis=1, keepdims=True)            # [B, 1]
        # argmax = min index attaining the max (jnp.argmax semantics);
        # spelled as masked-iota-min — Mosaic lowers it better than argmax
        in_cols = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1)
        bidx = (jnp.min(jnp.where(blk == bmax, in_cols, VB), axis=1,
                        keepdims=True) + j * VB)
        better = bmax > max_s[:]  # strict: earlier block wins ties
        idx_s[:] = jnp.where(better, bidx, idx_s[:])
        max_s[:] = jnp.where(better, bmax, max_s[:])
        return 0

    jax.lax.fori_loop(0, n_blocks, body, 0)
    idx_ref[:] = idx_s[:]


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

    kernel = functools.partial(_kernel, VB=VB, n_blocks=V // VB,
                               valid_vocab=valid_vocab)
    idx = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # h resident
            pl.BlockSpec(memory_space=pltpu.ANY),           # W in HBM, DMA'd
            pl.BlockSpec(memory_space=pltpu.VMEM),          # bias (41KB)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, VB, H), h.dtype),                # w double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * V,
            bytes_accessed=V * H * h.dtype.itemsize + B * H * h.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(h, weight, bias2)
    return idx[:, 0]
