"""Pallas-fused LSTM sequence kernel (TPU hot path).

The S2VT forward runs 2L-1 = 159 sequential LSTM steps per layer
(reference: one cuDNN LSTM call, /root/reference/S2VTModel.py:67,77; here:
``ops/rnn.py`` lax.scan). Each step's recurrent matmul is only
[B, H] x [H, 4H], so an XLA scan pays per-step dispatch/HBM latency far
above the MXU time. This kernel runs the WHOLE sequence in one
``pallas_call``:

 - grid = (ceil(T/C),) with C time steps per grid step — the TPU grid is
   sequential, so VMEM scratch carries (h, c) across steps, and chunking C
   steps per grid invocation amortizes per-step pipeline overhead,
 - the recurrent weight W_hh lives in VMEM for the entire sequence
   (constant index_map), never re-fetched from HBM,
 - the precomputed input projection x_proj streams in per-chunk blocks
   (Pallas double-buffers them automatically),
 - gate math in float32; the recurrent matmul in bfloat16 when requested.

Semantics are identical to ``ops.rnn.rnn_sequence`` (torch gate order
i,f,g,o, both biases) — verified by parity tests. A custom VJP implements
the reverse-sweep BPTT as a second Pallas kernel, accumulating dW_hh in a
float32 VMEM scratch across steps, so training also runs fused.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from s2vt_tpu.ops.rnn import LSTMState, input_projection

_INTERPRET = False  # flipped by tests on CPU
CHUNK = 4           # fwd time steps per grid step (VMEM-bounded at MSVD
#   scale: the pipeline holds 2x(x_proj + gates + h + c) chunk blocks plus
#   W_hh; CHUNK=4 keeps B=64, H=512 under the 16MB VMEM budget)
BWD_CHUNK = 2       # bwd streams 6 chunk blocks + dW accumulator: smaller


def _fwd_chunk(batch: int) -> int:
    """Stream footprint scales with CHUNK*B: halve the time block past
    B=64 so B<=128 stays inside the VMEM budget."""
    return CHUNK // 2 if batch > 64 else CHUNK


def _bwd_chunk(batch: int) -> int:
    return 1 if batch > 64 else BWD_CHUNK


def _interpret() -> bool:
    return _INTERPRET or jax.default_backend() != "tpu"


def pallas_shapes_ok(batch: int, hidden: int) -> bool:
    """Single source of truth for the Pallas-kernel shape gate (per-layer
    and fused kernels): MXU/VPU alignment, and the small-batch
    latency-optimized regime. B <= 96 is the hardware-validated VMEM
    envelope at H=512 (1-step chunks + zero-block-free backward weights
    + matmul-dtype gradient streams; B=128 still overflows the 16MB
    scoped budget). Measured full-train-step A/B on one v5e, bf16
    (BENCH r2): B=64 fused 8.9ms vs scan 12.4ms; B=96 fused 12.2ms vs
    scan 15.1ms; B=128 fused OOM vs scan 18.5ms — larger batches route
    to the XLA scan path, whose bigger per-step matmuls amortize the
    sequential latency."""
    return batch % 8 == 0 and batch <= 96 and hidden % 128 == 0


def _pad_time(x: jax.Array, t_pad: int) -> jax.Array:
    T = x.shape[0]
    if t_pad == T:
        return x
    pad = jnp.zeros((t_pad - T,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def _fwd_kernel(xp_ref, whh_ref, h0_ref, c0_ref, out_ref, gates_ref,
                cseq_ref, hT_ref, cT_ref, h_s, c_s, *,
                seq_len: int, compute_bf16: bool):
    i = pl.program_id(0)
    C = out_ref.shape[0]

    @pl.when(i == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    def step(k):
        t = i * C + k

        @pl.when(t < seq_len)
        def _():
            h = h_s[:]
            if compute_bf16:
                # whh_ref already holds bf16 (pre-cast by the caller).
                rec = jnp.dot(h.astype(jnp.bfloat16), whh_ref[:],
                              preferred_element_type=jnp.float32)
            else:
                rec = jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
            gates = xp_ref[k] + rec                               # [B, 4H]
            H = gates.shape[-1] // 4
            ig = jax.nn.sigmoid(gates[:, :H])
            fg = jax.nn.sigmoid(gates[:, H:2 * H])
            gg = jnp.tanh(gates[:, 2 * H:3 * H])
            og = jax.nn.sigmoid(gates[:, 3 * H:])
            c_new = fg * c_s[:] + ig * gg
            h_new = og * jnp.tanh(c_new)
            gates_ref[k, :, :H] = ig
            gates_ref[k, :, H:2 * H] = fg
            gates_ref[k, :, 2 * H:3 * H] = gg
            gates_ref[k, :, 3 * H:] = og
            cseq_ref[k] = c_new
            c_s[:] = c_new
            h_s[:] = h_new
            out_ref[k] = h_new

            @pl.when(t == seq_len - 1)
            def _():
                hT_ref[:] = h_new
                cT_ref[:] = c_new

    for k in range(C):  # static unroll: k-indexing stays static
        step(k)


def _run_forward(x_proj_t: jax.Array, w_hh_t: jax.Array, h0: jax.Array,
                 c0: jax.Array, compute_bf16: bool):
    T, B, G = x_proj_t.shape
    H = G // 4
    C = _fwd_chunk(B)
    nb = -(-T // C)
    t_pad = nb * C
    x_proj_t = _pad_time(x_proj_t, t_pad)
    if compute_bf16:
        w_hh_t = w_hh_t.astype(jnp.bfloat16)
    kernel = functools.partial(_fwd_kernel, seq_len=T,
                               compute_bf16=compute_bf16)
    blk = lambda i: (i, 0, 0)
    const = lambda i: (0, 0)
    outs, gates, cseq, hT, cT = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((C, B, G), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((C, B, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, G), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, B, H), jnp.float32),  # h sequence
            jax.ShapeDtypeStruct((t_pad, B, G), jnp.float32),  # gate residuals
            jax.ShapeDtypeStruct((t_pad, B, H), jnp.float32),  # c sequence
            jax.ShapeDtypeStruct((B, H), jnp.float32),         # h_T
            jax.ShapeDtypeStruct((B, H), jnp.float32),         # c_T
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(x_proj_t, w_hh_t, h0, c0)
    return outs[:T], gates[:T], cseq[:T], hT, cT


def _bwd_kernel(gates_ref, cseq_ref, cprev_ref, whh_ref, dout_ref,
                dhT_ref, dcT_ref, dxp_ref, dh0_ref, dc0_ref,
                dh_s, dc_s, *, seq_len: int, compute_bf16: bool):
    j = pl.program_id(0)
    nb = pl.num_programs(0)
    C = dxp_ref.shape[0]
    block = nb - 1 - j  # blocks walk backward through time

    @pl.when(j == 0)
    def _():
        dh_s[:] = dhT_ref[:]
        dc_s[:] = dcT_ref[:]

    def step(k):
        t = block * C + k

        @pl.when(t < seq_len)
        def _():
            gates = gates_ref[k]
            H = gates.shape[-1] // 4
            ig, fg = gates[:, :H], gates[:, H:2 * H]
            gg, og = gates[:, 2 * H:3 * H], gates[:, 3 * H:]
            c = cseq_ref[k]
            c_prev = cprev_ref[k]

            tanh_c = jnp.tanh(c)
            dh = dh_s[:] + dout_ref[k]
            dc = dc_s[:] + dh * og * (1.0 - tanh_c * tanh_c)
            d_i = dc * gg * ig * (1.0 - ig)
            d_f = dc * c_prev * fg * (1.0 - fg)
            d_g = dc * ig * (1.0 - gg * gg)
            d_o = dh * tanh_c * og * (1.0 - og)
            dgates = jnp.concatenate([d_i, d_f, d_g, d_o], axis=-1)  # [B, 4H]
            dxp_ref[k] = dgates

            if compute_bf16:
                dh_prev = jnp.dot(dgates.astype(jnp.bfloat16), whh_ref[:],
                                  preferred_element_type=jnp.float32)
            else:
                dh_prev = jnp.dot(dgates, whh_ref[:],
                                  preferred_element_type=jnp.float32)
            dh_s[:] = dh_prev
            dc_s[:] = dc * fg

            @pl.when(t == 0)
            def _():
                dh0_ref[:] = dh_s[:]
                dc0_ref[:] = dc_s[:]

    for k in reversed(range(C)):  # static unroll, reverse time
        step(k)


def _run_backward(gates, cseq, cprev, w_hh, dout, dhT, dcT,
                  compute_bf16: bool):
    T, B, G = gates.shape
    H = G // 4
    C = _bwd_chunk(B)
    nb = -(-T // C)
    t_pad = nb * C
    gates, cseq, cprev, dout = (
        _pad_time(a, t_pad) for a in (gates, cseq, cprev, dout))
    if compute_bf16:
        w_hh = w_hh.astype(jnp.bfloat16)
    rev = lambda j: (nb - 1 - j, 0, 0)
    const = lambda j: (0, 0)
    kernel = functools.partial(_bwd_kernel, seq_len=T,
                               compute_bf16=compute_bf16)
    dxp, dh0, dc0 = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((C, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((C, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, B, G), jnp.float32),  # dx_proj
            jax.ShapeDtypeStruct((B, H), jnp.float32),         # dh0
            jax.ShapeDtypeStruct((B, H), jnp.float32),         # dc0
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(gates, cseq, cprev, w_hh, dout, dhT, dcT)
    return dxp[:T], dh0, dc0


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _lstm_seq(x_proj_t, w_hh_t, h0, c0, compute_bf16: bool):
    outs, _, _, hT, cT = _run_forward(x_proj_t, w_hh_t, h0, c0, compute_bf16)
    return outs, hT, cT


def _lstm_seq_fwd(x_proj_t, w_hh_t, h0, c0, compute_bf16: bool):
    outs, gates, cseq, hT, cT = _run_forward(x_proj_t, w_hh_t, h0, c0,
                                             compute_bf16)
    return (outs, hT, cT), (outs, gates, cseq, w_hh_t, h0, c0)


def _lstm_seq_bwd(compute_bf16: bool, res, grads):
    outs, gates, cseq, w_hh_t, h0, c0 = res
    dout, dhT, dcT = grads
    # h_prev / c_prev sequences: state BEFORE step t.
    hprev = jnp.concatenate([h0[None], outs[:-1]], axis=0)
    cprev = jnp.concatenate([c0[None], cseq[:-1]], axis=0)
    # backward needs W_hh with gates leading: w_hh_t is [H, 4H] -> [4H, H]
    dxp, dh0, dc0 = _run_backward(
        gates, cseq, cprev, w_hh_t.T, dout, dhT, dcT, compute_bf16)
    # dW_hh as ONE big MXU matmul outside the kernel:
    # gates_t = h_prev @ w_hh_t => d(w_hh_t)[h, g] = sum_{t,b} hprev * dxp.
    dw_t = jnp.einsum("tbh,tbg->hg", hprev, dxp,
                      preferred_element_type=jnp.float32)
    return dxp, dw_t, dh0, dc0


_lstm_seq.defvjp(_lstm_seq_fwd, _lstm_seq_bwd)


def lstm_sequence_pallas(xs: jax.Array, params: dict,
                         h0: Optional[LSTMState] = None,
                         compute_dtype=None) -> Tuple[jax.Array, LSTMState]:
    """Drop-in replacement for ``ops.rnn.rnn_sequence`` (LSTM, forward
    direction): xs [B, T, in] -> (outputs [B, T, H], final state)."""
    B, T, _ = xs.shape
    H = params["w_hh"].shape[1]
    if h0 is None:
        z = jnp.zeros((B, H), jnp.float32)
        h0 = LSTMState(z, z)
    x_proj = input_projection(xs, params, compute_dtype)      # [B, T, 4H]
    x_proj = x_proj + params["b_hh"].astype(jnp.float32)
    x_proj_t = jnp.swapaxes(x_proj, 0, 1)                     # [T, B, 4H]
    w_hh_t = params["w_hh"].T                                 # [H, 4H]
    compute_bf16 = compute_dtype == jnp.bfloat16
    outs, hT, cT = _lstm_seq(x_proj_t, w_hh_t, h0.h, h0.c, compute_bf16)
    return jnp.swapaxes(outs, 0, 1), LSTMState(hT, cT)
