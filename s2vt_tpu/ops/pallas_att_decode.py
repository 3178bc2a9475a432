"""Pallas-fused attention-decoder sequence kernel (forward).

The attention baseline's teacher-forced decoder runs L-1 = 79 sequential
steps of (LSTM cell -> additive attention) — the reference's Python hot
loop (/root/reference/attention_baseline.py:74-84), here a ``lax.scan``
(models/attention.py::teacher_forced). Each step is latency-bound: the
recurrent matmuls are [B, H] x [H, 4H] / [B, 2H] x [2H, 4H] and the
attention reduce touches [B, L, H], all far below MXU occupancy, so an
XLA scan pays per-step dispatch + HBM round-trips for h/c/context.

This kernel runs the WHOLE decode loop in one ``pallas_call``:
 - grid = (ceil(T/C),); VMEM scratch carries (h, c, context) across steps,
 - the recurrent weights (context/hidden gate projections, attention
   projections) and the encoder tensors (enc_outputs, att_enc(enc_outputs))
   stay resident in VMEM for the entire sequence (constant index maps),
 - the embedding half of the input projection (+ both biases) is
   precomputed outside as one big MXU matmul and streamed per-chunk,
 - gate math and softmax in float32; matmuls in bfloat16 when requested.

Implements ``att_mode='softmax'`` only: under ``'reference_sum'`` the
attention weights are constant 1.0 (the reference's softmax-over-singleton
bug), making the context a step-invariant sum — that mode stays on the
scan path where the context is hoisted for free.

Semantics match ``models/attention.py::teacher_forced``'s scan body
(torch LSTM gate order i,f,g,o with both biases; Bahdanau additive scores)
— verified by tests/test_pallas_att_decode.py. bf16 parity nuance: this
kernel rounds enc_wh/enc_out themselves to bfloat16 for VMEM residency
(enc_wh_r/enc_out_r below), while ``att_decode_sequence_scan`` keeps them
float32 and only casts matmul OPERANDS — so in bf16 mode the two paths
agree to bf16 tolerance, not bit-identically (the scan remains the
semantic reference; f32 mode is bit-comparable).

RECORDED A/B (one v5e, forward loop T=79, L=80, H=512; bench.py --att-ab,
r3): B=16 f32 pallas 3.17 ms vs scan 3.08 ms; B=16 bf16 3.09 vs 3.10;
B=32 f32 3.32 vs 3.52; B=32 bf16 3.30 vs 3.47. A wash at the reference's
B=16 and ~5% at B=32 — unlike the plain dual-LSTM loop (pallas_s2vt, ~20%
win), the per-step attention reduce over [B, L, H] keeps the VPU busy
enough that XLA's scan overhead no longer dominates. NOT wired into
models/attention.py (a custom VJP would not pay for itself); kept as a
complete, tested kernel + measured justification — the same
measure-first discipline as pallas_conv / pallas_decode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU
CHUNK = 4


def _interpret() -> bool:
    return _INTERPRET or jax.default_backend() != "tpu"


def att_decode_shapes_ok(batch: int, hidden: int, enc_len: int) -> bool:
    """VMEM gate: the resident set is the two gate projections
    [2H, 4H] + [H, 4H], the attention projections, and the encoder
    tensors [B, L, 2H] + [B, L, H]; per-step temporaries add [B, L, H].
    B <= 32 at H=512, L=80 keeps the scoped total inside the 16 MB
    budget."""
    return (batch % 8 == 0 and batch <= 32 and hidden % 128 == 0
            and enc_len % 8 == 0)


def att_decode_sequence_scan(xp_t: jax.Array, w_ctx: jax.Array,
                             w_hh: jax.Array, w_att: jax.Array,
                             b_att: jax.Array, w_apply: jax.Array,
                             enc_wh: jax.Array, enc_out: jax.Array,
                             context0: jax.Array,
                             compute_dtype=None) -> jax.Array:
    """The same decode loop as one ``lax.scan`` — the XLA baseline the
    kernel is A/B'd against (and the semantic reference for parity tests).
    Signature and return identical to ``att_decode_sequence_pallas``."""
    T, B, G = xp_t.shape
    H = G // 4
    mm = jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32
    w_ctx_m, w_hh_m, w_att_m = (w.astype(mm) for w in (w_ctx, w_hh, w_att))

    def attention(h):
        dw = jnp.dot(h.astype(mm), w_att_m,
                     preferred_element_type=jnp.float32) + b_att
        s = jnp.tanh(enc_wh + dw[:, None, :])
        et = jnp.sum(s * w_apply[None, None, :], axis=2)
        at = jax.nn.softmax(et, axis=1)
        return jnp.sum(at[:, :, None] * enc_out, axis=1)

    def step(carry, xp):
        h, c, ctx = carry
        gates = (xp
                 + jnp.dot(ctx.astype(mm), w_ctx_m,
                           preferred_element_type=jnp.float32)
                 + jnp.dot(h.astype(mm), w_hh_m,
                           preferred_element_type=jnp.float32))
        ig = jax.nn.sigmoid(gates[:, :H])
        fg = jax.nn.sigmoid(gates[:, H:2 * H])
        gg = jnp.tanh(gates[:, 2 * H:3 * H])
        og = jax.nn.sigmoid(gates[:, 3 * H:])
        c = fg * c + ig * gg
        h = og * jnp.tanh(c)
        return (h, c, attention(h)), h

    z = jnp.zeros((B, H), jnp.float32)
    _, hs = jax.lax.scan(step, (z, z, context0), xp_t)
    return hs


def _kernel(xp_ref, wctx_ref, whh_ref, watt_ref, batt_ref, wapp_ref,
            encwh_ref, encout_ref, h0_ref, c0_ref, ctx0_ref,
            out_ref, h_s, c_s, ctx_s, *, seq_len: int, compute_bf16: bool):
    i = pl.program_id(0)
    C = out_ref.shape[0]
    mm = jnp.bfloat16 if compute_bf16 else jnp.float32

    @pl.when(i == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]
        ctx_s[:] = ctx0_ref[:]

    def step(k):
        t = i * C + k

        @pl.when(t < seq_len)
        def _():
            h = h_s[:]
            gates = (xp_ref[k]
                     + jnp.dot(ctx_s[:].astype(mm), wctx_ref[:],
                               preferred_element_type=jnp.float32)
                     + jnp.dot(h.astype(mm), whh_ref[:],
                               preferred_element_type=jnp.float32))
            H = gates.shape[-1] // 4
            ig = jax.nn.sigmoid(gates[:, :H])
            fg = jax.nn.sigmoid(gates[:, H:2 * H])
            gg = jnp.tanh(gates[:, 2 * H:3 * H])
            og = jax.nn.sigmoid(gates[:, 3 * H:])
            c_new = fg * c_s[:] + ig * gg
            h_new = og * jnp.tanh(c_new)
            c_s[:] = c_new
            h_s[:] = h_new
            out_ref[k] = h_new

            # additive attention (models/attention.py::_attention):
            # et[b,l] = w_apply . tanh(enc_wh[b,l] + W_att h + b_att)
            dw = (jnp.dot(h_new.astype(mm), watt_ref[:],
                          preferred_element_type=jnp.float32)
                  + batt_ref[:])                              # [B, H]
            s = jnp.tanh(encwh_ref[:].astype(jnp.float32)
                         + dw[:, None, :])                    # [B, L, H]
            et = jnp.sum(s * wapp_ref[:][None, None, :], axis=2)  # [B, L]
            et = et - jnp.max(et, axis=1, keepdims=True)
            ex = jnp.exp(et)
            at = ex / jnp.sum(ex, axis=1, keepdims=True)      # softmax_L
            ctx_s[:] = jnp.sum(
                at[:, :, None] * encout_ref[:].astype(jnp.float32), axis=1)

    for k in range(C):  # static unroll: k-indexing stays static
        step(k)


def att_decode_sequence_pallas(xp_t: jax.Array, w_ctx: jax.Array,
                               w_hh: jax.Array, w_att: jax.Array,
                               b_att: jax.Array, w_apply: jax.Array,
                               enc_wh: jax.Array, enc_out: jax.Array,
                               context0: jax.Array,
                               compute_dtype=None) -> jax.Array:
    """Fused forward decode loop.

    xp_t     [T, B, 4H]  embedding input projection + b_ih + b_hh
    w_ctx    [2H, 4H]    context half of W_ih, transposed
    w_hh     [H, 4H]     recurrent weight, transposed
    w_att    [H, H]      att_prev_hid weight, transposed
    b_att    [H]
    w_apply  [H]         att_apply weight (squeezed)
    enc_wh   [B, L, H]   att_enc(enc_outputs), hoisted
    enc_out  [B, L, 2H]
    context0 [B, 2H]     attention at h = 0 (computed outside)
    Returns the hidden sequence [T, B, H] (float32).
    """
    T, B, G = xp_t.shape
    H = G // 4
    L = enc_out.shape[1]
    C = CHUNK
    nb = -(-T // C)
    t_pad = nb * C
    if t_pad != T:
        xp_t = jnp.concatenate(
            [xp_t, jnp.zeros((t_pad - T, B, G), xp_t.dtype)], axis=0)
    compute_bf16 = compute_dtype == jnp.bfloat16
    mm = jnp.bfloat16 if compute_bf16 else jnp.float32
    w_ctx, w_hh, w_att = (w.astype(mm) for w in (w_ctx, w_hh, w_att))
    enc_wh_r = enc_wh.astype(mm)
    enc_out_r = enc_out.astype(mm)

    kernel = functools.partial(_kernel, seq_len=T, compute_bf16=compute_bf16)
    blk = lambda i: (i, 0, 0)
    const2 = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)
    const1 = lambda i: (0,)
    z = jnp.zeros((B, H), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((C, B, G), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * H, G), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L, 2 * H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 2 * H), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, B, H), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, B, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, 2 * H), jnp.float32),
        ],
        interpret=_interpret(),
    )(xp_t, w_ctx, w_hh, w_att, b_att, w_apply, enc_wh_r, enc_out_r,
      z, z, context0)
    return outs[:T]
