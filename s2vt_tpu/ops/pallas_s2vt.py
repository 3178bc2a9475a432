"""Fused dual-layer S2VT Pallas kernel: both LSTM chains in ONE kernel,
ONE recurrent matmul per time step.

The S2VT recurrence (reference S2VTModel.py:63-81) is two stacked LSTMs
where word_rnn's step-t input contains vid_rnn's step-t OUTPUT. Run
separately that is 2 x (2L-1) dependent matmuls; the per-step cost on TPU
is dominated by dependent-matmul latency and is nearly independent of the
matmul size (clean slope-measured value: ~14us/step for
[96,1024]x[1024,4096] bf16, bench.py::bench_dep_matmul_latency — the
matmul's FLOPs alone would take ~4us at peak, the rest is systolic
fill/drain no schedule can hide). This kernel therefore SOFTWARE-PIPELINES the two chains
by one step and fuses their recurrent projections into a single
[B, 2H] x [2H, 8H] matmul:

    iteration t:  big = [h1_{t-1} | h2_{t-2}] @ W_all
      phase A (t < T):      gates1_t = x1_t + big[:, :4H]   -> h1_t, c1_t
      phase B (1 <= t <= T): gates2_{t-1} = x2_{t-1} + big[:, 4H:]
                                                            -> h2_{t-1}, c2_{t-1}

    W_all = [[W1hh^T, W2v^T ],      (W2v = word W_ih columns that consume
             [0,      W2hh^T]]       vid output; the embedding columns are
                                      pre-projected into x2 outside)

Both chains' 2L-1 steps complete in ~(2L) iterations of one combined
matmul + two cells (vs 2x(2L-1) iterations for per-layer kernels).
Measured on one v5e at MSVD scale, full train step (value_and_grad +
adam), fused vs lax.scan (BENCH r2): B=16 4.2 vs 7.8 ms; B=64 8.9 vs
12.4 ms; B=96 12.2 vs 15.1 ms; B=128 exceeds the VMEM envelope and the
gate routes to scan (18.5 ms). Per-step time is latency-bound, so the
single fused kernel also halves kernel launches on the decode path.

The backward pass is the same trick in reverse (one fused matmul produces
dh1-chain and dh2-chain contributions), with dW/dx projections as big MXU
einsums outside the kernel. Matmul + residual-gate dtype follows the
model's compute_dtype (f32 unless bfloat16 is requested); the recurrent
state stays float32 inside the kernel either way.

Used by S2VT (models/s2vt.py) when ``use_pallas`` is on, shapes are
MXU-aligned, and num_layers == 1.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 2  # W_all (8.4MB bf16 at H=512) owns the VMEM; 2-step blocks with
#   matmul-dtype input streams amortize per-grid-step overhead and still fit
_INTERPRET = False


def _chunk_for(batch: int) -> int:
    """Time-steps per grid step: the double-buffered stream footprint
    scales with CHUNK*B, so large batches drop to 1-step blocks to stay
    inside the 16MB VMEM budget next to the resident W_all."""
    return 1 if batch > 64 else CHUNK

# Validated VMEM envelope for the resident W_all block: bf16 at H=512 is
# 8.4MB (the hardware-tested config). The gate scales by dtype width so an
# f32 run (compute_dtype=None) only engages up to H=256 — f32 W_all at
# H=512 is 16.8MB, over the whole budget.
_WALL_BYTES_MAX = 2 * (2 * 512) * (8 * 512)


def _mm_dtype(compute_bf16: bool):
    return jnp.bfloat16 if compute_bf16 else jnp.float32


def _interpret() -> bool:
    return _INTERPRET or jax.default_backend() != "tpu"


def _pad_rows(x: jax.Array, rows: int) -> jax.Array:
    if x.shape[0] == rows:
        return x
    pad = jnp.zeros((rows - x.shape[0],) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def _cell(gates, c_prev):
    H = gates.shape[-1] // 4
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c = f * c_prev + i * g
    h = o * jnp.tanh(c)
    post = jnp.concatenate([i, f, g, o], axis=-1)
    return post, c, h


def _cell_bwd(post, c, c_prev, dh, dc_carry):
    """LSTM cell backward: post-activation gates + dh/dc -> (dgates_pre,
    dc_prev_partial)."""
    H = c.shape[-1]
    i, f = post[:, :H], post[:, H:2 * H]
    g, o = post[:, 2 * H:3 * H], post[:, 3 * H:]
    tanh_c = jnp.tanh(c)
    dc = dc_carry + dh * o * (1.0 - tanh_c * tanh_c)
    d_i = dc * g * i * (1.0 - i)
    d_f = dc * c_prev * f * (1.0 - f)
    d_g = dc * i * (1.0 - g * g)
    d_o = dh * tanh_c * o * (1.0 - o)
    dgates = jnp.concatenate([d_i, d_f, d_g, d_o], axis=-1)
    return dgates, dc * f


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(x1_ref, x2s_ref, wall_ref, out_refs, scratch, *,
                seq_len: int, snap_idx: int):
    (g1_ref, c1_ref, g2s_ref, c2s_ref, h1T_ref, c1T_ref, h2T_ref, c2T_ref,
     h2s_ref, c2snap_ref) = out_refs
    h1_s, c1_s, h2_s, c2_s = scratch
    i = pl.program_id(0)
    C = x1_ref.shape[0]
    T = seq_len

    @pl.when(i == 0)
    def _():
        h1_s[:] = jnp.zeros_like(h1_s)
        c1_s[:] = jnp.zeros_like(c1_s)
        h2_s[:] = jnp.zeros_like(h2_s)
        c2_s[:] = jnp.zeros_like(c2_s)

    for k in range(C):
        t = i * C + k
        # ONE combined recurrent matmul serves both (pipelined) chains —
        # two separate dots serialize on the MXU (measured 24us vs 12us).
        z = jnp.concatenate([h1_s[:], h2_s[:]], axis=-1).astype(wall_ref.dtype)
        big = jnp.dot(z, wall_ref[:], preferred_element_type=jnp.float32)
        G4 = big.shape[-1] // 2

        @pl.when(t < T)
        def _():
            post, c1, h1 = _cell(x1_ref[k].astype(jnp.float32) + big[:, :G4],
                                 c1_s[:])
            g1_ref[k] = post.astype(g1_ref.dtype)
            c1_ref[k] = c1
            h1_s[:] = h1
            c1_s[:] = c1

            @pl.when(t == T - 1)
            def _():
                h1T_ref[:] = h1
                c1T_ref[:] = c1

        @pl.when(jnp.logical_and(t >= 1, t <= T))
        def _():
            post, c2, h2 = _cell(x2s_ref[k].astype(jnp.float32) + big[:, G4:],
                                 c2_s[:])
            g2s_ref[k] = post.astype(g2s_ref.dtype)
            c2s_ref[k] = c2
            h2_s[:] = h2
            c2_s[:] = c2

            @pl.when(t - 1 == snap_idx)
            def _():
                h2s_ref[:] = h2
                c2snap_ref[:] = c2

            @pl.when(t == T)
            def _():
                h2T_ref[:] = h2
                c2T_ref[:] = c2


def _run_fwd(x1t, x2t, w_all, snap_idx: int, compute_bf16: bool = True):
    """x1t [T, B, 4H]; x2t [T, B, 4H] (word inputs in TIME order);
    w_all [2H, 8H] (see _assemble_wall). Returns residuals + finals; word
    outputs are stored SHIFTED by one row (row t = step t-1)."""
    mmd = _mm_dtype(compute_bf16)
    T, B, G = x1t.shape
    H = G // 4
    T1 = T + 1
    C = _chunk_for(B)
    nb = -(-T1 // C)
    rows = nb * C
    x1p = _pad_rows(x1t, rows).astype(mmd)
    # shift word inputs: row t holds x2 for word step t-1
    x2s = _pad_rows(jnp.concatenate([jnp.zeros((1, B, G), x2t.dtype), x2t],
                                    axis=0), rows).astype(mmd)
    w16 = w_all.astype(mmd)

    blk = lambda i: (i, 0, 0)
    const = lambda i: (0, 0)
    kernel = functools.partial(_fwd_kernel, seq_len=T, snap_idx=snap_idx)

    def k(*args):
        x1_ref, x2s_ref, wall_ref = args[:3]
        out_refs = args[3:13]
        scratch = args[13:]
        return kernel(x1_ref, x2s_ref, wall_ref, out_refs, scratch)

    outs = pl.pallas_call(
        k,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((C, B, G), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, G), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * H, 2 * G), const, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            [pl.BlockSpec((C, B, G), blk, memory_space=pltpu.VMEM),
             pl.BlockSpec((C, B, H), blk, memory_space=pltpu.VMEM),
             pl.BlockSpec((C, B, G), blk, memory_space=pltpu.VMEM),
             pl.BlockSpec((C, B, H), blk, memory_space=pltpu.VMEM)] +
            [pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM)] * 6),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((rows, B, G), mmd),            # gates1
             jax.ShapeDtypeStruct((rows, B, H), jnp.float32),    # c1seq
             jax.ShapeDtypeStruct((rows, B, G), mmd),            # gates2 (shifted)
             jax.ShapeDtypeStruct((rows, B, H), jnp.float32)] +  # c2seq (shifted)
            [jax.ShapeDtypeStruct((B, H), jnp.float32)] * 6),    # finals+snap
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)] * 4,
        interpret=_interpret(),
    )(x1p, x2s, w16)
    g1, c1, g2s, c2s, h1T, c1T, h2T, c2T, h2snap, c2snap = outs
    # un-shift word outputs back to time order
    g2 = g2s[1:T + 1]
    c2 = c2s[1:T + 1]
    return (g1[:T], c1[:T], g2, c2, h1T, c1T, h2T, c2T, h2snap, c2snap)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(g1r_ref, c1r_ref, c1pr_ref, g2r_ref, c2r_ref, c2pr_ref,
                do2r_ref, wb1_ref, wb2_ref, dxp1r_ref, dxp2r_ref,
                dg1_s, dg2_s, dc1_s, dc2_s, *, seq_len: int):
    """Reverse sweep in 'iteration order' j (arrays pre-flipped outside):
      phase A' at j: dgates1 for t1 = T - j   (valid j >= 1)
      phase B' at j: dgates2 for t2 = T-1 - j (valid j <= T-1)
    Streams: *_A rows j hold time T-j; *_B rows j hold time T-1-j.

    The chain weights are SPLIT (wb1 [2G, H] -> dh1, wb2 [G, H] -> dh2)
    rather than one [2G, 2H] block: the block's top-right quarter is
    structurally zero, and dropping it saves G*H weights of VMEM — the
    difference between fitting B=96-128 and not."""
    j0 = pl.program_id(0)
    C = g1r_ref.shape[0]
    T = seq_len

    @pl.when(j0 == 0)
    def _():
        dg1_s[:] = jnp.zeros_like(dg1_s)
        dg2_s[:] = jnp.zeros_like(dg2_s)
        dc1_s[:] = jnp.zeros_like(dc1_s)
        dc2_s[:] = jnp.zeros_like(dc2_s)

    for k in range(C):
        j = j0 * C + k
        pair = jnp.concatenate([dg1_s[:], dg2_s[:]],
                               axis=-1).astype(wb1_ref.dtype)
        dh1_chain = jnp.dot(pair, wb1_ref[:],
                            preferred_element_type=jnp.float32)
        dh2_chain = jnp.dot(dg2_s[:].astype(wb2_ref.dtype), wb2_ref[:],
                            preferred_element_type=jnp.float32)

        # phase B': dgates2 at t2 = T-1-j
        @pl.when(jnp.logical_and(j <= T - 1, j >= 0))
        def _():
            dh2 = dh2_chain + do2r_ref[k]
            dgates2, dc2p = _cell_bwd(g2r_ref[k].astype(jnp.float32),
                                      c2r_ref[k], c2pr_ref[k], dh2, dc2_s[:])
            dxp2r_ref[k] = dgates2.astype(dxp2r_ref.dtype)
            dg2_s[:] = dgates2
            dc2_s[:] = dc2p

        # phase A': dgates1 at t1 = T-j
        @pl.when(jnp.logical_and(j >= 1, j <= T))
        def _():
            dgates1, dc1p = _cell_bwd(g1r_ref[k].astype(jnp.float32),
                                      c1r_ref[k], c1pr_ref[k], dh1_chain,
                                      dc1_s[:])
            dxp1r_ref[k] = dgates1.astype(dxp1r_ref.dtype)
            dg1_s[:] = dgates1
            dc1_s[:] = dc1p


def _rev_a(x_time, rows):
    """Phase-A stream: row j holds time T-j (row 0 dummy)."""
    dummy = jnp.zeros((1,) + x_time.shape[1:], x_time.dtype)
    return _pad_rows(jnp.concatenate([dummy, jnp.flip(x_time, 0)], 0), rows)


def _rev_b(x_time, rows):
    """Phase-B stream: row j holds time T-1-j."""
    return _pad_rows(jnp.flip(x_time, 0), rows)


def _run_bwd(g1, c1, c1prev, g2, c2, c2prev, dout2, wb1, wb2,
             compute_bf16: bool = True):
    T, B, G = g1.shape
    H = G // 4
    T1 = T + 1
    C = _chunk_for(B)
    nb = -(-T1 // C)
    rows = nb * C

    g1r = _rev_a(g1, rows)
    c1r = _rev_a(c1, rows)
    c1pr = _rev_a(c1prev, rows)
    g2r = _rev_b(g2, rows)
    c2r = _rev_b(c2, rows)
    c2pr = _rev_b(c2prev, rows)
    do2r = _rev_b(dout2, rows)
    mmd = _mm_dtype(compute_bf16)
    wb1 = wb1.astype(mmd)
    wb2 = wb2.astype(mmd)

    blk = lambda i: (i, 0, 0)
    const = lambda i: (0, 0)
    kernel = functools.partial(_bwd_kernel, seq_len=T)
    dxp1r, dxp2r = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((C, B, G), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, G), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, H), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * G, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((C, B, G), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, G), blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            # gradient streams in the matmul dtype: in bf16 mode this saves
            # the VMEM that lets B=128 fit (they feed bf16 dW matmuls anyway)
            jax.ShapeDtypeStruct((rows, B, G), mmd),
            jax.ShapeDtypeStruct((rows, B, G), mmd),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, G), jnp.float32),
            pltpu.VMEM((B, G), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(g1r, c1r, c1pr, g2r, c2r, c2pr, do2r, wb1, wb2)
    # un-reverse: dxp1r row j -> time T-j (rows 1..T); dxp2r row j -> T-1-j
    dxp1 = jnp.flip(dxp1r[1:T + 1], 0).astype(jnp.float32)
    dxp2 = jnp.flip(dxp2r[:T], 0).astype(jnp.float32)
    return dxp1, dxp2


# ---------------------------------------------------------------------------
# differentiable teacher-forced core
# ---------------------------------------------------------------------------


def _h_from(post, c):
    G = post.shape[-1]
    H = G // 4
    return post[..., 3 * H:].astype(jnp.float32) * jnp.tanh(c)


def _assemble_wall(w1hh, w2v, w2hh):
    """[2H, 8H]: z = [h1 | h2] -> [gates1 | gates2]."""
    G, H = w1hh.shape
    top = jnp.concatenate([w1hh.T, w2v.T], axis=1)          # [H, 8H]
    bot = jnp.concatenate([jnp.zeros((H, G), w1hh.dtype), w2hh.T], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _assemble_wb(w1hh, w2v, w2hh):
    """Backward chain weights, zero-block-free: wb1 [8H, H] maps
    [dgates1 | dgates2] -> dh1 (= dg1 @ w1hh + dg2 @ w2v); wb2 [4H, H]
    maps dgates2 -> dh2 (= dg2 @ w2hh)."""
    wb1 = jnp.concatenate([w1hh, w2v], axis=0)
    return wb1, w2hh


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def s2vt_fused_out2(x1t, x2t, w1hh, w2v, w2hh, compute_bf16: bool = True):
    """Teacher-forced S2VT core: both LSTM layers fused.

    x1t [T, B, 4H]: vid inputs pre-projected (x @ W1ih^T + b1ih + b1hh).
    x2t [T, B, 4H]: word EMBEDDING part pre-projected
                    (emb @ W2e^T + b2ih + b2hh); the vid-output part is
                    added inside via w2v.
    ``compute_bf16`` selects the matmul/residual dtype — f32 unless the
    model's compute_dtype is bfloat16, mirroring lstm_sequence_pallas.
    Returns out2 [T, B, H] (word_rnn hidden sequence).
    """
    out2, _ = _fused_fwd_impl(x1t, x2t, w1hh, w2v, w2hh, compute_bf16)
    return out2


def _fused_fwd_impl(x1t, x2t, w1hh, w2v, w2hh, compute_bf16):
    res = _run_fwd(x1t, x2t, _assemble_wall(w1hh, w2v, w2hh), snap_idx=-2,
                   compute_bf16=compute_bf16)
    g1, c1, g2, c2 = res[:4]
    out2 = _h_from(g2, c2)
    return out2, (g1, c1, g2, c2, w1hh, w2v, w2hh)


def _fused_fwd(x1t, x2t, w1hh, w2v, w2hh, compute_bf16):
    out2, resid = _fused_fwd_impl(x1t, x2t, w1hh, w2v, w2hh, compute_bf16)
    return out2, resid


def _fused_bwd(compute_bf16, resid, dout2):
    g1, c1, g2, c2, w1hh, w2v, w2hh = resid
    B, H = c1.shape[1], c1.shape[2]
    zero = jnp.zeros((1, B, H), jnp.float32)
    c1prev = jnp.concatenate([zero, c1[:-1]], axis=0)
    c2prev = jnp.concatenate([zero, c2[:-1]], axis=0)
    wb1, wb2 = _assemble_wb(w1hh, w2v, w2hh)
    dxp1, dxp2 = _run_bwd(g1, c1, c1prev, g2, c2, c2prev, dout2, wb1, wb2,
                          compute_bf16=compute_bf16)

    h1 = _h_from(g1, c1)                                      # out1 [T, B, H]
    h1prev = jnp.concatenate([zero, h1[:-1]], axis=0)
    h2 = _h_from(g2, c2)
    h2prev = jnp.concatenate([zero, h2[:-1]], axis=0)
    f32 = jnp.float32
    dw1hh = jnp.einsum("tbg,tbh->gh", dxp1, h1prev,
                       preferred_element_type=f32)
    dw2v = jnp.einsum("tbg,tbh->gh", dxp2, h1,
                      preferred_element_type=f32)
    dw2hh = jnp.einsum("tbg,tbh->gh", dxp2, h2prev,
                       preferred_element_type=f32)
    return dxp1, dxp2, dw1hh, dw2v, dw2hh


s2vt_fused_out2.defvjp(_fused_fwd, _fused_bwd)


def s2vt_fused_infer(x1t, x2t, w1hh, w2v, w2hh, snap_idx: int,
                     compute_bf16: bool = True):
    """Inference helper: returns (out1 [T,B,H], out2 [T,B,H],
    (h1T, c1T), (h2T, c2T), (h2_snap, c2_snap) at word step snap_idx)."""
    g1, c1, g2, c2, h1T, c1T, h2T, c2T, h2s, c2s = _run_fwd(
        x1t, x2t, _assemble_wall(w1hh, w2v, w2hh), snap_idx=snap_idx,
        compute_bf16=compute_bf16)
    return _h_from(g1, c1), _h_from(g2, c2), (h1T, c1T), (h2T, c2T), (h2s, c2s)


def fused_shapes_ok(batch: int, dim_hid: int, dim_embed: int,
                    num_layers: int, rnn_type: str,
                    compute_dtype=None) -> bool:
    from s2vt_tpu.ops.pallas_rnn import pallas_shapes_ok
    itemsize = 2 if compute_dtype == jnp.bfloat16 else 4
    wall_bytes = itemsize * (2 * dim_hid) * (8 * dim_hid)
    return (num_layers == 1 and rnn_type == "lstm"
            and wall_bytes <= _WALL_BYTES_MAX
            and pallas_shapes_ok(batch, dim_hid))
