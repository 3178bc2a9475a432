"""Benchmark harness: MSVD-scale S2VT caption decode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.md constants): S2VT with feat_dim=4096, L=80 (2L-1=159 RNN
steps), dim_hid=dim_embed=512, vocab 10240 (~MSVD vocab padded to an
MXU-friendly multiple of 128), greedy decode (the reference eval.py:30-60
path). Ours runs jitted on the chip with bfloat16 matmuls; the baseline is
the reference's architecture driven the reference's way (per-step Python
loop over torch LSTM cells, argmax re-fed) measured on this host's CPU —
the reference is CUDA/CPU PyTorch (train.py:16) and no GPU exists here.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

VOCAB, FEAT, L, H, E = 10240, 4096, 80, 512, 512
SOS = 3


def bench_jax(batch: int, iters: int) -> float:
    """Times ``iters`` decodes inside ONE jitted ``lax.scan`` (each iteration
    perturbs the features so no two executions are identical, and the result
    feeds the next salt so nothing can be elided), synced once at the end.
    This measures pure device throughput, excluding host/tunnel RPC latency."""
    import jax
    import jax.numpy as jnp

    from s2vt_tpu.models.s2vt import S2VT

    model = S2VT(vocab_size=VOCAB, feat_dim=FEAT, length=L, dim_hid=H,
                 dim_embed=E, sos_ix=SOS, eos_ix=4,
                 compute_dtype=jnp.bfloat16, use_pallas=True)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(batch, L, FEAT)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), feats, mode="test")["params"]

    from functools import partial

    @partial(jax.jit, static_argnums=3)
    def decode_many(params, feats, salt0, n):
        def body(salt, _):
            toks = model.apply({"params": params}, feats + salt, mode="test")
            return jnp.sum(toks).astype(jnp.float32) * 1e-9, jnp.sum(toks)
        _, sums = jax.lax.scan(body, salt0, None, length=n)
        return sums

    _ = np.asarray(decode_many(params, feats, jnp.float32(0.0), iters))  # compile
    t0 = time.perf_counter()
    _ = np.asarray(decode_many(params, feats, jnp.float32(1e-5), iters))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_torch_reference(batch: int, iters: int) -> float:
    """Reference-style greedy decode: torch LSTMs, per-step Python loop
    re-feeding argmax embeddings (S2VTModel.py:82-110 semantics)."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(0)
    with torch.no_grad():
        vid_rnn = tnn.LSTM(H, H, batch_first=True)
        word_rnn = tnn.LSTM(H + E, H, batch_first=True)
        feat_linear = tnn.Linear(FEAT, H)
        out_linear = tnn.Linear(H, VOCAB)
        embedding = tnn.Embedding(VOCAB, E)
        feats = torch.randn(batch, L, FEAT)

        def decode():
            h = feat_linear(feats)
            pad_feats = torch.cat([h, torch.zeros(batch, L - 1, H)], dim=1)
            out1, _ = vid_rnn(pad_feats)
            enc_in = torch.cat([torch.zeros(batch, L, E), out1[:, :L, :]], dim=2)
            _, st2 = word_rnn(enc_in)
            word = torch.full((batch,), SOS, dtype=torch.long)
            preds = []
            for t in range(L - 1):
                x = torch.cat([embedding(word).unsqueeze(1),
                               out1[:, L + t, :].unsqueeze(1)], dim=2)
                o, st2 = word_rnn(x, st2)
                word = out_linear(o.squeeze(1)).argmax(dim=1)
                preds.append(word)
            return torch.stack(preds, dim=1)

        decode()  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            decode()
        dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    ap = argparse.ArgumentParser()
    # Throughput-serving batch: decode is sequential-latency-bound per
    # step, so large batches amortize it (64 -> 12.4k clips/s; 1024 ->
    # ~32k; 2048 -> ~40k on one v5e). 1024 keeps batch latency ~32ms.
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--baseline-batch", type=int, default=10)  # eval.py:27
    ap.add_argument("--baseline-iters", type=int, default=3)
    ap.add_argument("--skip-baseline", action="store_true")
    args = ap.parse_args()

    ours = bench_jax(args.batch, args.iters)
    if args.skip_baseline:
        baseline = None
        vs = None
    else:
        baseline = bench_torch_reference(args.baseline_batch, args.baseline_iters)
        vs = ours / baseline
    print(json.dumps({
        "metric": "s2vt_greedy_decode_clips_per_sec_chip",
        "value": round(ours, 2),
        "unit": "clips/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
