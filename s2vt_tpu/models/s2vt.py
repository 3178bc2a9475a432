"""S2VT: two-RNN encode-then-decode video captioner, TPU-native.

Semantics follow the reference implementation (/root/reference/S2VTModel.py:10-110,
"Sequence to Sequence — Video to Text", CVPR 2015) exactly, but the mechanics
are redesigned for XLA:

 - Teacher-forced training is TWO fused scans over the 2L-1 time axis with
   all input projections hoisted into big MXU matmuls (vs. the reference's
   two cuDNN LSTM calls, S2VTModel.py:67,77).
 - Greedy decode is a jitted ``lax.scan`` carrying (word_rnn state, current
   token) that re-feeds argmax embeddings — replacing the reference's L-2
   step Python loop with per-token ``.item()`` D2H syncs (S2VTModel.py:98-107).
 - Beam search is batched and fixed-shape on device (models/beam.py),
   replacing the per-sentence PriorityQueue (S2VTModel.py:149-269).

Stage layout (reference S2VTModel.py:63-81): video features are projected to
dim_hid, padded with L-1 zero-steps, and run through ``vid_rnn`` for 2L-1
steps. ``word_rnn`` sees [zero-embedding; vid_out] for the first L (encoding)
steps and [token embedding; vid_out] for the last L-1 (decoding) steps; only
the decoding-stage outputs are projected to the vocabulary.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from s2vt_tpu.models import beam as beam_mod
from s2vt_tpu.ops.layers import (TorchEmbedding, TorchLinear, apply_linear,
                                 dropout, mask_invalid_vocab)
from s2vt_tpu.ops.rnn import TorchRNN, multilayer_step


class S2VT(nn.Module):
    """Reference-compatible constructor signature (S2VTModel.py:11-12)."""

    vocab_size: int
    feat_dim: int
    length: int
    dim_hid: int = 500
    dim_embed: int = 500
    feat_dropout: float = 0.0
    rnn_dropout: float = 0.0
    out_dropout: float = 0.0
    num_layers: int = 1
    bidirectional: bool = False
    rnn_type: str = "lstm"
    sos_ix: int = 3
    eos_ix: int = 4
    compute_dtype: Any = None
    use_pallas: bool = False
    valid_vocab: Optional[int] = None  # real vocab size when vocab_size is
    #   padded (Opt.vocab_pad_multiple); decode masks the padding rows

    def setup(self):
        assert not self.bidirectional, "bidirectional S2VT is unsupported (as in the reference)"
        self.vid_rnn = TorchRNN(
            hidden_size=self.dim_hid, input_size=self.dim_hid,
            num_layers=self.num_layers, rnn_type=self.rnn_type,
            dropout=self.rnn_dropout, compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas, name="vid_rnn")
        self.word_rnn = TorchRNN(
            hidden_size=self.dim_hid, input_size=self.dim_hid + self.dim_embed,
            num_layers=self.num_layers, rnn_type=self.rnn_type,
            dropout=self.rnn_dropout, compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas, name="word_rnn")
        self.feat_linear = TorchLinear(self.dim_hid, self.feat_dim,
                                       compute_dtype=self.compute_dtype,
                                       name="feat_linear")
        self.out_linear = TorchLinear(self.vocab_size, self.dim_hid,
                                      compute_dtype=self.compute_dtype,
                                      name="out_linear")
        self.embedding = TorchEmbedding(self.vocab_size, self.dim_embed,
                                        name="embedding")

    # ------------------------------------------------------------------
    # shared encode
    # ------------------------------------------------------------------

    def _project_feats(self, feats, deterministic):
        """feat_drop -> feat_linear (S2VTModel.py:52-54)."""
        rng = (self.make_rng("dropout")
               if (self.feat_dropout > 0.0 and not deterministic) else None)
        feats = dropout(feats, self.feat_dropout, rng, deterministic)
        return self.feat_linear(feats)

    def _vid_pass(self, feats, deterministic):
        """vid_rnn over [feats; zeros(L-1)] — 2L-1 steps (S2VTModel.py:64-67)."""
        B = feats.shape[0]
        pad = jnp.zeros((B, self.length - 1, self.dim_hid), feats.dtype)
        pad_feats = jnp.concatenate([feats, pad], axis=1)
        output1, _ = self.vid_rnn(pad_feats, deterministic=deterministic)
        return output1

    # ------------------------------------------------------------------
    # modes
    # ------------------------------------------------------------------

    def __call__(self, feats, targets=None, mode: str = "train",
                 beam_width: int = 3, max_beam_depth: int = 30,
                 deterministic: Optional[bool] = None,
                 beam_score_mode: str = "cumulative",
                 early_stop: bool = False):
        """Dispatch like the reference forward (S2VTModel.py:39-61).

        mode='train' -> logits [B, L-1, V] (teacher forcing)
        mode='test'  -> greedy token ids [B, L-1]; early_stop=True exits
            when every row has emitted <eos> (serving extension)
        mode='beam_search' -> (tokens [B, W, D+1], lengths [B, W], scores [B, W])
        """
        if deterministic is None:
            deterministic = mode != "train"
        if mode == "train":
            return self.teacher_forced(feats, targets, deterministic)
        if mode == "test":
            return self.greedy(feats, early_stop=early_stop)
        if mode == "beam_search":
            return self.beam(feats, beam_width, max_beam_depth,
                             score_mode=beam_score_mode)
        raise ValueError(f"unknown mode {mode!r}")

    def _fused_ok(self, batch: int) -> bool:
        from s2vt_tpu.ops.pallas_s2vt import fused_shapes_ok
        return self.use_pallas and fused_shapes_ok(
            batch, self.dim_hid, self.dim_embed, self.num_layers,
            self.rnn_type, self.compute_dtype)

    def _fused_bf16(self) -> bool:
        return self.compute_dtype == jnp.bfloat16

    def _fused_inputs(self, feats_proj, pad_embed):
        """Assemble the fused kernel's pre-projected time-major inputs."""
        from s2vt_tpu.ops.rnn import input_projection
        B, L, H = feats_proj.shape
        vid_p = self.vid_rnn.layers[0]
        word_p = self.word_rnn.layers[0]
        pad = jnp.zeros((B, self.length - 1, H), feats_proj.dtype)
        pad_feats = jnp.concatenate([feats_proj, pad], axis=1)    # [B, T, H]
        x1 = input_projection(pad_feats, vid_p, self.compute_dtype)
        x1 = x1 + vid_p["b_hh"].astype(jnp.float32)
        E = self.dim_embed
        w2e_params = {"w_ih": word_p["w_ih"][:, :E],
                      "b_ih": word_p["b_ih"] + word_p["b_hh"]}
        x2 = input_projection(pad_embed, w2e_params, self.compute_dtype)
        w2v = word_p["w_ih"][:, E:]
        return (jnp.swapaxes(x1, 0, 1), jnp.swapaxes(x2, 0, 1),
                vid_p["w_hh"], w2v, word_p["w_hh"])

    def teacher_forced(self, feats, targets, deterministic=False):
        """Training pass: one fused 2L-1 scan per RNN (S2VTModel.py:69-81) —
        or, with ``use_pallas`` on aligned shapes, BOTH layers in one fused
        Pallas kernel (ops/pallas_s2vt.py).

        feats: [B, L, feat_dim]; targets: [B, L-1] token ids.
        Returns logits [B, L-1, vocab].
        """
        B = feats.shape[0]
        if self._fused_ok(B):
            return self._teacher_forced_fused(feats, targets, deterministic)
        feats = self._project_feats(feats, deterministic)
        output1 = self._vid_pass(feats, deterministic)            # [B, 2L-1, H]

        embed = self.embedding(targets)                           # [B, L-1, E]
        pad = jnp.zeros((B, self.length, self.dim_embed), embed.dtype)
        pad_embed = jnp.concatenate([pad, embed], axis=1)         # [B, 2L-1, E]
        input2 = jnp.concatenate([pad_embed, output1], axis=-1)   # [B, 2L-1, E+H]
        output2, _ = self.word_rnn(input2, deterministic=deterministic)

        result = output2[:, self.length:, :]                      # [B, L-1, H]
        rng = (self.make_rng("dropout")
               if (self.out_dropout > 0.0 and not deterministic) else None)
        result = dropout(result, self.out_dropout, rng, deterministic)
        return self.out_linear(result)

    def _teacher_forced_fused(self, feats, targets, deterministic):
        from s2vt_tpu.ops.pallas_s2vt import s2vt_fused_out2
        B = feats.shape[0]
        feats = self._project_feats(feats, deterministic)
        embed = self.embedding(targets)                           # [B, L-1, E]
        pad = jnp.zeros((B, self.length, self.dim_embed), embed.dtype)
        pad_embed = jnp.concatenate([pad, embed], axis=1)         # [B, 2L-1, E]
        x1t, x2t, w1hh, w2v, w2hh = self._fused_inputs(feats, pad_embed)
        out2 = s2vt_fused_out2(x1t, x2t, w1hh, w2v, w2hh,
                               self._fused_bf16())                # [T, B, H]
        result = jnp.swapaxes(out2, 0, 1)[:, self.length:, :]
        rng = (self.make_rng("dropout")
               if (self.out_dropout > 0.0 and not deterministic) else None)
        result = dropout(result, self.out_dropout, rng, deterministic)
        return self.out_linear(result)

    def greedy(self, feats, early_stop: bool = False):
        """Greedy decode as a fixed-shape on-device scan (vs S2VTModel.py:82-110).

        Encoding stage: word_rnn over [zeros; output1[:, :L]] yields state2.
        Decoding stage: scan over L-1 steps; step t consumes output1[:, L+t]
        and the embedding of the previous argmax (sos at t=0).
        Returns token ids [B, L-1] (int32).

        ``early_stop=True`` (a serving extension, OFF by default) swaps the
        scan for a fixed-shape ``while_loop`` that exits once every row has
        emitted ``<eos>``; remaining positions are filled with ``<eos>``.
        The reference (and the default here) always decodes all L-1 steps
        and its eval cuts each sentence at the first <eos> (eval.py:54-58),
        so the SENTENCES are identical — only post-<eos> filler differs,
        and typical captions finish in ~10 of 79 steps.
        """
        B = feats.shape[0]
        feats = self._project_feats(feats, True)
        if self._fused_ok(B):
            from s2vt_tpu.ops.pallas_s2vt import s2vt_fused_infer
            from s2vt_tpu.ops.rnn import LSTMState
            T = 2 * self.length - 1
            pad_embed = jnp.zeros((B, T, self.dim_embed), jnp.float32)
            x1t, x2t, w1hh, w2v, w2hh = self._fused_inputs(feats, pad_embed)
            out1, _, _, _, (h2s, c2s) = s2vt_fused_infer(
                x1t, x2t, w1hh, w2v, w2hh, snap_idx=self.length - 1,
                compute_bf16=self._fused_bf16())
            output1 = jnp.swapaxes(out1, 0, 1)                    # [B, T, H]
            states2 = [LSTMState(h2s, c2s)]
        else:
            output1 = self._vid_pass(feats, True)                 # [B, 2L-1, H]
            enc_pad = jnp.zeros((B, self.length, self.dim_embed), jnp.float32)
            input2 = jnp.concatenate([enc_pad, output1[:, :self.length, :]],
                                     axis=-1)
            _, states2 = self.word_rnn(input2, deterministic=True)

        emb_table = self.embedding.table()
        word_layers = self.word_rnn.layers
        out_w, out_b = self.out_linear.weight, self.out_linear.bias
        rnn_type, cdt = self.rnn_type, self.compute_dtype

        vid_tail = jnp.swapaxes(output1[:, self.length:, :], 0, 1)  # [L-1, B, H]
        sos = jnp.full((B,), self.sos_ix, jnp.int32)

        # NOTE: the out-projection + argmax stays on the XLA path on
        # purpose — XLA fuses the argmax reduce into the matmul epilogue
        # (no [B, V] HBM materialization), and the Pallas alternative
        # (ops/pallas_decode.py) measured SLOWER (38.9k vs 44.2k clips/s
        # at B=2048). Measured decision, like the conv kernel (README).
        def decode_one(states, word, vid_out_t):
            emb = jnp.take(emb_table, word, axis=0)               # [B, E]
            x = jnp.concatenate([emb, vid_out_t], axis=-1)        # [B, E+H]
            states, h = multilayer_step(states, x, word_layers, rnn_type, cdt)
            logits = apply_linear(h, out_w, out_b, cdt)           # [B, V]
            logits = mask_invalid_vocab(logits, self.valid_vocab)
            return states, jnp.argmax(logits, axis=-1).astype(jnp.int32)

        n_steps = self.length - 1
        if not early_stop:
            def step(carry, vid_out_t):
                states, word = carry
                states, word = decode_one(states, word, vid_out_t)
                return (states, word), word

            _, tokens = jax.lax.scan(step, (states2, sos), vid_tail)
            return jnp.swapaxes(tokens, 0, 1)                      # [B, L-1]

        eos = jnp.int32(self.eos_ix)
        tokens0 = jnp.full((n_steps, B), eos, jnp.int32)
        done0 = jnp.zeros((B,), bool)

        def cond(state):
            t, _, _, done, _ = state
            return jnp.logical_and(t < n_steps, ~jnp.all(done))

        def body(state):
            t, states, word, done, tokens = state
            states, word = decode_one(states, word, vid_tail[t])
            tokens = tokens.at[t].set(jnp.where(done, eos, word))
            done = jnp.logical_or(done, word == eos)
            return t + 1, states, word, done, tokens

        _, _, _, _, tokens = jax.lax.while_loop(
            cond, body, (jnp.int32(0), states2, sos, done0, tokens0))
        return jnp.swapaxes(tokens, 0, 1)                          # [B, L-1]

    def encode_for_beam(self, feats):
        """Beam-mode encoding (S2VTModel.py:56-60): vid_rnn over the RAW L
        steps (no zero padding — this differs from train/greedy!), then
        word_rnn over [zeros; output1] to get its encoding state."""
        B = feats.shape[0]
        feats = self._project_feats(feats, True)
        output1, states1 = self.vid_rnn(feats, deterministic=True)
        pad = jnp.zeros((B, self.length, self.dim_embed), jnp.float32)
        input2 = jnp.concatenate([pad, output1], axis=-1)
        _, states2 = self.word_rnn(input2, deterministic=True)
        return states1, states2

    def beam(self, feats, beam_width: int = 3, max_depth: int = 30,
             length_norm_alpha: float = 0.7, expand_k: int = 20,
             score_mode: str = "cumulative"):
        """Batched fixed-shape beam search (replaces S2VTModel.py:149-269)."""
        states1, states2 = self.encode_for_beam(feats)

        emb_table = self.embedding.table()
        vid_layers = self.vid_rnn.layers
        word_layers = self.word_rnn.layers
        out_w, out_b = self.out_linear.weight, self.out_linear.bias
        rnn_type, cdt = self.rnn_type, self.compute_dtype
        dim_hid = self.dim_hid

        def step_fn(states, word):
            """(states1, states2), word ids [N] -> new states, log-probs [N, V].

            Each decode step continues vid_rnn with a ZERO input
            (S2VTModel.py:208-210) and feeds [embed(word); vid_out] to word_rnn.
            """
            st1, st2 = states
            N = word.shape[0]
            zero_in = jnp.zeros((N, dim_hid), jnp.float32)
            st1, vid_out = multilayer_step(st1, zero_in, vid_layers, rnn_type, cdt)
            emb = jnp.take(emb_table, word, axis=0)
            x = jnp.concatenate([emb, vid_out], axis=-1)
            st2, h = multilayer_step(st2, x, word_layers, rnn_type, cdt)
            logits = apply_linear(h, out_w, out_b, cdt)
            logits = mask_invalid_vocab(logits, self.valid_vocab)
            return (st1, st2), jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        return beam_mod.beam_search(
            step_fn, (states1, states2),
            sos_ix=self.sos_ix, eos_ix=self.eos_ix,
            vocab_size=self.vocab_size, beam_width=beam_width,
            max_depth=max_depth, alpha=length_norm_alpha, expand_k=expand_k,
            score_mode=score_mode)
