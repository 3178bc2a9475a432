"""Torch-semantics-compatible recurrent cells, TPU-first.

The reference models are built on ``nn.LSTM``/``nn.GRU``
(/root/reference/S2VTModel.py:15-22, attention_baseline.py:23-24). For
greedy-decode token-for-token parity (BASELINE.json) we must reproduce
PyTorch's exact cell math:

LSTM (gate order i, f, g, o; both biases added):
    gates = x @ W_ih^T + b_ih + h @ W_hh^T + b_hh
    i, f, o = sigmoid;  g = tanh
    c' = f*c + i*g ;  h' = o * tanh(c')

GRU (gate order r, z, n; reset gate applied to the *hidden projection*):
    gi = x @ W_ih^T + b_ih ;  gh = h @ W_hh^T + b_hh
    r = sigmoid(gi_r + gh_r) ; z = sigmoid(gi_z + gh_z)
    n = tanh(gi_n + r * gh_n) ;  h' = (1-z)*n + z*h

TPU design notes (NOT a translation of the reference):
 - The input projection ``x @ W_ih^T`` for the whole sequence is hoisted out
   of the recurrence into ONE big [B*T, in] x [in, 4H] matmul that XLA tiles
   onto the MXU; the ``lax.scan`` carries only (h, c) and performs the single
   unavoidable sequential [B, H] x [H, 4H] matmul per step.
 - Static shapes throughout; time is a ``lax.scan`` axis, never a Python loop.
 - ``compute_dtype=bfloat16`` casts matmul operands to bf16 while keeping the
   carried state and gate math in float32 (MXU-native mixed precision).

Weights follow the torch layout (W_ih: [gates*H, in], W_hh: [gates*H, H],
b_ih/b_hh: [gates*H]) so reference checkpoints can be imported directly.
Initialization matches torch's U(-1/sqrt(H), 1/sqrt(H)) for all RNN params.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class LSTMState(NamedTuple):
    h: jax.Array  # [B, H]
    c: jax.Array  # [B, H]  (zeros and unused for GRU)


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_lstm_params(key: jax.Array, input_size: int, hidden_size: int,
                     dtype=jnp.float32) -> dict:
    """Torch-layout LSTM params, torch default init U(-k, k), k=1/sqrt(H)."""
    k = 1.0 / math.sqrt(hidden_size)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "w_ih": _uniform(k1, (4 * hidden_size, input_size), k, dtype),
        "w_hh": _uniform(k2, (4 * hidden_size, hidden_size), k, dtype),
        "b_ih": _uniform(k3, (4 * hidden_size,), k, dtype),
        "b_hh": _uniform(k4, (4 * hidden_size,), k, dtype),
    }


def init_gru_params(key: jax.Array, input_size: int, hidden_size: int,
                    dtype=jnp.float32) -> dict:
    k = 1.0 / math.sqrt(hidden_size)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "w_ih": _uniform(k1, (3 * hidden_size, input_size), k, dtype),
        "w_hh": _uniform(k2, (3 * hidden_size, hidden_size), k, dtype),
        "b_ih": _uniform(k3, (3 * hidden_size,), k, dtype),
        "b_hh": _uniform(k4, (3 * hidden_size,), k, dtype),
    }


def input_projection(xs: jax.Array, params: dict, compute_dtype=None) -> jax.Array:
    """Hoisted input projection for a whole sequence.

    xs: [B, T, in] (or [B, in]) -> [B, T, gates*H]: one MXU-friendly matmul.
    """
    w = params["w_ih"]
    if compute_dtype is not None:
        xs = xs.astype(compute_dtype)
        w = w.astype(compute_dtype)
    proj = jax.lax.dot_general(
        xs, w,
        dimension_numbers=(((xs.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return proj + params["b_ih"].astype(jnp.float32)


def _hidden_projection(h: jax.Array, params: dict, compute_dtype=None) -> jax.Array:
    w = params["w_hh"]
    hh = h
    if compute_dtype is not None:
        hh = hh.astype(compute_dtype)
        w = w.astype(compute_dtype)
    proj = jax.lax.dot_general(
        hh, w,
        dimension_numbers=(((hh.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return proj + params["b_hh"].astype(jnp.float32)


def lstm_step(state: LSTMState, x_proj: jax.Array, params: dict,
              compute_dtype=None) -> Tuple[LSTMState, jax.Array]:
    """One LSTM step given the precomputed input projection x_proj [B, 4H]."""
    h, c = state
    gates = x_proj + _hidden_projection(h, params, compute_dtype)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return LSTMState(h_new, c_new), h_new


def gru_step(state: LSTMState, x_proj: jax.Array, params: dict,
             compute_dtype=None) -> Tuple[LSTMState, jax.Array]:
    """One GRU step. state.c is carried untouched (torch GRU has no cell)."""
    h = state.h
    gh = _hidden_projection(h, params, compute_dtype)
    gi_r, gi_z, gi_n = jnp.split(x_proj, 3, axis=-1)
    gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(gi_r + gh_r)
    z = jax.nn.sigmoid(gi_z + gh_z)
    n = jnp.tanh(gi_n + r * gh_n)
    h_new = (1.0 - z) * n + z * h
    return LSTMState(h_new, state.c), h_new


_STEP_FNS = {"lstm": lstm_step, "gru": gru_step}


def rnn_sequence(xs: jax.Array, params: dict, h0: Optional[LSTMState] = None,
                 rnn_type: str = "lstm", reverse: bool = False,
                 compute_dtype=None) -> Tuple[jax.Array, LSTMState]:
    """Run one RNN direction over a full sequence.

    xs: [B, T, in]. Returns (outputs [B, T, H], final LSTMState).
    Replaces the reference's cuDNN LSTM call (S2VTModel.py:67,77) with a
    ``lax.scan`` whose input projection is hoisted into a single matmul.
    """
    B, T, _ = xs.shape
    H = params["w_hh"].shape[1]
    step_fn = _STEP_FNS[rnn_type]
    if h0 is None:
        zeros = jnp.zeros((B, H), dtype=jnp.float32)
        h0 = LSTMState(zeros, zeros)

    x_proj = input_projection(xs, params, compute_dtype)      # [B, T, gates*H]
    x_proj_t = jnp.swapaxes(x_proj, 0, 1)                     # [T, B, gates*H]

    def body(state, xp):
        return step_fn(state, xp, params, compute_dtype)

    final_state, outs = jax.lax.scan(body, h0, x_proj_t, reverse=reverse)
    return jnp.swapaxes(outs, 0, 1), final_state


def multilayer_rnn(xs: jax.Array, layer_params: Sequence[dict],
                   h0: Optional[Sequence] = None, rnn_type: str = "lstm",
                   bidirectional: bool = False, dropout_rate: float = 0.0,
                   dropout_rng: Optional[jax.Array] = None, deterministic: bool = True,
                   compute_dtype=None) -> Tuple[jax.Array, list]:
    """Stacked (optionally bidirectional) RNN, torch ``nn.LSTM`` semantics.

    layer_params: for unidirectional, [l0, l1, ...]; for bidirectional,
    [(l0_fwd, l0_bwd), ...]. Inter-layer dropout only (torch applies dropout
    to all but the last layer's output, matching rnn_dropout in
    S2VTModel.py:19-22).
    Returns (outputs [B, T, H*dirs], list of final states per layer).
    """
    out = xs
    finals = []
    n_layers = len(layer_params)
    for li, lp in enumerate(layer_params):
        init = h0[li] if h0 is not None else None
        if bidirectional:
            fwd_p, bwd_p = lp
            init_f, init_b = (init if init is not None else (None, None))
            out_f, fin_f = rnn_sequence(out, fwd_p, init_f, rnn_type, False, compute_dtype)
            out_b, fin_b = rnn_sequence(out, bwd_p, init_b, rnn_type, True, compute_dtype)
            out = jnp.concatenate([out_f, out_b], axis=-1)
            finals.append((fin_f, fin_b))
        else:
            out, fin = rnn_sequence(out, lp, init, rnn_type, False, compute_dtype)
            finals.append(fin)
        if dropout_rate > 0.0 and not deterministic and li < n_layers - 1:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, out.shape)
            out = jnp.where(keep, out / (1.0 - dropout_rate), 0.0)
    return out, finals


def multilayer_step(states: Sequence[LSTMState], x: jax.Array,
                    layer_params: Sequence[dict], rnn_type: str = "lstm",
                    compute_dtype=None) -> Tuple[list, jax.Array]:
    """One step of a stacked unidirectional RNN. x: [B, in] -> [B, H].

    Pure function of closed-over param arrays — safe inside ``lax.scan``
    bodies (decode loops, beam search).
    """
    step_fn = _STEP_FNS[rnn_type]
    new_states = []
    out = x
    for params, st in zip(layer_params, states):
        x_proj = input_projection(out, params, compute_dtype)
        st2, out = step_fn(st, x_proj, params, compute_dtype)
        new_states.append(st2)
    return new_states, out


def zero_state(batch: int, hidden: int, num_layers: int = 1,
               bidirectional: bool = False):
    z = jnp.zeros((batch, hidden), dtype=jnp.float32)
    one = LSTMState(z, z)
    if bidirectional:
        return [(one, one) for _ in range(num_layers)]
    return [one for _ in range(num_layers)]


class TorchRNN(nn.Module):
    """Flax wrapper owning torch-layout RNN params.

    Param tree: ``l{i}`` (and ``l{i}_reverse`` when bidirectional), each a
    dict of w_ih/w_hh/b_ih/b_hh — a direct mirror of torch's
    ``weight_ih_l{i}`` etc., so importing reference checkpoints is a rename.

    Setup-style so parent modules (decode loops) can read ``self.layers``
    param arrays directly and close over them inside ``lax.scan``.
    """

    hidden_size: int
    input_size: int
    num_layers: int = 1
    bidirectional: bool = False
    rnn_type: str = "lstm"
    dropout: float = 0.0
    compute_dtype: Any = None
    use_pallas: bool = False  # fused Pallas sequence kernel (LSTM/GRU,
    #   forward direction only)

    def setup(self):
        init_fn = init_lstm_params if self.rnn_type == "lstm" else init_gru_params
        dirs = 2 if self.bidirectional else 1
        layers = []
        for li in range(self.num_layers):
            in_size = self.input_size if li == 0 else self.hidden_size * dirs

            def make(name, in_size=in_size):
                return self.param(name, lambda k: init_fn(k, in_size, self.hidden_size))

            if self.bidirectional:
                layers.append((make(f"l{li}"), make(f"l{li}_reverse")))
            else:
                layers.append(make(f"l{li}"))
        self.layers = tuple(layers)

    def __call__(self, xs, h0=None, deterministic: bool = True):
        rng = (self.make_rng("dropout")
               if (self.dropout > 0.0 and not deterministic) else None)
        # Fall back to the scan path for tiny/misaligned dims (Mosaic
        # compiles of sub-tile blocks are slow-to-pathological on real
        # chips) and for large batches — see pallas_shapes_ok.
        from s2vt_tpu.ops.pallas_rnn import pallas_shapes_ok
        if (self.use_pallas and pallas_shapes_ok(xs.shape[0], self.hidden_size)
                and self.rnn_type in ("lstm", "gru")):
            if self.rnn_type == "lstm":
                from s2vt_tpu.ops.pallas_rnn import \
                    lstm_sequence_pallas as seq_pallas
            else:
                from s2vt_tpu.ops.pallas_gru import \
                    gru_sequence_pallas as seq_pallas

            def run_reverse(x, lp, init):
                # The kernel is forward-only; reverse direction = flip the
                # time axis around it (identical math to scan reverse=True).
                o, fin = seq_pallas(jnp.flip(x, axis=1), lp, init,
                                    self.compute_dtype)
                return jnp.flip(o, axis=1), fin

            out, finals = xs, []
            for li, lp in enumerate(self.layers):
                init = h0[li] if h0 is not None else None
                if self.bidirectional:
                    fwd_p, bwd_p = lp
                    init_f, init_b = (init if init is not None
                                      else (None, None))
                    out_f, fin_f = seq_pallas(out, fwd_p, init_f,
                                              self.compute_dtype)
                    out_b, fin_b = run_reverse(out, bwd_p, init_b)
                    out = jnp.concatenate([out_f, out_b], axis=-1)
                    finals.append((fin_f, fin_b))
                else:
                    out, fin = seq_pallas(out, lp, init, self.compute_dtype)
                    finals.append(fin)
                if (self.dropout > 0.0 and not deterministic
                        and li < self.num_layers - 1):
                    rng, sub = jax.random.split(rng)
                    keep = jax.random.bernoulli(sub, 1.0 - self.dropout,
                                                out.shape)
                    out = jnp.where(keep, out / (1.0 - self.dropout), 0.0)
            return out, finals
        return multilayer_rnn(
            xs, self.layers, h0, self.rnn_type, self.bidirectional,
            self.dropout, rng, deterministic, self.compute_dtype)

    def step(self, states, x: jax.Array):
        """One stacked step for decode loops. x: [B, in]; states: list per layer."""
        assert not self.bidirectional, "decode stepping is unidirectional"
        return multilayer_step(states, x, self.layers, self.rnn_type,
                               self.compute_dtype)

    def zero_state(self, batch: int):
        return zero_state(batch, self.hidden_size, self.num_layers,
                          self.bidirectional)
