"""Beam-search parity vs a faithful Python reimplementation of the
reference's PriorityQueue decoder (S2VTModel.py:149-274).

The oracle mirrors the reference algorithm EXACTLY, including its quirks:
 - each node is scored by only the LAST step's token log-prob normalized by
   length^0.7 (S2VTModel.py:221-223 passes ``prob``, not the accumulated
   logp) — our ``score_mode='reference'``;
 - top-20 expansion per live node, rounds capped by max_depth, stop when
   the queue holds <= beam_width nodes, final answer = best node in queue.

Both sides share the same jitted step function, so any mismatch is in the
search control flow, not the model math.
"""

import heapq
import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2vt_tpu.models import beam as beam_mod


class _Node:
    __slots__ = ("state", "prev", "word", "logp", "leng")

    def __init__(self, state, prev, word, logp, leng):
        self.state = state
        self.prev = prev
        self.word = word
        self.logp = logp  # LAST step's logp only (reference quirk)
        self.leng = leng

    def eval(self, alpha=0.7):
        return self.logp / pow(float(self.leng), alpha)


def reference_beam(step_fn, init_state, sos_ix, eos_ix, beam_width=3,
                   max_depth=8, expand_k=20):
    """Single-sentence PriorityQueue beam, the reference control flow."""
    counter = itertools.count()  # tie-break like PriorityQueue insertion
    root = _Node(init_state, None, sos_ix, 0.0, 1)
    queue = [(-root.eval(), next(counter), root)]
    depth = 0
    while depth < max_depth:
        depth += 1
        beam_nodes = [heapq.heappop(queue)
                      for _ in range(min(beam_width, len(queue)))]
        queue = []
        for score, cnt, n in beam_nodes:
            if n.word == eos_ix and n.prev is not None:
                heapq.heappush(queue, (score, cnt, n))
                continue
            new_state, logp = step_fn(n.state, n.word)
            logp = np.asarray(logp)
            top = np.argsort(-logp)[:expand_k]
            for i in top:
                child = _Node(new_state, n, int(i), float(logp[i]), n.leng + 1)
                heapq.heappush(queue, (-child.eval(), next(counter), child))
        if len(queue) <= beam_width:
            break
    _, _, best = heapq.heappop(queue)
    sent = [best.word]
    while best.prev is not None:
        best = best.prev
        sent.append(best.word)
    return sent[::-1]


def _random_step_fn(key, vocab, hid):
    """A tiny random 'language model': state is [N, hid]; the next-token
    distribution depends on the state and last word."""
    k1, k2, k3 = jax.random.split(key, 3)
    W = jax.random.normal(k1, (hid, hid)) * 0.8
    E = jax.random.normal(k2, (vocab, hid)) * 0.8
    O = jax.random.normal(k3, (hid, vocab))

    @jax.jit
    def step(state, words):
        words = jnp.atleast_1d(jnp.asarray(words, jnp.int32))
        st = jnp.atleast_2d(state)
        new = jnp.tanh(st @ W + E[words])
        logits = new @ O
        return new, jax.nn.log_softmax(logits, axis=-1)

    def oracle_step(state, word):
        new, logp = step(state, jnp.asarray([word]))
        return new[0], logp[0]

    return step, oracle_step


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_reference_mode_matches_oracle(seed):
    vocab, hid, W_, D = 17, 6, 3, 8
    key = jax.random.PRNGKey(seed)
    step, oracle_step = _random_step_fn(key, vocab, hid)
    sos_ix, eos_ix = 3, 4

    n_sentences = 3
    init = jax.random.normal(jax.random.fold_in(key, 99), (n_sentences, hid))

    def batched_step(states, words):
        return step(states, words)

    res = beam_mod.beam_search(
        batched_step, init, sos_ix=sos_ix, eos_ix=eos_ix, vocab_size=vocab,
        beam_width=W_, max_depth=D, alpha=0.7, expand_k=vocab,
        score_mode="reference")
    toks = np.asarray(res.tokens)
    lens = np.asarray(res.lengths)

    for b in range(n_sentences):
        want = reference_beam(oracle_step, init[b], sos_ix, eos_ix,
                              beam_width=W_, max_depth=D, expand_k=vocab)
        got = toks[b, 0, :lens[b, 0]].tolist()
        assert got == want, f"sentence {b}: {got} != {want}"


def test_cumulative_mode_prefers_total_logp():
    """With cumulative scoring the chosen beam maximizes sum(logp)/len^a —
    check the returned top score dominates the other beams."""
    vocab, hid = 11, 5
    step, _ = _random_step_fn(jax.random.PRNGKey(7), vocab, hid)
    init = jax.random.normal(jax.random.PRNGKey(8), (2, hid))
    res = beam_mod.beam_search(step, init, sos_ix=3, eos_ix=4,
                               vocab_size=vocab, beam_width=4, max_depth=6,
                               expand_k=vocab, score_mode="cumulative")
    scores = np.asarray(res.scores)
    assert (scores[:, 0:1] >= scores - 1e-6).all()


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_reference_mode_with_likely_eos(seed):
    """Bias the model toward <eos> so finished-beam freezing, the
    'queue <= width' early stop, and final selection over mixed
    finished/live nodes are all exercised against the oracle."""
    vocab, hid, W_, D = 13, 6, 3, 10
    key = jax.random.PRNGKey(seed)
    step, oracle_step = _random_step_fn(key, vocab, hid)
    sos_ix, eos_ix = 3, 4

    def bias(fn):
        def wrapped(state, words):
            new, logp = fn(state, words)
            boost = jnp.zeros((vocab,)).at[eos_ix].set(2.5)
            logits = logp + boost
            return new, jax.nn.log_softmax(logits, axis=-1)
        return wrapped

    b_step = bias(step)

    def b_oracle(state, word):
        new, logp = b_step(state, jnp.asarray([word]))
        return new[0], logp[0]

    init = jax.random.normal(jax.random.fold_in(key, 5), (2, hid))
    res = beam_mod.beam_search(
        b_step, init, sos_ix=sos_ix, eos_ix=eos_ix, vocab_size=vocab,
        beam_width=W_, max_depth=D, expand_k=vocab, score_mode="reference")
    toks = np.asarray(res.tokens)
    lens = np.asarray(res.lengths)
    for b in range(2):
        want = reference_beam(b_oracle, init[b], sos_ix, eos_ix,
                              beam_width=W_, max_depth=D, expand_k=vocab)
        got = toks[b, 0, :lens[b, 0]].tolist()
        assert got == want, f"sentence {b}: {got} != {want}"
        assert want[-1] == eos_ix or len(want) == D + 1


@pytest.mark.parametrize("seed", range(4))
def test_topk_small_equals_lax_topk(seed):
    """_topk_small must select the same values AND indices as lax.top_k,
    including tie-breaking toward the lower index."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((5, 37)).astype(np.float32)
    # engineered ties: duplicate some columns and pin a few exact repeats
    x[:, 10] = x[:, 3]
    x[:, 20] = x[:, 3]
    x[0, :] = 1.0  # a fully tied row
    for k in (1, 3, 8):
        want_v, want_i = jax.lax.top_k(jnp.asarray(x), k)
        got_v, got_i = beam_mod._topk_small(jnp.asarray(x), k)
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_beam_supports_gru():
    """Capability extension over the reference: its beam_search asserts
    LSTM-only (S2VTModel.py:153); ours is generic over the cell — a GRU
    S2VT beam-decodes with sane, sorted, finite scores."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from s2vt_tpu.models import S2VT

    model = S2VT(vocab_size=64, feat_dim=12, length=8, dim_hid=16,
                 dim_embed=16, rnn_type="gru", sos_ix=3, eos_ix=4)
    feats = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 12))
    params = model.init(jax.random.PRNGKey(1), feats, mode="test")["params"]
    res = model.apply({"params": params}, feats, mode="beam_search",
                      beam_width=3, max_beam_depth=6)
    toks = np.asarray(res.tokens)
    scores = np.asarray(res.scores)
    assert toks.shape == (3, 3, 7) and (toks[:, :, 0] == 3).all()
    assert np.isfinite(scores).all()
    assert (np.diff(scores, axis=1) <= 1e-6).all()   # sorted desc
