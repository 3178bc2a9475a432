"""Batched, fixed-shape, on-device beam search.

Replaces the reference's per-sentence PriorityQueue decoder
(/root/reference/S2VTModel.py:149-269) with a vectorized
``lax.while_loop``: beams live as a [B, W] tensor dimension, each round
expands every live beam over the vocabulary, applies the reference's
length-normalized score ``cum_logp / len^alpha`` (S2VTModel.py:261-269,
alpha=0.7), masks expansion to each node's top-``expand_k`` tokens
(S2VTModel.py:216 uses top-20), freezes finished (<eos>) beams with their
score (S2VTModel.py:203-205), and stops early when every beam is finished —
the vectorized equivalent of the reference's "queue <= beam_width" stop
(S2VTModel.py:227) — or at ``max_depth`` rounds (S2VTModel.py:186).

The search is generic over a ``step_fn`` so both S2VT and future models
reuse it: ``step_fn(states, last_tokens[N]) -> (new_states, logp[N, V])``
where all state leaves have leading dim N = B*W.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class BeamResult(NamedTuple):
    tokens: jax.Array   # [B, W, max_depth + 1] int32; position 0 is <sos>
    lengths: jax.Array  # [B, W] int32 — node length incl. <sos> (and <eos> if hit)
    scores: jax.Array   # [B, W] float32 length-normalized scores, sorted desc


def _topk_small(x: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k along axis 1 via k argmax passes.

    XLA lowers ``lax.top_k`` on TPU to a full variadic sort of the operand;
    for the beam's [B, W*V] candidate matrix that sort dominates the whole
    search (measured: the sort-based search ran at ~480 clips/s at B=256,
    V=10240 — ~17 ms per decode step). For tiny k, k passes of argmax+mask
    read the matrix k times instead, and select the same elements in the
    same order (argmax and top_k both break ties toward the lower index).

    Precondition: every entry of ``x`` must be strictly greater than -inf.
    Selected entries are masked with -inf (strictly below any input, NEG_INF
    included), so the k returned indices are distinct like ``lax.top_k``'s;
    a literal -inf input would tie with the mask sentinel and could be
    reported twice. Beam candidates satisfy this (dead slots use the finite
    NEG_INF, log-softmax outputs are finite for finite logits).
    """
    B, N = x.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    vals, idxs = [], []
    cur = x
    for _ in range(k):
        i = jnp.argmax(cur, axis=1).astype(jnp.int32)
        vals.append(jnp.take_along_axis(cur, i[:, None], axis=1)[:, 0])
        idxs.append(i)
        cur = jnp.where(cols == i[:, None], -jnp.inf, cur)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)


def _tile_states(states, width: int):
    def tile(x):
        B = x.shape[0]
        return jnp.broadcast_to(x[:, None], (B, width) + x.shape[1:]).reshape(
            (B * width,) + x.shape[1:])
    return jax.tree_util.tree_map(tile, states)


def _gather_states(states, parent: jax.Array):
    """parent: [B, W] indices into the old beam axis."""
    B, W = parent.shape

    def gather(x):
        xw = x.reshape((B, W) + x.shape[1:])
        idx = parent.reshape((B, W) + (1,) * (x.ndim - 1))
        return jnp.take_along_axis(xw, idx, axis=1).reshape(x.shape)
    return jax.tree_util.tree_map(gather, states)


def beam_search(step_fn: Callable, init_states, *, sos_ix: int, eos_ix: int,
                vocab_size: int, beam_width: int = 3, max_depth: int = 30,
                alpha: float = 0.7, expand_k: int = 20,
                score_mode: str = "cumulative") -> BeamResult:
    """score_mode:
      'cumulative' (default) — candidates ranked by the accumulated sequence
        log-prob, length-normalized: sum(logp) / len^alpha (the intended
        beam-search objective).
      'reference' — bit-faithful to the reference's scoring quirk: each
        BeamSearchNode is constructed with only the LAST step's token
        log-prob (S2VTModel.py:221-223 passes ``prob``, not ``n.logp+prob``),
        so nodes are ranked by last_token_logp / len^alpha.
    """
    leaves = jax.tree_util.tree_leaves(init_states)
    B = leaves[0].shape[0]
    W, V = beam_width, vocab_size
    expand_k = min(expand_k, V)

    states0 = _tile_states(init_states, W)
    tokens0 = jnp.full((B, W, max_depth + 1), sos_ix, jnp.int32)
    # Beam 0 carries the root; duplicates are suppressed with -inf so the
    # first expansion yields W *distinct* continuations of <sos>.
    cum0 = jnp.where(jnp.arange(W) == 0, 0.0, NEG_INF)[None, :].repeat(B, 0)
    length0 = jnp.ones((B, W), jnp.int32)
    finished0 = jnp.zeros((B, W), bool)
    score0 = jnp.zeros((B, W), jnp.float32)
    last0 = jnp.full((B, W), sos_ix, jnp.int32)

    def cond(carry):
        d, _, _, _, _, _, finished, _ = carry
        return jnp.logical_and(d < max_depth, ~jnp.all(finished))

    def _topk(x, k):
        # exact; iterative argmax below k=9, sort lowering only for wide k
        return _topk_small(x, k) if k <= 8 else jax.lax.top_k(x, k)

    def body(carry):
        d, states, tokens, last, cum, length, finished, score = carry
        new_states, logp = step_fn(states, last.reshape(B * W))
        logp = logp.reshape(B, W, V)

        # Per-node top-expand_k masking (reference expands only top-20,
        # S2VTModel.py:216). Whenever expand_k >= beam_width the mask is a
        # provable no-op on the search result: the global top-W keeps at
        # most W candidates per node, per-node candidate ranking is
        # monotone in logp (cum and len are constant within a node), and a
        # node's top-W by logp is a subset of its top-expand_k — so the
        # masked-out candidates can never be selected. Skipping it avoids
        # a full [B, W, V] sort per step (lax.top_k lowers to sort on TPU).
        if expand_k < W:
            kth = jax.lax.top_k(logp, expand_k)[0][..., -1:]
            logp = jnp.where(logp >= kth, logp, NEG_INF)

        # The same monotonicity means the global top-W lives inside the
        # per-node top-W BY LOGP — so scores/cums are only ever computed
        # for these W*W survivors, never materialized at [B, W, V]. The
        # only full-width passes per step are the W argmax sweeps of logp.
        logp_cand, tok_cand = _topk(logp.reshape(B * W, V), W)
        logp_cand = logp_cand.reshape(B, W, W)     # rank-ordered per node
        tok_cand = tok_cand.reshape(B, W, W).astype(jnp.int32)

        cum_cand = cum[..., None] + logp_cand                  # [B, W, W]
        cand_len = (length + 1).astype(jnp.float32)[..., None]
        if score_mode == "cumulative":
            basis = cum_cand
        else:
            # reference scoring uses only the step logp; dead root
            # duplicates (cum == -inf) must still be masked out explicitly.
            basis = jnp.where(cum_cand <= NEG_INF / 2, NEG_INF, logp_cand)
        cand_score = basis / jnp.power(cand_len, alpha)

        # Finished beams persist unchanged: a single frozen candidate at
        # rank 0 carrying <eos> and the frozen score, everything else -inf.
        rank0 = (jnp.arange(W) == 0)[None, None, :]
        fin = finished[..., None]
        cand_score = jnp.where(
            fin, jnp.where(rank0, score[..., None], NEG_INF), cand_score)
        cum_cand = jnp.where(fin, cum[..., None], cum_cand)
        tok_cand = jnp.where(fin, eos_ix, tok_cand)

        new_score, flat_idx = _topk(cand_score.reshape(B, W * W), W)
        parent = flat_idx // W
        token = jnp.take_along_axis(tok_cand.reshape(B, W * W), flat_idx,
                                    axis=1)
        new_cum = jnp.take_along_axis(cum_cand.reshape(B, W * W), flat_idx,
                                      axis=1)
        parent_fin = jnp.take_along_axis(finished, parent, axis=1)
        parent_len = jnp.take_along_axis(length, parent, axis=1)
        new_length = jnp.where(parent_fin, parent_len, parent_len + 1)
        new_finished = parent_fin | (token == eos_ix)

        tokens = jnp.take_along_axis(tokens, parent[..., None], axis=1)
        tokens = tokens.at[:, :, d + 1].set(
            jnp.where(parent_fin, eos_ix, token))
        states = _gather_states(new_states, parent)
        return (d + 1, states, tokens, token, new_cum, new_length,
                new_finished, new_score)

    carry = (jnp.int32(0), states0, tokens0, last0, cum0, length0,
             finished0, score0)
    _, _, tokens, _, cum, length, finished, score = jax.lax.while_loop(
        cond, body, carry)

    # Unfinished survivors keep their running normalized score, like the
    # reference's final nodes.get() over a queue that may hold live nodes.
    if score_mode == "cumulative":
        final_score = jnp.where(
            finished, score,
            cum / jnp.power(jnp.maximum(length, 1).astype(jnp.float32), alpha))
    else:
        final_score = score  # carried normalized last-step score
    order = jnp.argsort(-final_score, axis=1)
    return BeamResult(
        tokens=jnp.take_along_axis(tokens, order[..., None], axis=1),
        lengths=jnp.take_along_axis(length, order, axis=1),
        scores=jnp.take_along_axis(final_score, order, axis=1),
    )
