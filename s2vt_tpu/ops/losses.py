"""Sequence losses.

The reference's ``MaskCriterion`` (/root/reference/utils.py:6-26) *intends*
masked-mean cross-entropy but constructs ``nn.CrossEntropyLoss()`` with the
default ``reduction='mean'`` — the returned scalar times the mask, summed and
divided by ``mask.sum()``, cancels algebraically, so the model that produced
the published METEOR 30.1 was actually trained with plain mean CE including
pad positions. Both semantics are provided:

 - :func:`masked_cross_entropy` — the intended masked-mean CE (default).
 - :func:`reference_mean_cross_entropy` — bit-faithful to the reference bug.

Shapes follow train.py:120-122: logits [B, L-1, V] predicted from
targets[:, :-1]; the loss compares against targets[:, 1:] / mask[:, 1:].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _token_nll(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Per-token negative log-likelihood. logits [..., V], targets [...]."""
    logz = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
    gold = jnp.take_along_axis(
        logits.astype(jnp.float32), targets[..., None], axis=-1
    ).squeeze(-1)
    return logz - gold


def masked_cross_entropy(logits: jax.Array, targets: jax.Array,
                         mask: jax.Array) -> jax.Array:
    """Masked-mean CE — the *intended* semantics of MaskCriterion.

    logits: [B, L-1, V]; targets: [B, L]; mask: [B, L] (float 0/1).
    Targets/mask are shifted by one exactly as utils.py:19 does.
    """
    tgt = targets[:, 1:]
    msk = mask[:, 1:].astype(jnp.float32)
    nll = _token_nll(logits, tgt)
    return jnp.sum(nll * msk) / jnp.maximum(jnp.sum(msk), 1.0)


def reference_mean_cross_entropy(logits: jax.Array, targets: jax.Array,
                                 mask: jax.Array) -> jax.Array:
    """The reference's effective loss: plain mean CE over ALL positions
    (pads included) — what utils.py:11-26 actually computes after the
    reduction='mean' bug cancels the mask."""
    del mask
    tgt = targets[:, 1:]
    nll = _token_nll(logits, tgt)
    return jnp.mean(nll)
