"""Torch-initialization-compatible dense / embedding layers.

The reference's trainable non-RNN layers are ``nn.Linear`` and
``nn.Embedding`` (S2VTModel.py:26-28, attention_baseline.py:25-33). To match
its training dynamics we reproduce torch's default initializers:

 - Linear: weight ~ kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), ·);
           bias ~ U(-1/sqrt(fan_in), ·). Weight stored torch-layout [out, in].
 - Embedding: N(0, 1); optional ``padding_idx`` zeroes that row at init and
   detaches its gradient (attention_baseline.py:27 uses padding_idx=0).

Setup-style modules so decode loops (lax.scan bodies) can close over the raw
param arrays (``self.weight``) instead of re-entering module scopes.
"""

from __future__ import annotations

NEG_INF = -1e30


def mask_invalid_vocab(logits, valid_vocab):
    """Mask MXU-padding vocab rows out of decode-time logits. The vocab is
    padded up to a multiple (Opt.vocab_pad_multiple) for tile-friendly
    shapes and tensor-parallel sharding; padded indices never appear in
    captions, but an untrained/warm model could still argmax into them."""
    if valid_vocab is None or valid_vocab >= logits.shape[-1]:
        return logits
    import jax.numpy as _jnp
    mask = _jnp.arange(logits.shape[-1]) < valid_vocab
    return _jnp.where(mask, logits, NEG_INF)

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class TorchLinear(nn.Module):
    """y = x @ W^T + b with torch layout/init."""

    out_features: int
    in_features: int
    use_bias: bool = True
    compute_dtype: Any = None

    def setup(self):
        bound = 1.0 / math.sqrt(self.in_features)
        self.weight = self.param(
            "weight",
            lambda k: jax.random.uniform(
                k, (self.out_features, self.in_features), jnp.float32, -bound, bound))
        if self.use_bias:
            self.bias = self.param(
                "bias",
                lambda k: jax.random.uniform(
                    k, (self.out_features,), jnp.float32, -bound, bound))

    def __call__(self, x):
        return apply_linear(x, self.weight,
                            self.bias if self.use_bias else None,
                            self.compute_dtype)


def apply_linear(x: jax.Array, weight: jax.Array, bias: Optional[jax.Array],
                 compute_dtype: Any = None) -> jax.Array:
    """Functional torch-layout linear, usable inside scan bodies."""
    xx, ww = x, weight
    if compute_dtype is not None:
        xx = xx.astype(compute_dtype)
        ww = ww.astype(compute_dtype)
    y = jax.lax.dot_general(
        xx, ww,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias
    return y


class TorchEmbedding(nn.Module):
    """Lookup table with torch N(0,1) init and padding_idx semantics."""

    num_embeddings: int
    features: int
    padding_idx: Optional[int] = None

    def setup(self):
        def init(k):
            w = jax.random.normal(k, (self.num_embeddings, self.features), jnp.float32)
            if self.padding_idx is not None:
                w = w.at[self.padding_idx].set(0.0)
            return w

        self.weight = self.param("weight", init)

    def table(self) -> jax.Array:
        """The (gradient-masked) lookup table, for use in scan bodies."""
        table = self.weight
        if self.padding_idx is not None:
            # Detach the padding row's gradient, like torch's padding_idx.
            frozen_row = jax.lax.stop_gradient(table[self.padding_idx])
            table = table.at[self.padding_idx].set(frozen_row)
        return table

    def __call__(self, ids):
        return jnp.take(self.table(), ids, axis=0)


def dropout(x: jax.Array, rate: float, rng: Optional[jax.Array],
            deterministic: bool) -> jax.Array:
    """Inverted dropout matching torch nn.Dropout semantics."""
    if deterministic or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
