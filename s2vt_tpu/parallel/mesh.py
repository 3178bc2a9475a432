"""Device mesh + sharding layout for data/tensor parallel training.

The reference is strictly single-device (SURVEY.md §2: no DDP/NCCL/MPI
anywhere; extract_features.py:155 even says "don't support multi GPU"), so
parallelism here is NEW first-class design, not a port:

 - axis ``data``: batch (data-parallel) — gradients all-reduce over ICI via
   XLA's ``psum``, inserted automatically by sharding propagation under jit.
 - axis ``model``: the vocabulary dimension of the embedding table, output
   projection and its bias — the only weights that grow with corpus size
   (MSR-VTT-scale vocab). Logits [B, L-1, V] come out vocab-sharded; the
   loss's log-sum-exp over V becomes an ICI all-reduce XLA schedules itself.

Everything else (RNN weights, attention projections) is replicated: at
dim_hid=512 they are far below the ICI-communication break-even for TP.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Param-tree leaves sharded along the vocab dimension on the model axis:
# (module name, leaf name) -> which dim is vocab.
_VOCAB_SHARDED = {
    ("embedding", "weight"): 0,   # [V, E]
    ("out_linear", "weight"): 0,  # [V, H]
    ("out_linear", "bias"): 0,    # [V]
}


def make_mesh(shape: Optional[Sequence[int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh. Default: all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices), 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {tuple(shape)} needs {n} devices, "
                         f"have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_path(path, leaf, model_size: int) -> P:
    names = [getattr(k, "key", getattr(k, "name", None)) for k in path]
    for (mod, leaf_name), dim in _VOCAB_SHARDED.items():
        if mod in names and names[-1] == leaf_name:
            if leaf.shape[dim] % model_size != 0:
                # Not divisible (vocab unpadded) — replicate rather than fail.
                # Pad the vocab (Opt.vocab_pad_multiple) to enable TP.
                return P()
            spec = [None] * leaf.ndim
            spec[dim] = MODEL_AXIS
            return P(*spec)
    return P()


def param_shardings(mesh: Mesh, params) -> dict:
    """NamedShardings for a model param tree: vocab-dim leaves on the model
    axis (when divisible), everything else replicated."""
    model_size = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path, leaf, model_size)),
        params)


def opt_state_shardings(mesh: Mesh, params, opt_state):
    """Shardings for an optimizer state tree: any subtree with the same
    structure as ``params`` (Adam's mu/nu, etc.) gets the param shardings
    leaf-for-leaf; every other leaf (counts, hyperparams) is replicated.

    This is the one answer to opt-state placement shared by Trainer and the
    driver entry — optimizer moments must live where their params live or
    every update step pays an ICI reshard.
    """
    p_struct = jax.tree_util.tree_structure(params)
    p_sh = param_shardings(mesh, params)
    rep = replicate_sharding(mesh)

    def _is_param_tree(x):
        return jax.tree_util.tree_structure(x) == p_struct

    return jax.tree_util.tree_map(
        lambda x: p_sh if _is_param_tree(x)
        else jax.tree_util.tree_map(lambda _: rep, x),
        opt_state, is_leaf=_is_param_tree)


def pad_to_multiple(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def shard_batch_arrays(mesh: Mesh, *arrays):
    """Device_put host arrays with the batch dim sharded over 'data'."""
    sh = batch_sharding(mesh)
    return tuple(jax.device_put(a, sh) for a in arrays)


def device_put_chunked(x, sharding, chunk_bytes: int = 32 << 20,
                       progress: bool = False):
    """device_put a large host array in leading-dim chunks.

    One multi-GB transfer is a single RPC on tunneled/networked runtimes
    (and a single long blocking DMA elsewhere); chunking bounds each
    transfer and assembles the array ON DEVICE via donated
    dynamic_update_slice — peak device memory is the target buffer plus
    one chunk, and the buffer is updated in place.
    """
    import sys
    import time
    from functools import partial

    import jax.numpy as jnp

    if x.nbytes <= chunk_bytes or x.ndim == 0 or x.shape[0] <= 1:
        return jax.device_put(x, sharding)
    rows = max(1, int(chunk_bytes // max(x.nbytes // x.shape[0], 1)))

    @partial(jax.jit, donate_argnums=0)
    def update(buf, part, start):
        idx = (start,) + (0,) * (buf.ndim - 1)
        return jax.lax.dynamic_update_slice(buf, part, idx)

    buf = jax.device_put(jnp.zeros(x.shape, x.dtype), sharding)
    for start in range(0, x.shape[0], rows):
        if start + rows > x.shape[0]:
            # keep one compiled shape: slide the window back and rewrite
            # the (already correct) overlap rows with the same values
            start = x.shape[0] - rows
        part = np.ascontiguousarray(x[start:start + rows])
        buf = update(buf, jax.device_put(part), start)
        if progress:
            t0 = time.perf_counter()
            jax.block_until_ready(buf)   # surface stalls per chunk
            print(f"[bank] rows {start}..{start + rows} "
                  f"({time.perf_counter() - t0:.1f}s)",
                  file=sys.stderr, flush=True)
    return buf
