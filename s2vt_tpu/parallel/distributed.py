"""Multi-host (pod / multi-slice) runtime helpers.

The reference has no distributed story at all (SURVEY.md §2: single
process, single device). Scaling here rides the JAX runtime: each host
calls :func:`initialize` once, builds the global mesh over
``jax.devices()`` (ICI within a slice, DCN across slices — XLA routes the
collectives), and feeds its local shard of every batch through
``host_local_batch_to_global``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` wrapper. On TPU pods the arguments
    are auto-detected from the environment; pass them explicitly for
    CPU/GPU clusters.

    MUST be called before any other jax API touches a backend (even
    ``jax.process_count()`` initializes one). Safe to call twice (the
    'already initialized' RuntimeError is absorbed); a missing coordinator
    on a single-process run is a no-op; any other failure propagates."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already" in str(e).lower():
            return
        raise
    except ValueError:
        if coordinator_address or num_processes:
            raise  # explicit multi-process config that failed: surface it
        # single-process environment without a coordinator: no-op


def host_local_batch_to_global(mesh, *arrays, batch_axis: str = "data"):
    """Assemble globally-sharded arrays from per-host local batch shards.

    Each host passes its LOCAL slice (global_batch / process_count rows);
    the result is a global jax.Array sharded over ``batch_axis``. On a
    single process this reduces to a plain sharded device_put.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(batch_axis))
    out = []
    for a in arrays:
        a = np.asarray(a)
        global_shape = (a.shape[0] * jax.process_count(),) + a.shape[1:]
        if jax.process_count() == 1:
            out.append(jax.device_put(a, sharding))
        else:
            out.append(jax.make_array_from_process_local_data(
                sharding, a, global_shape))
    return tuple(out)


def local_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    return global_batch // n
