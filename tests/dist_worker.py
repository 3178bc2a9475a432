"""Worker for tests/test_distributed_multiprocess.py — NOT a test module.

Runs the SAME data-parallel train-step computation under any (process_id,
num_processes, local_device_count) configuration:

  python dist_worker.py <pid> <nprocs> <port>

Each process slices its host-local rows from a deterministic global batch,
assembles global arrays via ``parallel.distributed.host_local_batch_to_
global`` (the multi-process branch routes through
``jax.make_array_from_process_local_data``, distributed.py:61-62 — the
branch this harness exists to execute), takes two jitted Adam train steps
on a real tiny S2VT over an 8-device 'data' mesh, and prints

  RESULT <pid> <loss0> <loss1> <post-update param l2>

The parent compares the line across a 2-process run and a 1-process run:
multi-host data parallelism must be arithmetically invisible.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main(pid: int, nprocs: int, port: str) -> None:
    from s2vt_tpu.parallel.distributed import (host_local_batch_to_global,
                                               initialize, local_batch_size)

    if nprocs > 1:
        initialize(coordinator_address=f"localhost:{port}",
                   num_processes=nprocs, process_id=pid)
    else:
        initialize()                      # single-process no-op branch
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from s2vt_tpu.models.s2vt import S2VT
    from s2vt_tpu.training.loop import batch_loss

    mesh = Mesh(np.array(jax.devices()).reshape(8, 1), ("data", "model"))

    GB = 16
    lb = local_batch_size(GB)
    assert lb == GB // nprocs
    rng = np.random.default_rng(0)
    feats_g = rng.normal(size=(GB, 8, 16)).astype(np.float32)
    labels_g = rng.integers(1, 40, size=(GB, 8)).astype(np.int32)
    mask_g = np.ones((GB, 8), np.float32)
    valid_g = np.ones((GB,), np.float32)
    lo = pid * lb
    local = [a[lo:lo + lb] for a in (feats_g, labels_g, mask_g, valid_g)]
    f, l, mk, vd = host_local_batch_to_global(mesh, *local)
    assert f.shape[0] == GB, f.shape     # global batch reassembled

    model = S2VT(vocab_size=40, feat_dim=16, length=8, dim_hid=32,
                 dim_embed=32, sos_ix=3, eos_ix=4, use_pallas=False)
    params_h = model.init(jax.random.PRNGKey(0),
                          np.zeros((2, 8, 16), np.float32),
                          np.zeros((2, 7), np.int32), mode="train",
                          deterministic=True)["params"]
    rep = NamedSharding(mesh, P())
    params = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            rep, np.asarray(x), np.shape(x)), params_h)

    tx = optax.adam(1e-2)
    opt_state = jax.jit(tx.init, out_shardings=rep)(params)

    def loss_fn(p, f, l, mk, vd):
        logits = model.apply({"params": p}, f, l[:, :-1], mode="train",
                             deterministic=True)
        return batch_loss(logits, l, mk, vd)

    @jax.jit
    def step(p, s, f, l, mk, vd):
        loss, grads = jax.value_and_grad(loss_fn)(p, f, l, mk, vd)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    params, opt_state, loss0 = step(params, opt_state, f, l, mk, vd)
    params, opt_state, loss1 = step(params, opt_state, f, l, mk, vd)
    pn = jnp.sqrt(sum(jnp.sum(jnp.square(x))
                      for x in jax.tree_util.tree_leaves(params)))
    print(f"RESULT {pid} {float(loss0):.8f} {float(loss1):.8f} "
          f"{float(pn):.8f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
