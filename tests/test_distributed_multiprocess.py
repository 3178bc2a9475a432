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

import os
import pathlib
import socket
import subprocess
import sys

import pytest

REPO = str(pathlib.Path(__file__).resolve().parent.parent)
WORKER = str(pathlib.Path(__file__).resolve().parent / "dist_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{n_local_devices}")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the worker forces jax_platforms=cpu in-process before first jax use
    return env


def _result_line(out: str) -> tuple:
    for line in out.splitlines():
        if line.startswith("RESULT "):
            parts = line.split()
            return tuple(float(x) for x in parts[2:])
    raise AssertionError(f"no RESULT line in output:\n{out}")


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=_env(4), cwd=REPO) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)
    r0, r1 = _result_line(outs[0]), _result_line(outs[1])
    # every process of an SPMD program computes the same global result
    assert r0 == r1, (r0, r1)

    single = subprocess.run(
        [sys.executable, WORKER, "0", "1", str(port)],
        capture_output=True, text=True, timeout=300, env=_env(8), cwd=REPO)
    assert single.returncode == 0, single.stderr[-2000:]
    rs = _result_line(single.stdout)
    # Loss at step 0, loss at step 1 (through the optimizer update), and
    # the post-update parameter norm must match across process topologies
    # to f32 reduction precision: the gradient all-reduce lowers to a
    # cross-process (gloo) collective in the 2-process run and an
    # in-process reduction in the 1-process run, whose summation orders
    # legitimately differ in the last float32 ulps (observed: loss0
    # 3.68901658 vs 3.68901634, everything else printed-digit equal).
    for got, want in zip(rs, r0):
        assert got == pytest.approx(want, rel=1e-6), (rs, r0)
