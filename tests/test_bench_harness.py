"""bench.py's _run_stage semantics: an erroring stage retries once; a
timed-out stage is skipped WITHOUT retry (the abandoned attempt may still
hold the exclusive device — the r3 lesson); a healthy stage returns its
value. Pure host-side, no device work."""

import time

import bench


def test_stage_returns_value():
    assert bench._run_stage("ok", lambda: 42, timeout_s=5.0) == 42


def test_stage_error_retries_once():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("transient")
        return "recovered"

    assert bench._run_stage("flaky", flaky, timeout_s=5.0) == "recovered"
    assert len(calls) == 2


def test_stage_persistent_error_returns_none():
    def bad():
        raise RuntimeError("always")
    assert bench._run_stage("bad", bad, timeout_s=5.0) is None


def test_stage_timeout_skips_without_retry():
    calls = []

    def wedged():
        calls.append(1)
        time.sleep(30)

    t0 = time.perf_counter()
    assert bench._run_stage("wedged", wedged, timeout_s=0.3) is None
    assert time.perf_counter() - t0 < 5.0
    assert len(calls) == 1      # no concurrent second attempt


def test_stage_telemetry_records_wall_and_retries():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("transient")
        return 7

    tel = {}
    assert bench._run_stage("flaky", flaky, timeout_s=5.0, telemetry=tel) == 7
    assert tel["stage_wall_s"]["flaky"] >= 0.0
    assert tel["stage_retries"]["flaky"] == 1
    tel2 = {}
    assert bench._run_stage("ok", lambda: 1, timeout_s=5.0,
                            telemetry=tel2) == 1
    assert "stage_retries" not in tel2


def test_artifact_snapshot_and_single_emit(tmp_path, monkeypatch, capsys):
    """The snapshot file is a complete driver-contract payload after every
    stage, and emit() prints the JSON line exactly once (the SIGTERM path
    calls it and so does normal completion — double emission would break
    the 'ONE JSON line' contract)."""
    import json
    import os

    monkeypatch.chdir(tmp_path)
    art = bench._Artifact()
    art.extra["some_stage"] = 1.5
    art.snapshot()
    snap = json.load(open(tmp_path / "BENCH_partial.json"))
    assert snap["metric"] == "s2vt_greedy_decode_clips_per_sec_chip"
    assert snap["value"] is None and snap["extra"]["some_stage"] == 1.5

    art.ours, art.vs = 100.0, 10.0
    art.emit()
    art.emit()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    payload = json.loads(out[0])
    assert payload["value"] == 100.0 and payload["vs_baseline"] == 10.0
    assert not [f for f in os.listdir(tmp_path)
                if f.startswith(".bench_partial_")], "tmp snapshot leaked"


def test_emit_is_compact_and_snapshot_carries_full_extra(tmp_path,
                                                         monkeypatch,
                                                         capsys):
    """VERDICT r4 #1: the driver keeps only a bounded tail of stdout, so
    the final line must stay under ~1.5KB no matter how much the run
    measured. Core keys ride the line; everything lands in the snapshot
    file the line points at."""
    import json

    monkeypatch.chdir(tmp_path)
    art = bench._Artifact()
    art.ours, art.vs = 45000.0, 4800.0
    # bloat: 200 non-core keys plus every core key
    for i in range(200):
        art.extra[f"stage_{i:03d}_detail"] = round(i * 1.0101, 4)
    for k in bench._CORE_KEYS:
        art.extra[k] = 1.25
    art.extra["train_e2e_gate_pass"] = True
    art.emit()
    line = capsys.readouterr().out.strip()
    assert len(line) <= 1500, len(line)
    payload = json.loads(line)
    assert payload["value"] == 45000.0
    assert payload["extra"]["full_extra_in"] == "BENCH_partial.json"
    assert payload["extra"]["train_e2e_gate_pass"] is True
    assert "stage_000_detail" not in payload["extra"]
    # emit() wrote the full snapshot before printing the pointer
    snap = json.load(open(tmp_path / "BENCH_partial.json"))
    assert snap["extra"]["stage_000_detail"] == 0.0
    assert len(snap["extra"]) >= 200


def test_compact_trim_never_drops_explanatory_keys(tmp_path, monkeypatch,
                                                   capsys):
    """When the compact line must trim to fit the stdout-tail budget, the
    keys that make a degraded artifact self-describing (skip reason,
    signal, wall clock, skip count, snapshot pointer) survive; throughput
    detail is what gets dropped."""
    import json

    monkeypatch.chdir(tmp_path)
    art = bench._Artifact()
    art.ours, art.vs = None, None
    # every core key present with values long enough to force trimming
    for k in bench._CORE_KEYS:
        art.extra[k] = "x" * 120
    art.extra["decode_skipped"] = "budget (wedged upload, retried once)"
    art.extra["terminated_by_signal"] = 15
    art.extra["total_wall_s"] = 1499.9
    art.extra["some_stage_skipped"] = "budget"
    art.emit()
    payload = json.loads(capsys.readouterr().out.strip())
    assert len(json.dumps(payload)) <= 1500
    for k in ("decode_skipped", "terminated_by_signal", "total_wall_s",
              "skipped_stages", "full_extra_in"):
        assert k in payload["extra"], k
    # and something droppable was in fact dropped
    assert len(payload["extra"]) < len(bench._CORE_KEYS) + 2


def test_bench_zero_budget_still_prints_json(tmp_path):
    """Contract: `python bench.py` ALWAYS lands one parseable JSON line on
    stdout — with --budget 0 every stage is budget-skipped (recorded as
    such) and the line still prints, without touching the device."""
    import json
    import os
    import subprocess
    import sys

    # force CPU in-process: the ambient sitecustomize registers the axon
    # TPU plugin at interpreter start and wins over the env var (see
    # .claude/skills/verify) — a test must never touch the exclusive chip
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.path.insert(0, {os.path.dirname(bench.__file__)!r})\n"
        "sys.argv = ['bench.py', '--budget', '0']\n"
        "import bench; bench.main()\n")
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=240, env=dict(os.environ),
        cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-800:]
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["metric"] == "s2vt_greedy_decode_clips_per_sec_chip"
    assert payload["value"] is None
    assert payload["extra"]["decode_skipped"].startswith("budget")
    assert (tmp_path / "BENCH_partial.json").exists()


def test_e2e_gate_threshold_sits_between_calibrated_bands():
    """The self-judging e2e gate is only meaningful if meteor_min separates
    the on-chip calibrated bands (BASELINE.md §learning-gate calibration):
    above everything a feature-blind model reaches, below the weakest
    post-plateau real point. Guards future edits to E2E_GATE."""
    g = bench.E2E_GATE
    control_lo, control_hi = g["control_band"]
    real_lo, real_hi = g["real_band"]
    assert control_hi < g["meteor_min"] < real_lo
    # margin both ways: >=25% over the control ceiling, >=15% under the
    # weakest real plateau point (the calibrated values give ~35%/~20%)
    assert g["meteor_min"] >= control_hi * 1.25
    assert g["meteor_min"] <= real_lo * 0.85


def test_measured_floor_consistent_with_conservative_bound():
    """train_measured_floor_ms prices the backward chain at its OWN
    measured latency; with bwd == fwd it must agree with the
    conservative train_latency_bound_ms at the same per-step value
    (same 4L steps, same chain-FLOPs bookkeeping differs only by the
    bwd chain's smaller matmuls — so 'agree' means within the two
    models' rest-term delta), and with bwd < fwd it must be strictly
    lower. Pure arithmetic, no device."""
    b, us = 96, 14.0
    cons = bench.train_latency_bound_ms(us, b)
    same = bench.train_measured_floor_ms(us, us, b)
    # equal per-step latency: only the rest term differs (the measured
    # model subtracts the bwd chain's true, smaller FLOPs) — the two
    # must be within 15% of each other and ordered (measured >= cons:
    # it subtracts FEWER flops from the peak-rate rest term)
    assert same >= cons
    assert same <= cons * 1.15
    faster_bwd = bench.train_measured_floor_ms(us, us / 2, b)
    assert faster_bwd < same
    # chain terms dominate: floors are positive and scale with latency
    assert bench.train_measured_floor_ms(2 * us, us, b) > same


def test_attribution_keys_are_core():
    """The attribution fractions must survive into the compact headline
    (the whole point is that the official line carries them)."""
    assert "train_step_cell_bound_frac" in bench._CORE_KEYS
    assert "train_step_attributed_frac" in bench._CORE_KEYS


def test_stage_budget_reserves_for_critical_stages():
    """A secondary stage must not start (nor be allowed to run long
    enough) to eat into the budget reserved for the judge-critical e2e
    gates and serving stages; a critical stage sees no reservation
    against itself (it passes reserved_s=0). Pure arithmetic — the
    measured failure this encodes: one r5 warming run burned the
    remainder in front stages and skipped BOTH e2e gates at '308s
    left'."""
    # plenty of budget: secondary stage starts, timeout capped above est
    ok, cap = bench._stage_budget(1400.0, est=60.0, reserved_s=630.0)
    assert ok and cap == 1400.0 - 630.0
    # remainder covers est but NOT est + reserve: secondary must skip
    ok, _ = bench._stage_budget(400.0, est=60.0, reserved_s=630.0)
    assert not ok
    # the same remainder with no reservation (critical stage): starts
    ok, cap = bench._stage_budget(400.0, est=330.0, reserved_s=0.0)
    assert ok and cap == 400.0
    # timeout cap never goes non-positive
    _, cap = bench._stage_budget(10.0, est=5.0, reserved_s=50.0)
    assert cap == 1.0
    # a critical stage still honors LATER criticals' reservations: with
    # room it caps below them, without room it starts anyway but capped
    # at its own est — never the full remainder (a wedged critical must
    # not starve every later gate)
    ok, cap = bench._stage_budget(1400.0, est=330.0, reserved_s=300.0,
                                  critical=True)
    assert ok and cap == 1400.0 - 300.0
    ok, cap = bench._stage_budget(400.0, est=330.0, reserved_s=300.0,
                                  critical=True)
    assert ok and cap == 330.0
    # a critical stage whose est exceeds the remainder still skips
    ok, _ = bench._stage_budget(200.0, est=330.0, reserved_s=300.0,
                                critical=True)
    assert not ok


def test_request_nonce_distinct_payloads_any_dtype():
    """The serving throughput loops write a per-request nonce so repeated
    requests never upload byte-identical payloads (the tunnel-caching
    degeneracy, CLAUDE.md). The nonce must be exact in every served
    feats dtype (an additive epsilon rounds away in bf16) and distinct
    for far more epochs than any loop runs."""
    import numpy as np

    for dt in (np.float32, np.dtype("bfloat16")):
        feats = np.zeros((2, 4, 4), dt)
        seen = set()
        for i in range(1000):
            bench._request_nonce(feats, i)
            seen.add((float(feats[0, 0, 0]), float(feats[0, 1, 0])))
        assert len(seen) == 1000   # exact (no rounding collisions), unique
        assert all(0 <= a < 224 and 0 <= b < 224 for a, b in seen)
