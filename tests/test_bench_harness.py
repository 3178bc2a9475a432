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
