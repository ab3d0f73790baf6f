"""Unit tests for bench.py's driver-survival machinery.

Round 3 lost every headline number to a single 600s hang on a wedged TPU
tunnel (BENCH_r03.json: rc=2, parsed=null); these tests pin the
behaviors the round-4 hardening added — fast subprocess probes, the
bounded retry loop, and per-metric watchdogs — without any device.
"""
import importlib.util
import os
import sys
import time

import pytest

_BENCH_PY = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_under_test",
                                                  _BENCH_PY)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


# ------------------------------------------------------- probe subprocess ---

def test_probe_success(bench, monkeypatch):
    monkeypatch.setattr(bench, "_PROBE_SRC", "print('ok')")
    assert bench._probe_compute_once(30.0) is True


def test_probe_wedge_times_out_and_is_killed(bench, monkeypatch):
    """A wedged dispatch costs the probe deadline, not the bench window —
    and the subprocess is SIGKILLed, not left running."""
    monkeypatch.setattr(bench, "_PROBE_SRC",
                        "import time; time.sleep(600)")
    t0 = time.monotonic()
    assert bench._probe_compute_once(1.0) is False
    assert time.monotonic() - t0 < 30.0


def test_probe_fast_transient_error_is_failed_attempt(bench, monkeypatch,
                                                      capsys):
    """A FAST backend error (e.g. FAILED_PRECONDITION right after another
    TPU process exited) must count as a failed attempt for the retry
    loop, not crash the bench."""
    monkeypatch.setattr(bench, "_PROBE_SRC",
                        "raise RuntimeError('FAILED_PRECONDITION: device')")
    assert bench._probe_compute_once(30.0) is False
    assert "FAILED_PRECONDITION" in capsys.readouterr().err


# ------------------------------------------------------------- retry loop ---

def test_require_compute_recovers_mid_window(bench, monkeypatch):
    calls = []
    monkeypatch.setattr(bench, "_probe_compute_once",
                        lambda t: calls.append(t) or len(calls) >= 3)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    bench._require_compute(window_s=600.0)
    assert len(calls) == 3  # two failures, recovery on the third
    # deadlines escalate: a slow-not-dead tunnel (first dispatch ~171s,
    # observed 2026-08-19) must be given a probe long enough to finish
    assert calls[0] == 90.0 and calls[1] == 180.0 and calls[2] > 180.0


def test_require_compute_dead_tunnel_exits_rc2(bench, monkeypatch):
    monkeypatch.setattr(bench, "_probe_compute_once", lambda t: False)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as e:
        bench._require_compute(window_s=0.0)
    assert e.value.code == 2


# -------------------------------------------------------------- watchdogs ---

def test_bounded_metric_completion_and_timeout(bench):
    ran = []
    assert bench._bounded_metric(lambda: ran.append(1), "ok",
                                 timeout_s=30.0) is True
    assert ran == [1]
    # a wedged metric returns False (caller skips the rest) instead of
    # hanging the driver window
    t0 = time.monotonic()
    assert bench._bounded_metric(lambda: time.sleep(120), "wedge",
                                 timeout_s=0.2) is False
    assert time.monotonic() - t0 < 30.0


def test_bounded_metric_propagates_exceptions(bench):
    with pytest.raises(ValueError):
        bench._bounded_metric(lambda: (_ for _ in ()).throw(ValueError("x")),
                              "err", timeout_s=30.0)


# ------------------------------------------------------- metric selection ---

def test_only_selects_single_metric_without_bench_model(bench, monkeypatch):
    """`--only flagship` runs exactly that metric and never builds the
    shared bench model (whose init is a ~30s compile on a cold cache)."""
    ran = []
    monkeypatch.setattr(bench, "_require_compute", lambda *a, **k: None)
    monkeypatch.setattr(bench, "_require_device", lambda *a, **k: None)
    monkeypatch.setattr(bench, "_model", lambda: pytest.fail(
        "--only flagship must not init the shared bench model"))
    monkeypatch.setattr(bench, "bench_flagship_sampling",
                        lambda: ran.append("flagship"))
    monkeypatch.setattr(bench, "bench_flagship_train",
                        lambda: pytest.fail("flagship_train not selected"))
    bench.main(["--only", "flagship"])
    assert ran == ["flagship"]


def test_only_rejects_unknown_metric(bench, monkeypatch):
    monkeypatch.setattr(bench, "_require_compute", lambda *a, **k: None)
    monkeypatch.setattr(bench, "_require_device", lambda *a, **k: None)
    with pytest.raises(SystemExit) as e:
        bench.main(["--only", "nonsense"])
    assert e.value.code == 2  # argparse usage error


def test_only_ar_metric_runs_fifth_metric(bench, monkeypatch, capsys):
    """`--only ar` emits the AR-generation JSON line (the 5th metric,
    round-5 VERDICT item 2) at CPU-feasible scale, without touching the
    shared bench model."""
    import json
    monkeypatch.setattr(bench, "_require_compute", lambda *a, **k: None)
    monkeypatch.setattr(bench, "_require_device", lambda *a, **k: None)
    monkeypatch.setattr(bench, "_model", lambda: pytest.fail(
        "--only ar must not init the shared bench model"))
    monkeypatch.setattr(bench, "AR_BATCH", 2)
    monkeypatch.setattr(bench, "AR_TOKENS", 3)
    bench.main(["--only", "ar"])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == 1
    assert lines[0]["metric"] == "inverse_transformer_ar_cfg_generation"
    assert lines[0]["unit"] == "tokens/s"
    assert lines[0]["value"] > 0 and lines[0]["vs_baseline"] > 0


def test_dp_mesh_run_is_labeled_virtual_and_executes(bench, monkeypatch,
                                                     capsys):
    """`--dp 8` on the virtual CPU mesh: the sharded program compiles and
    executes, and the JSON line is labeled virtual_mesh=true with
    vs_baseline nulled (correctness evidence, never a perf number —
    round-5 VERDICT item 6)."""
    import json
    monkeypatch.setattr(bench, "_require_compute", lambda *a, **k: None)
    monkeypatch.setattr(bench, "_require_device", lambda *a, **k: None)
    monkeypatch.setattr(bench, "AR_BATCH", 8)
    monkeypatch.setattr(bench, "AR_TOKENS", 3)
    try:
        bench.main(["--only", "ar", "--dp", "8"])
    finally:
        bench._DP_MESH = None   # module fixture is session-scoped: don't
                                # leak the mesh into the other tests
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == 1
    rec = lines[0]
    assert rec["dp"] == 8
    assert rec["virtual_mesh"] is True
    assert rec["vs_baseline"] is None
    assert rec["value"] > 0


# --------------------------------------------------------------- AR sweep ---

def test_bench_ar_generation_smoke(bench, monkeypatch, capsys):
    """tools/bench_ar_generation.py end-to-end at CPU-feasible scale: one
    JSON line per batch with finite throughput (the PERF.md round-4 AR
    batch-scaling table's harness)."""
    import json
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    import bench_ar_generation

    monkeypatch.setattr(sys, "argv", ["bench_ar_generation.py",
                                      "--batches", "2,4", "--tokens", "3"])
    bench_ar_generation.main()
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert [r["batch"] for r in lines] == [2, 4]
    for r in lines:
        assert r["unit"] == "tokens/s"
        assert r["value"] > 0 and r["vs_baseline"] > 0
