"""bench.py outage resilience (VERDICT r3 items 1/W1).

The axon TPU relay can be down for hours; BENCH_r03.json was an rc=1
traceback because bench.py had no guard. The contract now: bench.py
ALWAYS exits 0 and prints ONE parseable JSON line — on outage with an
explicit {"error": "backend_unavailable"} marker plus last-known-good
numbers, never a traceback.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run_bench(env_extra, timeout=540):
    # generous timeout: each probe subprocess pays a full python+jax
    # import (~20 s cold on this 1-CPU host, minutes when a concurrent
    # compile is hogging the core) — 240 s flaked under load
    env = dict(os.environ, **env_extra)
    r = subprocess.run([sys.executable, str(REPO / "bench.py")],
                       capture_output=True, text=True, cwd=str(REPO),
                       env=env, timeout=timeout)
    return r


def test_bench_backend_down_emits_valid_json(tmp_path):
    """Simulated backend-down run: rc 0, one JSON line, structured outage
    marker, no traceback on stdout.

    Simulation: a poisoned ``jax`` module on PYTHONPATH whose import
    raises the exact error the real outage raised (BENCH_r03). A bogus
    ``JAX_PLATFORMS`` no longer works — the axon plugin registers and
    serves devices regardless of that variable (observed 2026-08-20:
    JAX_PLATFORMS=bogus still yields the real TPU), which silently turned
    this test into a full bench run that timed out. The shim keeps the
    REAL probe/retry/emit path under test: the probe subprocess imports
    jax, hits the RuntimeError, and bench must emit the outage payload."""
    shim = tmp_path / "shim"
    shim.mkdir()
    (shim / "jax.py").write_text(
        "raise RuntimeError(\"Unable to initialize backend 'axon': "
        "relay down (simulated outage)\")\n")
    r = _run_bench({
        "PYTHONPATH": str(shim),
        "PDB2R_BENCH_PROBE_TIMEOUT": "120",
        "PDB2R_BENCH_PROBE_RETRIES": "2",
        "PDB2R_BENCH_PROBE_BACKOFF": "0.1",
    })
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert lines, "no stdout"
    payload = json.loads(lines[-1])   # the driver parses the last line
    assert payload["metric"] == "mlip_force_calls_per_sec_300atom"
    assert payload["value"] is None
    assert payload["vs_baseline"] is None
    ex = payload["extras"]
    assert ex["error"] == "backend_unavailable"
    assert ex["probe_attempts"] == 2
    assert "detail" in ex
    # last-known-good: BENCH_r02.json in this repo has a parseable tail
    lkg = ex["last_known_good"]
    assert lkg is not None and lkg["value"] is not None


def test_bench_probe_hang_times_out():
    """A HANGING backend init (the other observed outage mode) must be
    killed by the subprocess probe timeout, not hang the bench."""
    # sitecustomize-free python that sleeps forever on 'import jax' can't
    # be simulated portably; instead verify the probe path directly.
    sys.path.insert(0, str(REPO))
    try:
        import importlib

        import bench
        importlib.reload(bench)
        r = subprocess.run   # noqa: F841  (probe uses subprocess.run)
        old_t = bench.PROBE_TIMEOUT_S
        bench.PROBE_TIMEOUT_S = 2
        try:
            # make the probed interpreter hang deterministically
            real_exe = sys.executable
            bench.sys = sys
            hang_code_exe = real_exe
            import subprocess as sp
            orig_run = sp.run

            def fake_run(cmd, **kw):
                return orig_run([hang_code_exe, "-c",
                                 "import time; time.sleep(60)"], **kw)

            sp.run = fake_run
            try:
                ok, detail = bench._probe_backend()
            finally:
                sp.run = orig_run
        finally:
            bench.PROBE_TIMEOUT_S = old_t
        assert not ok
        assert "timed out" in detail
    finally:
        sys.path.remove(str(REPO))


def test_bench_budget_gate_and_sub_budget():
    """VERDICT r4 item 1a: the global wall-clock budget must gate every
    section with an explicit skip marker and clamp subprocess timeouts."""
    sys.path.insert(0, str(REPO))
    try:
        import importlib

        import bench
        importlib.reload(bench)
        # pretend the budget is nearly exhausted
        bench.BUDGET_S = 100.0
        bench._T0 = bench.time.monotonic() - 95.0      # 5 s remaining
        extras = {}
        assert not bench._gate(extras, "escn", 90)
        assert "skipped" in extras["escn"]
        assert "PDB2R_BENCH_BUDGET" in extras["escn"]["skipped"]
        assert bench._sub_budget("PDB2R_BENCH_HESS_TIMEOUT", 600) == 0
        # plenty of budget: gate passes, sub-budget clamps to remaining
        bench._T0 = bench.time.monotonic() - 10.0
        extras = {}
        assert bench._gate(extras, "escn", 60)
        assert extras == {}
        clamped = bench._sub_budget("PDB2R_BENCH_HESS_TIMEOUT", 600,
                                    floor=60, margin=20)
        assert 60 <= clamped <= 70        # ~90 s remaining - 20 margin
    finally:
        sys.path.remove(str(REPO))


def test_bench_sigterm_emits_partial_payload():
    """VERDICT r4 item 1c: SIGTERM (what the driver's timeout sends before
    SIGKILL) must flush the current partial payload as a JSON line."""
    import signal
    import time as _time

    code = r'''
import sys, time
sys.path.insert(0, %r)
import bench
bench._PAYLOAD = {"metric": "mlip_force_calls_per_sec_300atom",
                  "value": 123.0, "unit": "force-calls/sec",
                  "vs_baseline": None, "extras": {"partial": True}}
bench._install_signal_handlers()
print("READY", flush=True)
time.sleep(60)
''' % str(REPO)
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
    try:
        assert p.stdout.readline().strip() == "READY"
        p.send_signal(signal.SIGTERM)
        out, _err = p.communicate(timeout=30)
    finally:
        if p.poll() is None:
            p.kill()
    assert p.returncode == 0
    lines = [l for l in out.strip().splitlines() if l.strip()]
    payload = json.loads(lines[-1])
    assert payload["value"] == 123.0
    ex = payload["extras"]
    assert ex["terminated_by_signal"] == "SIGTERM"
    assert "elapsed_s" in ex


def test_last_known_good_parses_bench_artifacts():
    sys.path.insert(0, str(REPO))
    try:
        import importlib

        import bench
        importlib.reload(bench)
        lkg = bench._last_known_good()
    finally:
        sys.path.remove(str(REPO))
    # BENCH_r02.json (rc=0, tail JSON) must be found; r03 (rc=1) skipped
    assert lkg is not None
    assert lkg["metric"] == "mlip_force_calls_per_sec_300atom"
    assert lkg["value"] and lkg["value"] > 0
