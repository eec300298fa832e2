"""Benchmark: MLIP force-call throughput + converged-GSM-MEP wall-clock +
MFU on a ~300-atom cluster (BASELINE.md's driver-defined metrics).

TIMING METHODOLOGY (round-3 correction): every throughput loop CHAINS its
inputs (next coordinates depend on the previous forces). The axon TPU
relay memoizes identical (program, args) executions — a loop over
identical inputs measures cache hits, not compute (measured: 10 identical
8k x 8k matmuls "complete" in 0.02 ms; chained, 47 ms each). Round-2
numbers recorded with identical-input loops are therefore optimistic;
every number below survives the chained-input test. Real optimizer loops
are chained by construction (each step consumes the last forces), so the
chained rate is the one production sees.

The reference publishes no numbers (BASELINE.md) and its A100/fairchem
stack cannot run in this offline image, so the baseline denominator is
MEASURED: the same MLIP evaluated the way the reference operates — one
image per call, host round-trip and array conversion every call
(uma_pysis.py:292-327) — versus this framework's device-resident mode.

Sections:
- surrogate (PaiNN-class uma-s-1p1): batched + single chained rates, MFU,
  measured serial host-synced baseline;
- eSCN (UMA-class escn-md, fused Pallas edge kernel — the backbone that
  corresponds to the reference's fairchem operating point): chained
  force-call rate and MFU, Pallas vs XLA edge chain;
- GSM MEP wall-clock: surrogate-calibrated criterion AND the reference's
  real gau contract (rms_force 3.0e-4 Ha/Bohr, opt.py:176-187) on the
  analytic Morse backend where that force scale is physical.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

V5E_PEAK_FLOPS = 197e12      # bf16 peak per chip (public TPU v5e spec)
BOHR2ANG = 0.529177210903
EV2AU = 0.03674932217565499

# Outage resilience (VERDICT r3 item 1): the axon TPU relay can be down for
# hours (observed 2026-08-17: backend init raises RuntimeError — or hangs —
# and nothing in this VM can restart it). The bench must ALWAYS emit one
# parseable JSON line. Strategy: probe the backend in a SUBPROCESS with a
# hard timeout (an in-process jax.devices() can hang forever), retry with
# backoff inside a bounded budget, and on failure emit structured JSON with
# an explicit "backend_unavailable" marker + last-known-good numbers.
PROBE_TIMEOUT_S = int(os.environ.get("PDB2R_BENCH_PROBE_TIMEOUT", "120"))
PROBE_RETRIES = int(os.environ.get("PDB2R_BENCH_PROBE_RETRIES", "3"))
PROBE_BACKOFF_S = float(os.environ.get("PDB2R_BENCH_PROBE_BACKOFF", "60"))

# Driver-timeout resilience (VERDICT r4 item 1): the round-4 record was lost
# to rc=124 — the driver's own timeout killed an emit-at-end process after
# every section had budgeted MORE total time than any plausible driver
# window. Three defenses:
#   (a) ONE global wall-clock budget (PDB2R_BENCH_BUDGET, conservative
#       default) checked before EVERY section; sections that don't fit are
#       skipped with explicit markers, and per-section subprocess timeouts
#       are clamped to the remaining global budget;
#   (b) incremental emission — the headline JSON line is printed as soon as
#       section 1 completes and re-printed (enriched) after every later
#       section; the driver parses the LAST json line of the tail, so a
#       kill at any point still leaves a complete record of everything
#       finished so far;
#   (c) SIGTERM/SIGALRM/SIGINT handlers that emit the current partial
#       payload immediately before exiting (the driver sends SIGTERM at
#       timeout before SIGKILL).
_T0 = time.monotonic()
BUDGET_S = float(os.environ.get("PDB2R_BENCH_BUDGET", "480"))
_PAYLOAD = None          # module global so signal handlers can emit it


def _elapsed():
    return time.monotonic() - _T0


def _remaining():
    return BUDGET_S - _elapsed()


def _emit(payload):
    """Print the single JSON line the driver parses, and flush."""
    print(json.dumps(payload))
    sys.stdout.flush()


def _install_signal_handlers():
    """Emit the partial payload on SIGTERM/SIGALRM/SIGINT, then exit 0.

    The driver's timeout delivers SIGTERM before SIGKILL; an in-process
    SIGALRM backstop (armed slightly past the global budget) covers the
    case where a section overruns its own gate. ``os._exit`` avoids
    atexit/JAX teardown that could hang after the relay died."""
    import signal

    def handler(signum, frame):                  # pragma: no cover - signal
        p = _PAYLOAD
        if p is not None:
            try:
                name = signal.Signals(signum).name
            except Exception:
                name = str(signum)
            p.setdefault("extras", {})["terminated_by_signal"] = name
            p["extras"]["elapsed_s"] = round(_elapsed(), 1)
            _emit(p)
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP,
                signal.SIGALRM):
        try:
            signal.signal(sig, handler)
        except Exception:
            pass
    # backstop alarm: if a native call blocks past the budget, the ALRM
    # handler still fires once the interpreter regains control
    try:
        signal.alarm(int(BUDGET_S) + 90)
    except Exception:
        pass


def _gate(extras, key, need_s):
    """Budget gate: True if ``need_s`` seconds still fit in the global
    budget, else record an explicit skip marker under ``key``."""
    if _remaining() >= need_s:
        return True
    extras[key] = {"skipped": (
        f"global budget: {_remaining():.0f}s left of {BUDGET_S:.0f}s "
        f"(PDB2R_BENCH_BUDGET), section needs ~{need_s}s")}
    return False


def _sub_budget(env_name, default, floor=60, margin=20):
    """Per-section subprocess timeout clamped to the remaining global
    budget (minus an emit margin). Returns 0 if even ``floor`` won't fit."""
    want = int(os.environ.get(env_name, str(default)))
    avail = int(_remaining() - margin)
    if avail < floor:
        return 0
    return min(want, avail)


def _probe_backend():
    """Probe backend init in a subprocess (it can hang, not just raise).

    Returns (ok: bool, detail: str)."""
    import subprocess
    code = "import jax; d = jax.devices(); print('OK', d[0].platform, len(d))"
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=min(PROBE_TIMEOUT_S,
                                       max(_remaining() - 10, 15)))
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {PROBE_TIMEOUT_S}s (backend hang)"
    except Exception as e:                       # pragma: no cover
        return False, f"probe error: {type(e).__name__}: {e}"
    out = (r.stdout or "").strip().splitlines()
    if r.returncode == 0 and out and out[-1].startswith("OK"):
        return True, out[-1]
    tail = (r.stderr or "").strip().splitlines()
    return False, (tail[-1][:300] if tail else f"probe rc={r.returncode}")


def _probe_with_backoff():
    """Retry the backend probe with backoff inside a bounded budget.

    The retry ladder (3 probes x 120 s + 60/120 s backoffs ~= 9 min) can
    alone exceed the global budget, so every wait is clamped to the
    remaining budget and the ladder stops once nothing useful fits."""
    detail = "no probe attempted"
    for attempt in range(PROBE_RETRIES):
        if _remaining() < 30:
            return False, f"{detail} (probe ladder cut by global budget)", \
                attempt
        ok, detail = _probe_backend()
        if ok:
            return True, detail, attempt + 1
        if attempt + 1 < PROBE_RETRIES:
            wait = min(PROBE_BACKOFF_S * (attempt + 1),
                       max(_remaining() - PROBE_TIMEOUT_S, 0))
            if wait <= 0:
                return False, detail, attempt + 1
            time.sleep(wait)
    return False, detail, PROBE_RETRIES


def _last_known_good():
    """Best-effort last driver-captured numbers, for the outage payload."""
    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for name in sorted(os.listdir(here)):
        if not (name.startswith("BENCH_r") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(here, name)) as fh:
                rec = json.load(fh)
            parsed = rec.get("parsed")
            if parsed is None:
                tail = rec.get("tail", "")
                for line in reversed(tail.strip().splitlines()):
                    line = line.strip()
                    if line.startswith("{") and line.endswith("}"):
                        parsed = json.loads(line)
                        break
            if parsed and parsed.get("value") is not None:
                best = {"from": name, "metric": parsed.get("metric"),
                        "value": parsed.get("value"),
                        "unit": parsed.get("unit"),
                        "vs_baseline": parsed.get("vs_baseline")}
        except Exception:
            continue
    return best


def _unavailable_payload(detail, attempts):
    return {
        "metric": "mlip_force_calls_per_sec_300atom",
        "value": None,
        "unit": "force-calls/sec",
        "vs_baseline": None,
        "extras": {
            "error": "backend_unavailable",
            "detail": detail,
            "probe_attempts": attempts,
            "probe_timeout_s": PROBE_TIMEOUT_S,
            "note": "axon TPU relay down (see bench.py docstring); numbers "
                    "below are the last driver-captured run, NOT this round",
            "last_known_good": _last_known_good(),
        },
    }


def _chained_rate(eforce, params, coords, iters=10, reps=3):
    """calls/sec with input chaining (defeats relay memoization), best of
    ``reps`` timed stretches (defeats additive relay latency spikes —
    inputs keep chaining across reps, so nothing memoizes)."""
    import jax  # noqa: F401
    c = coords
    e, f = eforce(params, c)
    f.block_until_ready()
    best = float("inf")
    for _rep in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            c = c + 1e-6 * f
            e, f = eforce(params, c)
        f.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return iters / best


def main():
    global _PAYLOAD
    extras = {}
    payload = {"metric": "mlip_force_calls_per_sec_300atom",
               "value": None, "unit": "force-calls/sec",
               "vs_baseline": None, "extras": extras}
    _PAYLOAD = payload
    _install_signal_handlers()
    extras["budget_s"] = BUDGET_S
    # ---- (0) backend probe with retry/backoff (subprocess: init can hang)
    ok, detail, attempts = _probe_with_backoff()
    if not ok:
        _emit(_unavailable_payload(detail, attempts))
        return
    extras["backend_probe"] = detail
    try:
        _run_sections(payload, extras)
    except Exception as e:                      # pragma: no cover
        # mid-run outage (BENCH_r03 died at a device_put) — emit whatever
        # sections completed plus the failure marker, never a traceback
        extras["error"] = "bench_aborted_midrun"
        extras["detail"] = f"{type(e).__name__}: {e}"[:500]
        if payload["value"] is None:
            extras["last_known_good"] = _last_known_good()
    extras["elapsed_s"] = round(_elapsed(), 1)
    _emit(payload)


def _run_sections(payload, extras):
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_system
    from pdb2reaction_tpu.mlip.model import make_model

    if not _gate(extras, "headline", 60):
        return
    sys_ = _flagship_system()
    fn, params, cfg = make_model("uma-s-1p1", seed=0)

    @jax.jit
    def eforce(params, coords):
        e, g = jax.value_and_grad(lambda c: fn(c, sys_, params))(coords)
        return e, -g

    B = 64  # image batch (GSM strings + FD-Hessian displacement batching)

    @jax.jit
    def eforce_batch(params, coords_b):
        def one(c):
            e, g = jax.value_and_grad(lambda cc: fn(cc, sys_, params))(c)
            return e, -g
        return jax.lax.map(one, coords_b, batch_size=1)

    coords = jnp.asarray(sys_.coords, jnp.float32)
    batch = jnp.asarray(
        np.asarray(coords)[None] + 0.01 * np.random.default_rng(0)
        .normal(size=(B,) + coords.shape).astype(np.float32))

    # ---- (1) batched throughput (chained, best of 3 reps) -----------------
    # chaining defeats relay memoization; the best-of-reps defeats the
    # relay's additive per-dispatch latency spikes (a captured run lost
    # 2x to one spike across a single 5-iteration rep). Inputs keep
    # chaining ACROSS reps, so no (program, args) pair ever repeats.
    eb, fb = eforce_batch(params, batch)
    fb.block_until_ready()
    bt = batch
    iters = 5
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            bt = bt + 1e-6 * fb
            eb, fb = eforce_batch(params, bt)
        fb.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    calls_per_sec = iters * B / best
    payload["value"] = round(calls_per_sec, 2)

    extras["timing"] = ("chained inputs (relay memoizes identical "
                        "executions; see bench.py docstring)")
    # incremental emission: the headline number is on the record from this
    # point on, whatever happens to the later sections (driver parses the
    # LAST json line)
    _emit(payload)

    # ---- (2) denominators -------------------------------------------------
    try:
        single_calls_per_sec = _chained_rate(eforce, params, coords, 20)
        # reference-style serial host-synced calls (one image per call,
        # numpy in / numpy out — uma_pysis.py:292-327); input varies per call
        base_np = np.asarray(coords)
        n_serial = 10
        best_serial = float("inf")
        for rep in range(3):      # best-of-3: a relay spike here would
            t0 = time.perf_counter()   # inflate vs_baseline in OUR favor
            for k in range(n_serial):
                c_host = base_np + 1e-4 * (rep * n_serial + k + 1)
                e1, f1 = eforce(params, jnp.asarray(c_host))
                _ = float(e1), np.asarray(f1)
            best_serial = min(best_serial, time.perf_counter() - t0)
        serial_calls_per_sec = n_serial / best_serial
        extras["baseline_single_device_calls_per_sec"] = \
            round(single_calls_per_sec, 2)
        extras["baseline_serial_hostsync_calls_per_sec"] = \
            round(serial_calls_per_sec, 2)
        extras["baseline_derivation"] = (
            "vs_baseline = batched rate / measured serial host-synced "
            "rate (the reference's operating mode, uma_pysis.py:292-327)")
        payload["vs_baseline"] = round(calls_per_sec / serial_calls_per_sec, 2)
    except Exception as e:                      # pragma: no cover
        extras["baseline_error"] = f"{type(e).__name__}: {e}"[:300]

    # ---- (3) MFU ----------------------------------------------------------
    try:
        ca = eforce.lower(params, coords).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops:
            extras["batched_program_flops"] = flops
            extras["mfu_vs_v5e_bf16_peak"] = round(
                (flops * calls_per_sec) / V5E_PEAK_FLOPS, 4)
    except Exception:
        pass

    # ---- (5) GSM MEP wall-clocks (cheap, warm-cache: run before the
    # heavier eSCN sections so a tight budget still records them) ---------
    if _gate(extras, "gsm", 40):
        try:
            extras.update(_gsm_section(fn, params, sys_, coords))
        except Exception as e:                  # pragma: no cover
            extras["gsm_error"] = f"{type(e).__name__}: {e}"[:300]
        _emit(payload)
    if _gate(extras, "gsm_gau", 30):
        try:
            extras.update(_gsm_matched_criteria(sys_, coords))
        except Exception as e:                  # pragma: no cover
            extras["gsm_gau_error"] = f"{type(e).__name__}: {e}"[:300]
        _emit(payload)

    # ---- (3b) SURVEY §6 workflow units: opt / scan / tsopt-freq-irc -------
    if _gate(extras, "workflow_units", 90):
        try:
            extras["workflow_units"] = _workflow_units_section()
        except Exception as e:                  # pragma: no cover
            extras["workflow_units"] = \
                {"error": f"{type(e).__name__}: {e}"[:300]}
        _emit(payload)

    # ---- (4) UMA-class eSCN backbone (the reference's operating point) ---
    # one retry: the axon relay's remote-compile endpoint occasionally
    # drops long-lived connections (observed: broken pipe mid-compile)
    if _gate(extras, "escn", 90):
        for attempt in (1, 2):
            try:
                extras["escn"] = _escn_section(sys_, coords)
                break
            except Exception as e:              # pragma: no cover
                extras["escn"] = {"error": f"{type(e).__name__}: {e}"[:300]}
        _emit(payload)

    # ---- (4c) flagship: eSCN GSM MEP on the 300-atom cluster -------------
    if _gate(extras, "escn_gsm", 120):
        try:
            extras["escn_gsm"] = _escn_gsm_section(sys_, coords)
        except Exception as e:                  # pragma: no cover
            extras["escn_gsm"] = {"error": f"{type(e).__name__}: {e}"[:300]}
        _emit(payload)

    # ---- (4e) stage-4 cost unit: full eSCN Hessian at 300 atoms ----------
    # Before cold_start now that the FD path rides the SAME per-image
    # batched force program the GSM section just warmed (VERDICT r4
    # item 4) — no giant separate program, no abandoned remote compile to
    # starve later sections.
    if _gate(extras, "escn_hessian", 90):
        try:
            extras["escn_hessian"] = _escn_hessian_section()
        except Exception as e:                  # pragma: no cover
            extras["escn_hessian"] = \
                {"error": f"{type(e).__name__}: {e}"[:300]}
        _emit(payload)

    # ---- (4f) `all` pipeline wall-clock (SURVEY §6 config #5) ------------
    if _gate(extras, "all_pipeline", 120):
        try:
            extras["all_pipeline"] = _all_pipeline_section()
        except Exception as e:                  # pragma: no cover
            extras["all_pipeline"] = \
                {"error": f"{type(e).__name__}: {e}"[:300]}
        _emit(payload)

    # ---- (4b) cross-process cold start (persistent compile cache) --------
    # Last: its first process deliberately compiles against a FRESH cache
    # dir, the one legitimately slow step left — everything above is
    # warm-cache.
    if _gate(extras, "cold_start", 80):
        try:
            extras["cold_start"] = _cold_start_section()
        except Exception as e:                  # pragma: no cover
            extras["cold_start"] = {"error": f"{type(e).__name__}: {e}"[:300]}


def _escn_section(sys_, coords):
    """escn-md (UMA-class) with the fused Pallas edge kernel: the number
    that corresponds to the reference's fairchem backbone (VERDICT r2
    item 2)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from pdb2reaction_tpu.mlip.escn import (ESCN_CONFIGS, make_escn_model,
                                            premerge_escn_params)

    out = {}
    for name, cfg in [
        ("escn-md-pallas", dataclasses.replace(
            ESCN_CONFIGS["escn-md"], edge_kernel="pallas-mega")),
        ("escn-md-xla", ESCN_CONFIGS["escn-md"]),
    ]:
        fn, params, cfg = make_escn_model(cfg, seed=0)
        # calculators premerge the MoLE expert banks at construction
        # (mlip/uma.py); measure the same production configuration
        params = premerge_escn_params(params, cfg)

        @jax.jit
        def eforce(params, c):
            e, g = jax.value_and_grad(
                lambda cc: fn(cc, sys_, params))(c)
            return e, -g

        # burn-in: the relay's FIRST measured program in a process pays
        # extra per-execution setup beyond the compile call (measured
        # 3-30x on the first chained loop); one throwaway loop clears it
        _chained_rate(eforce, params, coords, 3, reps=1)
        rate = _chained_rate(eforce, params, coords, 10)
        entry = {"force_calls_per_sec": round(rate, 2),
                 "ms_per_force_call": round(1e3 / rate, 1)}
        if name == "escn-md-pallas":       # production kernel only (the
            try:                           # xla fori compile costs minutes)
                # device-resident rate (fori_loop marginal): what engine
                # cycles see — the chained rate above additionally pays a
                # host->relay round trip (~4 ms) per call that on-device
                # optimizer loops do not
                entry["ms_per_force_call_device"] = round(
                    _device_loop_ms(fn, sys_, params, coords), 1)
            except Exception:
                pass
        try:
            ca = eforce.lower(params, coords).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            fl = float(ca.get("flops", 0.0))
            if fl:
                entry["cost_analysis_flops"] = fl
                entry["mfu_vs_v5e_bf16_peak"] = round(
                    fl * rate / V5E_PEAK_FLOPS, 4)
        except Exception:
            pass
        out[name] = entry
    # cost_analysis cannot see inside Pallas custom calls (the r4 first
    # capture reported 0.11% for the kernel path): the honest MFU for the
    # Pallas variant is the ALGORITHMIC flop count — the XLA variant's
    # cost_analysis of the same math — over the Pallas wall-clock
    xla_fl = out["escn-md-xla"].get("cost_analysis_flops")
    if xla_fl:
        out["escn-md-pallas"]["mfu_vs_v5e_bf16_peak"] = round(
            xla_fl * out["escn-md-pallas"]["force_calls_per_sec"]
            / V5E_PEAK_FLOPS, 4)
        out["escn-md-pallas"]["mfu_note"] = (
            "algorithmic flops from the XLA variant's cost_analysis "
            "(Pallas custom-call flops are invisible to cost_analysis)")
    # NOTE: no eSCN-GSM segment — the batched-string eSCN program compiles
    # ~35 min through the axon remote-compile relay (measured), far too
    # heavy for the driver-run bench. The eSCN per-call rate above times
    # the surrogate GSM's force-call count bounds the MEP wall-clock.
    out["speedup_pallas_vs_xla"] = round(
        out["escn-md-pallas"]["force_calls_per_sec"]
        / out["escn-md-xla"]["force_calls_per_sec"], 2)
    return out


def _escn_gsm_section(sys_, coords):
    """THE flagship BASELINE.json metric, measured for the first time in
    round 4: wall-clock to a converged GSM MEP on the ~300-atom cluster
    with the UMA-class eSCN backbone (VERDICT r3 item 2).

    Uses gsm_mep(loop="host"): the per-cycle jitted program is just the
    12-image batched force call plus a small epilogue, so the compile is
    seconds instead of the ~35-min batched-string while_loop program the
    round-2/3 benches had to skip. Host-loop and device-loop GSM produce
    identical trajectories (tests/test_gsm.py::test_gsm_host_loop_matches_device)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from pdb2reaction_tpu.engines.gsm import gsm_mep
    from pdb2reaction_tpu.mlip.escn import (ESCN_CONFIGS, make_escn_model,
                                            premerge_escn_params)

    cfg0 = dataclasses.replace(ESCN_CONFIGS["escn-md"],
                               edge_kernel="pallas-mega")
    fn, params, cfg = make_escn_model(cfg0, seed=0)
    params = premerge_escn_params(params, cfg)

    @jax.jit
    def eb_fn(coords_b):
        def one(c_bohr):
            e, g = jax.value_and_grad(
                lambda cc: fn(cc * BOHR2ANG, sys_, params))(c_bohr)
            f = -g * BOHR2ANG * EV2AU * sys_.free_mask[:, None]
            return e * EV2AU, f
        return jax.lax.map(one, coords_b, batch_size=1)

    # same endpoints as the surrogate GSM section: a frozen-mask-respecting
    # 0.08-Ang displacement of the 300-atom cluster
    rng = np.random.default_rng(1)
    disp = rng.normal(scale=0.08, size=np.asarray(coords).shape) \
        .astype(np.float32)
    disp *= np.asarray(sys_.free_mask)[:, None]
    xA = coords * 1.8897259886
    xB = (coords + disp) * 1.8897259886
    fm = jnp.asarray(sys_.free_mask)
    max_cycles = int(os.environ.get("PDB2R_BENCH_ESCN_GSM_MAXC", "300"))
    conv = 2.0e-2   # surrogate-calibrated criterion (untrained weights;
    #                 see _gsm_section docstring — trained weights: 1e-3)

    kw = dict(max_nodes=10, conv_perp_rms=conv, climb=False, loop="host")
    # warm through BOTH phases: growth for max_nodes=10 takes 5 cycles, so
    # max_cycles=8 guarantees at least one relax cycle runs and the relax
    # epilogue compiles here, not inside the measured wall-clock (the r4
    # first capture lost 4+ min to exactly that)
    t0 = time.perf_counter()
    gsm_mep(eb_fn, xA, xB, fm, max_cycles=8, stop_in_when_full=2, **kw)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = gsm_mep(eb_fn, xA, xB, fm, max_cycles=max_cycles,
                  stop_in_when_full=max_cycles, **kw)
    dt = time.perf_counter() - t0
    return {
        "escn_gsm_mep_wallclock_s": round(dt, 2),
        "converged": bool(res.converged),
        "final_perp_rms": float(res.perp_rms),
        "cycles": int(res.cycles),
        "force_calls": int(res.force_calls),
        "ms_per_force_call_in_mep": round(1e3 * dt / max(res.force_calls, 1), 1),
        "compile_plus_first_s": round(compile_s, 1),
        "criterion": f"perp-force RMS < {conv} Ha/Bohr (surrogate-"
                     "calibrated; untrained weights)",
        "note": "host-loop GSM, pallas-mega eSCN, 300-atom cluster — the "
                "BASELINE.json flagship wall-clock",
    }


def _device_loop_ms(fn, sys_, params, coords, n1=6, n2=18):
    """ms/force-call inside a device fori_loop (marginal between two loop
    lengths — excludes per-call host/relay latency AND defeats relay
    memoization since every iteration chains on the previous gradient)."""
    import time as _time

    import jax
    import jax.numpy as jnp  # noqa: F401

    def make(n):
        @jax.jit
        def run(p, c):
            def body(i, c):
                e, g = jax.value_and_grad(
                    lambda cc: fn(cc, sys_, p))(c)
                return c + 1e-9 * g
            return jax.lax.fori_loop(0, n, body, c)
        return run

    f1, f2 = make(n1), make(n2)
    for f in (f1, f2):
        jax.block_until_ready(f(params, coords))
        jax.block_until_ready(f(params, coords))
    ts = []
    for f in (f1, f2):
        t0 = _time.perf_counter()
        jax.block_until_ready(f(params, coords))
        ts.append(_time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (n2 - n1) * 1e3


def _escn_hessian_section():
    """Full 300-atom Hessian through the production eSCN calculator — the
    stage-4 cost unit (tsopt dimer seeding, freq, and each IRC
    hessian_recalc refresh consume exactly one of these; the reference's
    cost model is 1+6N serial force calls, uma_pysis.py:601,652-675).

    Runs in a subprocess with a hard timeout: on a persistent-cache hit
    the batched-FD program executes in ~35 s warm (measured v5e
    2026-08-19); on a cache miss the remote compile takes ~18 min, far
    over the bench budget — the timeout converts that into an explicit
    "skipped" marker instead of a hang."""
    import subprocess
    import sys as _sys

    # 900 s: both modes warm need ~620 s (analytic 211+132, FD 131+37,
    # plus process setup/premerge) — the global budget still clamps this
    budget = _sub_budget("PDB2R_BENCH_HESS_TIMEOUT", 900, floor=60)
    if budget <= 0:
        return {"skipped": "global budget exhausted before the Hessian "
                           "section (PDB2R_BENCH_BUDGET)"}
    code = r'''
import os, time, json, sys
import numpy as np
import pdb2reaction_tpu.workflows.common   # installs the compile cache
from pdb2reaction_tpu.core.structure import Structure
from pdb2reaction_tpu.mlip.uma import make_uma_calculator
# same construction as scripts/tpu_escn_hessian.py so the cached
# chunked-FD program (keyed on padded + chunk shapes only) is reused
rng = np.random.default_rng(0)
n = 300
zs = rng.choice([1, 6, 7, 8, 16], size=n, p=[0.45, 0.35, 0.08, 0.10, 0.02])
grid = int(np.ceil(n ** (1 / 3)))
pts = np.stack(np.meshgrid(*[np.arange(grid)] * 3), -1).reshape(-1, 3)
coords = pts[:n] * 1.8 + rng.normal(scale=0.15, size=(n, 3))
st = Structure(zs.astype(np.int32), coords)
cb = st.coords_bohr.reshape(-1)
# chunk 32 is the v5e-validated analytic operating point (187 s first /
# 129 s warm, no HBM exhaustion — 2026-08-20)
os.environ.setdefault("PDB2R_TPU_HVP_CHUNK", "32")
# default mode (auto -> Analytical: exact streamed-HVP chunks; see the
# routing comment in mlip/uma.py)
calc = make_uma_calculator(st, model="escn-md")
t0 = time.perf_counter()
H1 = calc.get_hessian(cb)["hessian"]
t_first = time.perf_counter() - t0
t0 = time.perf_counter()
H2 = calc.get_hessian(cb.copy() + 1e-5)["hessian"]
t_warm = time.perf_counter() - t0
out = {"first_call_s": round(t_first, 1),
       "warm_call_s": round(t_warm, 1),
       "mode": calc.hessian_calc_mode,
       "hvp_chunk": int(os.environ.get("PDB2R_TPU_HVP_CHUNK", "64")),
       "n_dof": int(H1.shape[0])}
# the default-mode record survives even if the FD attempt below dies
print(json.dumps(out)); sys.stdout.flush()
# explicit-FD fast path (the reference's own mode, uma_pysis.py:160):
# batched displacement chunks through the bf16 Pallas kernel — 3.5x
# faster warm, but carries the measured ~0.02 au bf16-noise floor
# (bf16 force error x 1/(2 eps)); recorded with parity vs analytic.
if not os.environ.get("PDB2R_BENCH_HESS_NO_FD"):
    try:
        calc_f = make_uma_calculator(st, model="escn-md",
                                     hessian_calc_mode="FiniteDifference")
        t0 = time.perf_counter()
        Hf = calc_f.get_hessian(cb)["hessian"]
        t_fd = time.perf_counter() - t0
        t0 = time.perf_counter()
        calc_f.get_hessian(cb.copy() + 1e-5)
        t_fd_warm = time.perf_counter() - t0
        out["fd"] = {
            "first_call_s": round(t_fd, 1),
            "warm_call_s": round(t_fd_warm, 1),
            "fd_chunk": int(os.environ.get("PDB2R_TPU_FD_CHUNK", "64")),
            "max_abs_dev_vs_analytic_au": float(np.abs(Hf - H1).max()),
            "note": "deviation = bf16-kernel force noise x 1/(2 eps), "
                    "not truncation (see mlip/uma.py routing comment)",
        }
    except Exception as e:
        out["fd"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps(out))
'''
    here = os.path.dirname(os.path.abspath(__file__))
    timed_out = False
    try:
        r = subprocess.run([_sys.executable, "-c", code],
                           capture_output=True, text=True, cwd=here,
                           timeout=budget)
        stdout, stderr, rc = r.stdout, r.stderr, r.returncode
    except subprocess.TimeoutExpired as e:
        # salvage whatever the worker already printed (the FD line lands
        # before the analytic attempt starts)
        stdout = e.stdout.decode() if isinstance(e.stdout, bytes) \
            else (e.stdout or "")
        stderr, rc, timed_out = "", 0, True
    lines = [l for l in (stdout or "").strip().splitlines()
             if l.strip().startswith("{")]
    if not lines:
        if timed_out:
            return {"skipped": f"timeout after {budget}s — "
                               "persistent-cache miss (chunked-FD program "
                               "compile through the relay; warm-cache "
                               "runs fit)"}
        return {"error": (stderr or "no output").strip()[-300:]}
    out = json.loads(lines[-1])
    if timed_out and "fd" not in out:
        out["fd"] = {"skipped": f"cut by the {budget}s section budget "
                                "after the analytic record"}
    if rc != 0:
        out["fd_worker_died"] = (stderr or "").strip()[-200:]
    out["note"] = ("default = exact analytic Hessian (3N HVP tangents "
                   "streamed as device-batched chunks through the f32 "
                   "XLA variant); 'fd' = the reference's central-"
                   "difference mode (1+6N displacements, device-batched "
                   "chunks through the bf16 Pallas kernel — the "
                   "reference runs them serially)")
    return out


def _cold_start_section():
    """Cross-process cold start (VERDICT r2 item 9): two fresh
    subprocesses jit the SAME flagship force program against a fresh
    persistent-cache dir (workflows/common.py installs the cache). The
    second process's first call should be a fraction of the first's —
    that is what a user's second `pdb2r all` invocation on a new host
    pays per program."""
    import os
    import subprocess
    import sys as _sys
    import tempfile

    budget = _sub_budget("PDB2R_BENCH_COLD_TIMEOUT", 600, floor=60)
    if budget <= 0:
        return {"skipped": "global budget exhausted before the cold-start "
                           "section (PDB2R_BENCH_BUDGET)"}

    code = r'''
import os, time, json
import pdb2reaction_tpu.workflows.common   # installs the compile cache
import jax, jax.numpy as jnp
from __graft_entry__ import _flagship_system
from pdb2reaction_tpu.mlip.model import make_model
sys_ = _flagship_system()
fn, params, cfg = make_model("uma-s-1p1", seed=0)
@jax.jit
def eforce(params, coords):
    e, g = jax.value_and_grad(lambda c: fn(c, sys_, params))(coords)
    return e, -g
c = jnp.asarray(sys_.coords, jnp.float32)
t0 = time.perf_counter()
e, f = eforce(params, c); f.block_until_ready()
print(json.dumps({"first_call_s": time.perf_counter() - t0}))
'''
    here = os.path.dirname(os.path.abspath(__file__))

    def run_one(env):
        r = subprocess.run([_sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, cwd=here,
                           timeout=max(min(budget, _remaining() - 10), 15))
        line = r.stdout.strip().splitlines()[-1]
        return json.loads(line)["first_call_s"]

    with tempfile.TemporaryDirectory() as td:
        env = dict(os.environ, PDB2R_TPU_CACHE=td)
        try:
            t_first = run_one(env)
        except subprocess.TimeoutExpired:
            return {"skipped": f"first-process compile exceeded {budget}s "
                               "(fresh-cache remote compile; raise "
                               "PDB2R_BENCH_COLD_TIMEOUT to measure)"}
        # the second (cache-hit) process measures init + cache read +
        # dispatch — all relay-latency-exposed. One relay spike inverted
        # the pair in a captured run (88.8 s vs 21.7), so take the min
        # of two attempts; a true cache miss is consistent, not spiky.
        t_second = run_one(env)
        if t_second > 0.5 * t_first and _remaining() > t_second + 20:
            t_second = min(t_second, run_one(env))
    return {"first_process_s": round(t_first, 2),
            "second_process_s": round(t_second, 2),
            "speedup": round(t_first / max(t_second, 1e-9), 2),
            "note": "same force program, fresh process each, persistent "
                    "XLA compilation cache (workflows/common.py)"}


def _workflow_units_section():
    """The SURVEY §6 benchmark configs not covered elsewhere: single-
    structure opt (LBFGS light + RFO heavy), a staged 1D scan, and the
    tsopt -> freq -> irc chain.

    opt/scan run the uma-s-1p1 surrogate on a 30-atom cluster at the
    reference's gau/gau_loose thresholds (convergence flag + cycles
    recorded — untrained weights make convergence probabilistic, the
    cost-per-cycle is the measured quantity). The TS chain runs on the
    analytic Morse H3 exchange (a real saddle at a physical force scale,
    same system as the gau-contract GSM section)."""
    import tempfile

    from pdb2reaction_tpu.core import io_xyz
    from pdb2reaction_tpu.core.structure import Structure

    out = {}
    td = tempfile.mkdtemp(prefix="bench_wf_")
    rng = np.random.default_rng(3)
    n = 30
    zs = rng.choice([1, 6, 7, 8], size=n, p=[0.5, 0.3, 0.1, 0.1])
    grid = int(np.ceil(n ** (1 / 3)))
    pts = np.stack(np.meshgrid(*[np.arange(grid)] * 3), -1).reshape(-1, 3)
    coords = pts[:n] * 1.6 + rng.normal(scale=0.1, size=(n, 3))
    st = Structure(zs.astype(np.int32), coords)
    xyz = os.path.join(td, "m.xyz")
    io_xyz.write_xyz(xyz, st)

    from pdb2reaction_tpu.workflows.opt import run_opt
    for mode in ("lbfgs", "rfo"):
        t0 = time.perf_counter()
        r = run_opt(xyz, charge=0, spin=1, opt_mode=mode, thresh="gau",
                    max_cycles=150, out_dir=os.path.join(td, f"o_{mode}"),
                    verbose=False)
        out[f"opt_{mode}"] = {
            "wallclock_s": round(time.perf_counter() - t0, 2),
            "converged": bool(r["converged"]), "cycles": int(r["cycles"]),
            "force_calls": int(r["force_calls"])}

    from pdb2reaction_tpu.workflows.scan import run_scan
    d0 = float(np.linalg.norm(st.coords[0] - st.coords[1]))
    t0 = time.perf_counter()
    r = run_scan(xyz, [[(0, 1, d0 + 0.3)]], charge=0, spin=1,
                 relax_max_cycles=60,
                 out_dir=os.path.join(td, "scan"), verbose=False)
    out["scan_1d"] = {"wallclock_s": round(time.perf_counter() - t0, 2),
                      "force_calls": int(r.get("force_calls", 0))}

    # tsopt -> freq -> irc chain on the Morse H3 saddle
    from pdb2reaction_tpu.workflows.tsopt import run_tsopt
    from pdb2reaction_tpu.workflows.freq import run_freq
    from pdb2reaction_tpu.workflows.irc import run_irc
    h3 = os.path.join(td, "h3.xyz")
    with open(h3, "w") as fh:
        fh.write("3\nguess\nH 0 0 0\nH 1.18 0 0\nH 2.4 0 0\n")
    t0 = time.perf_counter()
    ts = run_tsopt(h3, charge=0, spin=1, calc_mode="morse",
                   freeze_atoms=[0, 2], opt_mode="dimer",
                   out_dir=os.path.join(td, "ts"), verbose=False)
    t_ts = time.perf_counter() - t0
    ts_xyz = os.path.join(td, "ts", "final_geometry.xyz")
    t0 = time.perf_counter()
    run_freq(ts_xyz, charge=0, spin=1, calc_mode="morse",
             freeze_atoms=[0, 2], out_dir=os.path.join(td, "fr"),
             verbose=False)
    t_fr = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_irc(ts_xyz, charge=0, spin=1, calc_mode="morse",
            freeze_atoms=[0, 2], max_cycles=60,
            out_dir=os.path.join(td, "irc"), verbose=False)
    t_irc = time.perf_counter() - t0
    out["ts_chain_morse_h3"] = {
        "tsopt_s": round(t_ts, 2), "freq_s": round(t_fr, 2),
        "irc_s": round(t_irc, 2),
        "tsopt_converged": bool(ts.get("converged")),
        "n_imag": int(ts.get("n_imag", -1))}
    return out


def _all_pipeline_section():
    """`all`-pipeline wall-clock on the synthetic enzyme-like R/P pair
    (BASELINE.json config #5 / SURVEY §6: R/P PDBs → extract → recursive
    path search → tsopt → freq/thermo → diagrams), via
    scripts/tpu_all_e2e.py in a budget-clamped subprocess (VERDICT r4
    item 6).

    Surrogate weights (no UMA checkpoint in-image) — the measured quantity
    is pipeline wall-clock + per-phase force-call accounting at the
    reference's operating shape, not chemistry."""
    import subprocess
    import sys as _sys

    budget = _sub_budget("PDB2R_BENCH_ALL_TIMEOUT", 600, floor=90)
    if budget <= 0:
        return {"skipped": "global budget exhausted before the "
                           "all-pipeline section (PDB2R_BENCH_BUDGET)"}
    here = os.path.dirname(os.path.abspath(__file__))
    n_res = os.environ.get("PDB2R_BENCH_ALL_NRES", "24")
    # morse converges end-to-end (measured 341.8 s warm, 15 segments
    # through stage-4 tsopt); the untrained uma surrogate's random PES
    # legitimately trips the consecutive-kink abort in stage 2 (record
    # preserved 2026-08-20) — the MLIP per-force-call cost is measured by
    # the dedicated eSCN sections, so this section measures the full
    # ORCHESTRATION wall-clock. PDB2R_BENCH_ALL_CALC=uma to override.
    calc_mode = os.environ.get("PDB2R_BENCH_ALL_CALC", "morse")
    # FRESH out dir every run: a stale stage-2 checkpoint from a previous
    # run (different calc mode) otherwise hijacks the path-search resume
    # (observed 2026-08-20: the morse section timed out resuming an
    # aborted surrogate run's checkpoint from the shared /tmp dir)
    import tempfile
    out_dir = tempfile.mkdtemp(prefix="bench_all_e2e_")
    cmd = [_sys.executable, os.path.join(here, "scripts", "tpu_all_e2e.py"),
           "--model", "uma-s-1p1", "--calc-mode", calc_mode,
           "--n-res", n_res, "--tsopt-max-cycles", "60",
           "--out", out_dir]
    if calc_mode == "uma":
        # the surrogate's random PES makes every segment a kink — lift
        # the reference abort guard so the MLIP-shape pipeline completes
        cmd += ["--max-kinks", "99"]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, cwd=here,
                           timeout=budget)
    except subprocess.TimeoutExpired:
        return {"skipped": f"timeout after {budget}s (cold compile of the "
                           "pipeline programs; warm-cache runs fit)"}
    lines = [l for l in (r.stdout or "").strip().splitlines()
             if l.strip().startswith("{")]
    if r.returncode != 0 or not lines:
        return {"error": (r.stderr or "no output").strip()[-300:]}
    out = json.loads(lines[-1])
    out["note"] = ("full `all` pipeline (extract → path search → stage-4 "
                   "tsopt/freq) on a synthetic enzyme pocket, surrogate "
                   "uma-s-1p1 weights, warm persistent cache")
    return out


def _gsm_run(fn, params, sys_, coords, *, conv_rms, max_cycles, label):
    import jax
    import jax.numpy as jnp

    from pdb2reaction_tpu.engines.gsm import gsm_mep

    @jax.jit
    def eb_fn(coords_b):
        def one(c_bohr):
            e, g = jax.value_and_grad(
                lambda cc: fn(cc * BOHR2ANG, sys_, params))(c_bohr)
            f = -g * BOHR2ANG * EV2AU * sys_.free_mask[:, None]
            return e * EV2AU, f
        return jax.lax.map(one, coords_b, batch_size=1)

    rng = np.random.default_rng(1)
    disp = rng.normal(scale=0.08, size=np.asarray(coords).shape) \
        .astype(np.float32)
    disp *= np.asarray(sys_.free_mask)[:, None]
    xA = coords * 1.8897259886
    xB = (coords + disp) * 1.8897259886
    # warm the programs (compile excluded from the recorded wall-clock;
    # a production pipeline pays it once across all segments)
    gsm_mep(eb_fn, xA, xB, jnp.asarray(sys_.free_mask), max_nodes=10,
            max_cycles=2, stop_in_when_full=2, conv_perp_rms=conv_rms,
            climb=False)
    t0 = time.perf_counter()
    res = gsm_mep(eb_fn, xA, xB, jnp.asarray(sys_.free_mask),
                  max_nodes=10, max_cycles=max_cycles,
                  stop_in_when_full=max_cycles,
                  conv_perp_rms=conv_rms, climb=False)
    dt = time.perf_counter() - t0
    return {
        "label": label,
        "criterion": f"perp-force RMS < {conv_rms} Ha/Bohr",
        "wallclock_s": round(dt, 2),
        "converged": bool(res.converged),
        "final_perp_rms": float(res.perp_rms),
        "cycles": int(res.cycles),
        "force_calls": int(res.force_calls),
    }


def _gsm_section(fn, params, sys_, coords):
    """Surrogate-calibrated GSM (random-init weights produce O(2e-2 au)
    perp RMS at the relaxed string — ~20x a trained potential's
    landscape; with real converted weights drop to 1e-3)."""
    r = _gsm_run(fn, params, sys_, coords, conv_rms=2.0e-2,
                 max_cycles=800, label="uma-s surrogate, calibrated")
    return {"gsm_mep_wallclock_s": r["wallclock_s"],
            "gsm_mep_converged": r["converged"],
            "gsm_mep_final_perp_rms": r["final_perp_rms"],
            "gsm_mep_cycles": r["cycles"],
            "gsm_mep_force_calls": r["force_calls"],
            "gsm_conv_criterion": r["criterion"] + " (surrogate-"
                                  "calibrated; see bench.py)"}


def _gsm_matched_criteria(sys_, coords):
    """GSM wall-clock at the reference's ACTUAL convergence contract: gau
    rms_force 3.0e-4 Ha/Bohr (/root/reference/pdb2reaction/opt.py:176-187)
    on the analytic Morse backend — a real barrier crossing (the H3
    exchange double-well) whose force scale is physical (VERDICT r2
    item 6).

    Why not the 300-atom Morse cluster: a jittered 300-atom Morse glass
    has no well-conditioned MEP — linear initial strings cross steep
    repulsive walls and the perp-force RMS plateaus ~1e-1 au regardless
    of step policy (measured; pysisyphus would face the same PES
    pathology). The matched-criteria record therefore uses the
    well-conditioned reaction; the 300-atom wall-clock is recorded at the
    surrogate-calibrated criterion above."""
    import jax
    import jax.numpy as jnp

    from pdb2reaction_tpu.core.structure import Structure, pad_to
    from pdb2reaction_tpu.engines.gsm import gsm_mep
    from pdb2reaction_tpu.mlip import potentials

    L = 2.4
    stA = Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [0.686, 0, 0], [L, 0, 0]],
        freeze=[0, 2])
    sysp = pad_to(stA, multiple=8)
    morse = potentials.make_morse()

    @jax.jit
    def eb(cb):
        def one(c):
            e, g = jax.value_and_grad(
                lambda cc: morse(cc * BOHR2ANG, sysp))(c)
            return e * EV2AU, -g * BOHR2ANG * EV2AU \
                * sysp.free_mask[:, None]
        return jax.lax.map(one, cb, batch_size=1)

    A = np.zeros((sysp.n_pad, 3), np.float32)
    A[:3] = stA.coords
    B = A.copy()
    B[1, 0] = L - 0.686
    xa = jnp.asarray(A) * 1.8897259886
    xb = jnp.asarray(B) * 1.8897259886
    fm = jnp.asarray(sysp.free_mask)
    gsm_mep(eb, xa, xb, fm, max_nodes=10, max_cycles=2,
            stop_in_when_full=2, conv_perp_rms=3e-4, climb=True)
    t0 = time.perf_counter()
    r = gsm_mep(eb, xa, xb, fm, max_nodes=10, max_cycles=5000,
                stop_in_when_full=5000, conv_perp_rms=3e-4, climb=True)
    dt = time.perf_counter() - t0
    return {"gsm_gau_wallclock_s": round(dt, 3),
            "gsm_gau_converged": bool(r.converged),
            "gsm_gau_final_perp_rms": float(r.perp_rms),
            "gsm_gau_cycles": int(r.cycles),
            "gsm_gau_barrier_au": float(r.energies[r.hei_idx]
                                        - r.energies[0]),
            "gsm_gau_criterion": "perp-force RMS < 3.0e-4 Ha/Bohr with "
                                 "climbing image (the reference gau "
                                 "rms_force contract, opt.py:176-187; "
                                 "Morse H3 exchange barrier)"}


if __name__ == "__main__":
    main()
