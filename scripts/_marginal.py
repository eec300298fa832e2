"""Shared fori_loop-marginal timing helper for the TPU microbench scripts.

Two compiled programs per measured quantity (STATIC trip counts n1/n2,
like bench._device_loop_ms): the traced-trip-count variant (one
executable, `lax.fori_loop(0, n_traced, ...)`) looked cheaper but its
relay remote-compile ran >28 min without finishing (2026-08-19) where the
static-bound pair compiles in minutes — a dynamic trip count demotes the
loop to a fully dynamic while on the relay path. Marginal cost between
the two lengths cancels relay per-dispatch latency; min-of-reps with
DISTINCT pre-staged inputs defeats both the relay's additive latency
spikes and its memoization of identical (program, args) executions (see
bench.py docstring)."""
import faulthandler
import sys
import time

import jax
import jax.numpy as jnp

# if a remote compile wedges, show where every 10 min instead of dying
# silently inside a timeout(1)
faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)

N1, N2 = 4, 16


def static_marginal(tag, make_run, arg, perturb=None, n1=N1, n2=N2,
                    reps=8, suffix=""):
    """make_run(n) -> jitted fn(arg) running a fori_loop(0, n, ...) with
    the STATIC trip count n baked in. perturb(arg, r) -> distinct input
    per rep (default: additive 1e-6*r)."""
    if perturb is None:
        def perturb(a, r):
            return a + jnp.asarray(1e-6 * r, a.dtype)
    args = [jax.block_until_ready(perturb(arg, r)) for r in range(reps)]
    runs = []
    for n in (n1, n2):
        t0 = time.perf_counter()
        run = make_run(n)
        jax.block_until_ready(run(arg))
        print(f"  [{tag}] n={n} compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        jax.block_until_ready(run(arg))
        runs.append(run)
    ts = []
    for run in runs:
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(args[r]))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    ms = (ts[1] - ts[0]) / (n2 - n1) * 1e3
    print(f"{tag:34s} {ms:7.2f} ms/iter{suffix}", flush=True)
    return ms


def dyn_marginal(tag, run, arg, perturb=None, n1=N1, n2=N2, reps=8,
                 suffix=""):
    """Traced-trip-count variant — kept for CPU-backend use only; on the
    axon relay its single program never finished compiling (see module
    docstring)."""
    return static_marginal(
        tag, lambda n: (lambda a: run(jnp.int32(n), a)), arg,
        perturb=perturb, n1=n1, n2=n2, reps=reps, suffix=suffix)
