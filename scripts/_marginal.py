"""Shared fori_loop-marginal timing helper for the TPU microbench scripts.

ONE compiled program per measured quantity: the fori_loop trip count is a
TRACED scalar (jnp.int32), so both loop lengths run the same executable —
halving the number of multi-minute relay compiles vs the old
make_loop(N1)/make_loop(N2) pair. Marginal cost still cancels relay
per-dispatch latency; min-of-reps with DISTINCT pre-staged inputs defeats
both the relay's additive latency spikes and its memoization of identical
(program, args) executions (see bench.py docstring)."""
import time

import jax
import jax.numpy as jnp

N1, N2 = 4, 16


def dyn_marginal(tag, run, arg, perturb=None, n1=N1, n2=N2, reps=8,
                 suffix=""):
    """run(n, arg) must be ONE jitted fn with fori_loop(0, n, ...) where n
    is the traced trip count. perturb(arg, r) -> distinct input per rep
    (default: additive 1e-6*r)."""
    if perturb is None:
        def perturb(a, r):
            return a + jnp.asarray(1e-6 * r, a.dtype)
    args = [jax.block_until_ready(perturb(arg, r)) for r in range(reps)]
    ns = (jnp.int32(n1), jnp.int32(n2))
    for n in ns:
        jax.block_until_ready(run(n, arg))
        jax.block_until_ready(run(n, arg))
    ts = []
    for n in ns:
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(n, args[r]))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    ms = (ts[1] - ts[0]) / (n2 - n1) * 1e3
    print(f"{tag:34s} {ms:7.2f} ms/iter{suffix}", flush=True)
    return ms
