"""Benchmark: MLIP force-call throughput on a ~300-atom cluster.

Matches BASELINE.json's metric ("force-calls/sec ... on a ~300-atom
cluster"). The reference publishes no numbers (BASELINE.md); as the interim
denominator we use 20 force-calls/sec — the order of magnitude of
single-A100 UMA-small force calls on a 300-atom pocket with per-call host
graph rebuilds (the reference's serial path, uma_pysis.py:292-327). The
reference-side number must eventually be measured, not assumed; this
constant is documented so the comparison is transparent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_FORCECALLS_PER_SEC = 20.0


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_system
    from pdb2reaction_tpu.mlip.model import make_model

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
        return jax.vmap(one)(coords_b)

    coords = jnp.asarray(sys_.coords, jnp.float32)
    batch = jnp.asarray(
        np.asarray(coords)[None] + 0.01 * np.random.default_rng(0)
        .normal(size=(B,) + coords.shape).astype(np.float32))

    # warmup / compile
    e, f = eforce(params, coords)
    e.block_until_ready()
    eb, fb = eforce_batch(params, batch)
    eb.block_until_ready()

    # measure batched throughput (the framework's operating mode: all hot
    # loops feed batched force evaluations). f32, dense-adjacency MXU path.
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        eb, fb = eforce_batch(params, batch)
    eb.block_until_ready()
    dt = time.perf_counter() - t0
    calls_per_sec = iters * B / dt

    print(json.dumps({
        "metric": "mlip_force_calls_per_sec_300atom",
        "value": round(calls_per_sec, 2),
        "unit": "force-calls/sec",
        "vs_baseline": round(calls_per_sec / REFERENCE_FORCECALLS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
