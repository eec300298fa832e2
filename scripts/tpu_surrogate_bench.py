"""Surrogate (uma-s-1p1) force-call timing on v5e: on-device fori
marginal for one 300-atom force call + the bench.py-style chained
B=64 batched rate. Round-4d: measures the fused (j,r)-contraction
rewrite of energy_fn_dense (model.py layer()) against the recorded
two-einsum numbers (BENCH_builder_r4: 248.7 calls/s batched, 4.02
ms/image)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from pdb2reaction_tpu.workflows.common import enable_compile_cache  # noqa: F401
from _marginal import static_marginal

print("devices:", jax.devices())

from __graft_entry__ import _flagship_system
from pdb2reaction_tpu.mlip.model import make_model

sys_ = _flagship_system()
fn, params, cfg = make_model("uma-s-1p1", seed=0)
coords = jnp.asarray(sys_.coords, jnp.float32)


def make_single(n):
    @jax.jit
    def run(c0):
        def body(i, c):
            e, g = jax.value_and_grad(lambda cc: fn(cc, sys_, params))(c)
            return c - 1e-6 * g
        return jax.lax.fori_loop(0, n, body, c0)
    return run


ms = static_marginal("surrogate force call (device)", make_single, coords)
print(f"   -> {1000.0 / ms:.1f} calls/s on-device")

B = 64


@jax.jit
def eforce_batch(params, coords_b):
    def one(c):
        e, g = jax.value_and_grad(lambda cc: fn(cc, sys_, params))(c)
        return e, -g
    return jax.lax.map(one, coords_b, batch_size=1)


batch = jnp.asarray(np.asarray(coords)[None]
                    + 0.01 * np.random.default_rng(0)
                    .normal(size=(B,) + coords.shape).astype(np.float32))
t0 = time.perf_counter()
eb, fb = eforce_batch(params, batch)
fb.block_until_ready()
print(f"  [batched B={B}] compile+first {time.perf_counter()-t0:.1f}s")

# chained rate the way bench.py measures it (includes relay dispatch +
# batch transfer per execution) — min of 3 sweeps to tame relay spikes
best = float("inf")
for rep in range(3):
    bt = batch + 1e-5 * rep
    eb, fb = eforce_batch(params, bt)
    fb.block_until_ready()
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        bt = bt + 1e-6 * fb
        eb, fb = eforce_batch(params, bt)
    fb.block_until_ready()
    best = min(best, (time.perf_counter() - t0) / (iters * B))
print(f"batched chained rate: {1.0/best:.1f} calls/s "
      f"({best*1e3:.2f} ms/image incl. per-execution relay overhead)")


# batched program ON-DEVICE marginal (separates compute from the relay's
# per-execution dispatch + transfer), swept over the lax.map chunk
# (vectorization width; calculator.py PDB2R_TPU_BATCH_CHUNK)
import os

for chunk in [int(c) for c in
              os.environ.get("PDB2R_SURRO_CHUNKS", "1,4,16").split(",")]:

    @jax.jit
    def eforce_chunked(params, coords_b, _chunk=chunk):
        def one(c):
            e, g = jax.value_and_grad(lambda cc: fn(cc, sys_, params))(c)
            return e, -g
        return jax.lax.map(one, coords_b, batch_size=_chunk)

    def make_batched(n, _f=eforce_chunked):
        @jax.jit
        def run(b0):
            def body(i, b):
                e, f = _f(params, b)
                return b + 1e-6 * f
            return jax.lax.fori_loop(0, n, body, b0)
        return run

    ms = static_marginal(f"batched B=64 chunk={chunk} (device)",
                         make_batched, batch, n1=1, n2=4, reps=4)
    print(f"   -> {B * 1000.0 / ms:.1f} calls/s on-device "
          f"({ms / B:.2f} ms/image)")
