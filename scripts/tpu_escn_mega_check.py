"""Measure escn-md chained force-call rate: pallas-mega (staged one-hots)
+ premerged MoLE vs XLA edge chain. Chained inputs defeat relay memoization
(bench.py docstring)."""
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices())
from __graft_entry__ import _flagship_system
from pdb2reaction_tpu.mlip.escn import (ESCN_CONFIGS, make_escn_model,
                                        premerge_escn_params)

sys_ = _flagship_system()
coords = jnp.asarray(sys_.coords, jnp.float32)


def chained(eforce, params, iters=10):
    c = coords
    e, f = eforce(params, c)
    f.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        c = c + 1e-6 * f
        e, f = eforce(params, c)
    f.block_until_ready()
    return (time.perf_counter() - t0) / iters


import os
CONFIGS = {
    "quick": [("mega+premerge", "pallas-mega", True),
              ("pallas+premerge", "pallas", True)],
    "full": [("mega+premerge", "pallas-mega", True),
             ("mega", "pallas-mega", False),
             ("pallas+premerge", "pallas", True),
             ("xla+premerge", None, True)],
}[os.environ.get("MEGA_CHECK_SET", "quick")]

for label, ek, pre in CONFIGS:
    cfg = ESCN_CONFIGS["escn-md"]
    if ek is not None:
        cfg = dataclasses.replace(cfg, edge_kernel=ek)
    fn, params, cfg = make_escn_model(cfg, seed=0)
    if pre:
        params = premerge_escn_params(params, cfg)

    @jax.jit
    def eforce(params, c):
        e, g = jax.value_and_grad(lambda cc: fn(cc, sys_, params))(c)
        return e, -g

    t0 = time.perf_counter()
    e, f = eforce(params, coords)
    f.block_until_ready()
    print(f"{label}: compile {time.perf_counter()-t0:.0f}s, "
          f"E={float(e):+.4f}", flush=True)
    chained(eforce, params, 3)   # burn-in
    dt = chained(eforce, params, 10)
    print(f"{label}: {dt*1e3:.1f} ms/force-call ({1/dt:.1f}/s)", flush=True)
