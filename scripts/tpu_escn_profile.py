"""Break down the escn-md force-call time on v5e: fwd vs fwd+bwd,
per-piece timings with chained inputs (the relay memoizes identical
executions), and counted HLO bytes."""
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_system
from pdb2reaction_tpu.mlip.escn import ESCN_CONFIGS, make_escn_model

print("devices:", jax.devices())
sys_ = _flagship_system()
coords0 = jnp.asarray(sys_.coords, jnp.float32)


def chained(f, c, iters=10, out_is_force=True):
    o = f(c)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        dc = (o[1] if isinstance(o, tuple) else o)
        if dc.shape != c.shape:
            dc = jnp.zeros_like(c) + jnp.sum(dc) * 1e-12
        c = c + 1e-6 * dc
        o = f(c)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def report(tag, f, c, lowered=None):
    ms = chained(f, c, 3)   # burn-in
    ms = chained(f, c, 10)
    try:
        comp = lowered(c).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        gb = float(ca.get("bytes accessed", 0.0)) / 1e9
        fl = float(ca.get("flops", 0.0)) / 1e12
        print(f"{tag:34s} {ms:7.1f} ms   {gb:6.2f} GB  {fl:6.2f} Tf "
              f"-> {gb/ms*1e3:6.0f} GB/s  {fl/ms*1e3:6.1f} Tf/s")
    except Exception as e:
        print(f"{tag:34s} {ms:7.1f} ms   (cost analysis failed: {e})")
    return ms


import sys as _sys

for kname in _sys.argv[1:] or ("pallas-mega",):
    cfg = dataclasses.replace(ESCN_CONFIGS["escn-md"], edge_kernel=kname)
    fn, params, cfg = make_escn_model(cfg, seed=0)

    @jax.jit
    def eonly(p, c):
        return fn(c, sys_, p)

    @jax.jit
    def eforce(p, c):
        e, g = jax.value_and_grad(lambda cc: fn(cc, sys_, p))(c)
        return e, -g

    import functools
    print(f"--- {kname} ---")
    report("forward only", functools.partial(eonly, params), coords0,
           lowered=lambda c: eonly.lower(params, c))
    report("forward+backward (force call)",
           functools.partial(eforce, params), coords0,
           lowered=lambda c: eforce.lower(params, c))
