"""Marginal device cost of a full escn-md force call: N chained force
calls inside ONE jitted fori_loop (how every production optimizer loop
runs it). Marginal = (t(N2)-t(N1))/(N2-N1) — relay dispatch overhead and
result download are paid once per program, not per call."""
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_system
from pdb2reaction_tpu.mlip.escn import ESCN_CONFIGS, make_escn_model

print("devices:", jax.devices())
sys_ = _flagship_system()
coords0 = jnp.asarray(sys_.coords, jnp.float32)

N1, N2 = 4, 12

for kname in sys.argv[1:] or ("pallas-mega",):
    cfg = dataclasses.replace(ESCN_CONFIGS["escn-md"], edge_kernel=kname)
    fn, params, cfg = make_escn_model(cfg, seed=0)

    def make_loop(n):
        @jax.jit
        def run(p, c):
            def body(i, c):
                e, g = jax.value_and_grad(
                    lambda cc: fn(cc, sys_, p))(c)
                return c - 1e-6 * g
            return jax.lax.fori_loop(0, n, body, c)
        return run

    f1, f2 = make_loop(N1), make_loop(N2)
    for f in (f1, f2):
        jax.block_until_ready(f(params, coords0))
        jax.block_until_ready(f(params, coords0))
    ts = []
    for f, n in ((f1, N1), (f2, N2)):
        t0 = time.perf_counter()
        jax.block_until_ready(f(params, coords0))
        ts.append(time.perf_counter() - t0)
    ms = (ts[1] - ts[0]) / (N2 - N1) * 1e3
    print(f"{kname}: {ms:.2f} ms/force-call marginal "
          f"({1e3/ms:.1f}/s; totals {ts[0]*1e3:.1f} / {ts[1]*1e3:.1f} ms; "
          f"fixed ~{ts[0]*1e3 - N1*ms:.1f} ms/dispatch)")
