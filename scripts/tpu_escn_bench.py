"""eSCN-MoE backbone throughput at 300 atoms on one v5e."""
import time
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices())
from __graft_entry__ import _flagship_system
from pdb2reaction_tpu.mlip.escn import ESCN_CONFIGS, make_escn_model

sys_ = _flagship_system()

for name in ("escn-s", "escn-md"):
    fn, params, cfg = make_escn_model(name, seed=0)

    @jax.jit
    def eforce(params, coords):
        e, g = jax.value_and_grad(lambda c: fn(c, sys_, params))(coords)
        return e, -g

    coords = jnp.asarray(sys_.coords, jnp.float32)
    t0 = time.perf_counter()
    e, f = eforce(params, coords)
    e.block_until_ready()
    t_compile = time.perf_counter() - t0
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        e, f = eforce(params, coords)
    e.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name} (lmax={cfg.lmax}, mmax={cfg.mmax}, C={cfg.sphere_channels}, "
          f"L={cfg.num_layers}, E={cfg.num_experts}): "
          f"{dt*1e3:.1f} ms/force-call ({1/dt:.1f}/s), compile {t_compile:.0f} s")

    B = 8
    @jax.jit
    def eforce_batch(params, cb):
        def one(c):
            e, g = jax.value_and_grad(lambda cc: fn(cc, sys_, params))(c)
            return e, -g
        return jax.lax.map(one, cb, batch_size=1)
    batch = jnp.asarray(np.asarray(coords)[None]
                        + 0.01 * np.random.default_rng(0).normal(
                            size=(B,) + coords.shape).astype(np.float32))
    eb, fb = eforce_batch(params, batch)
    eb.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        eb, fb = eforce_batch(params, batch)
    eb.block_until_ready()
    dt = (time.perf_counter() - t0) / 5
    print(f"  batch {B}: {dt*1e3:.1f} ms -> {B/dt:.1f} calls/s")
