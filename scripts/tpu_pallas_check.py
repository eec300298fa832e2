"""Retiled radial_contract kernel: TPU correctness + throughput vs XLA.

Run on the real TPU (PYTHONPATH incl. axon site). Checks, in order:
1. forward + both VJP gradients vs the jnp reference (P=256);
2. throughput of the fused kernel vs XLA dense einsum at P=1024/2048
   (fwd+bwd through a scalar loss, the product shape);
3. P=4096 run within HBM (the O(P^2 R) einsum would need ~3.4 GB per
   stream temp there).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from pdb2reaction_tpu.mlip.pallas_ops import (radial_contract_tpu,
                                              radial_contract_reference)

R = 24
CUT = 6.0


def setup(P, F, seed=0):
    rng = np.random.default_rng(seed)
    coords = jnp.asarray(rng.uniform(0, (P / 0.1) ** (1 / 3) * 1.2,
                                     (P, 3)), jnp.float32)
    mask = jnp.ones(P, jnp.float32)
    feats = jnp.asarray(rng.normal(size=(P, F)), jnp.float32)
    return coords, mask, feats


def check_correct():
    coords, mask, feats = setup(256, 128)
    for div_d in (False, True):
        T = radial_contract_tpu(coords, mask, feats, CUT, R, div_d)
        T0 = radial_contract_reference(coords, mask, feats, CUT, R, div_d)
        err = float(jnp.max(jnp.abs(T - T0)) / (jnp.max(jnp.abs(T0)) + 1e-30))
        def loss_k(c, f):
            return jnp.sum(jnp.sin(
                radial_contract_tpu(c, mask, f, CUT, R, div_d)))
        def loss_r(c, f):
            return jnp.sum(jnp.sin(
                radial_contract_reference(c, mask, f, CUT, R, div_d)))
        gk = jax.grad(loss_k, argnums=(0, 1))(coords, feats)
        gr = jax.grad(loss_r, argnums=(0, 1))(coords, feats)
        ec = float(jnp.max(jnp.abs(gk[0] - gr[0]))
                   / (jnp.max(jnp.abs(gr[0])) + 1e-30))
        ef = float(jnp.max(jnp.abs(gk[1] - gr[1]))
                   / (jnp.max(jnp.abs(gr[1])) + 1e-30))
        print(f"div_d={div_d}: fwd rel {err:.2e}, dcoords rel {ec:.2e}, "
              f"dfeats rel {ef:.2e}")
        assert err < 3e-4 and ec < 1e-3 and ef < 3e-4


def timeit(fn, *args, iters=10):
    o = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), o)
    return (time.perf_counter() - t0) / iters


def bench_vs_xla(P, F=384):
    coords, mask, feats = setup(P, F)

    @jax.jit
    def k_fwdbwd(c, f):
        def loss(c2, f2):
            return jnp.sum(jnp.sin(
                radial_contract_tpu(c2, mask, f2, CUT, R, False)))
        return jax.grad(loss, argnums=(0, 1))(c, f)

    @jax.jit
    def x_fwdbwd(c, f):
        def loss(c2, f2):
            return jnp.sum(jnp.sin(
                radial_contract_reference(c2, mask, f2, CUT, R, False)))
        return jax.grad(loss, argnums=(0, 1))(c, f)

    tk = timeit(k_fwdbwd, coords, feats)
    tx = timeit(x_fwdbwd, coords, feats)
    print(f"P={P} F={F}: pallas {tk*1e3:.1f} ms, xla-dense {tx*1e3:.1f} ms, "
          f"ratio xla/pallas = {tx/tk:.2f}x")
    return tk, tx


if __name__ == "__main__":
    print("devices:", jax.devices())
    check_correct()
    bench_vs_xla(1024)
    bench_vs_xla(2048)
    # P=4096: kernel must fit HBM (einsum reference would OOM/stress)
    coords, mask, feats = setup(4096, 384)
    @jax.jit
    def k4(c, f):
        def loss(c2, f2):
            return jnp.sum(radial_contract_tpu(c2, mask, f2, CUT, R, False))
        return jax.grad(loss, argnums=(0, 1))(c, f)
    t = timeit(k4, coords, feats, iters=3)
    print(f"P=4096 pallas fwd+bwd: {t*1e3:.1f} ms (fits HBM)")
