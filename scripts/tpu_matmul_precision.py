"""f32 matmul precision ladder on v5e, at the surrogate dense-path shape.

The PaiNN-class surrogate's radial contractions are f32 einsums
([P*(R+1), P] x [P, 2048] per layer, model.py:309-330). JAX's default
f32 dot on TPU lowers to HIGHEST (six bf16 passes, ~197/6 = 33 TF/s
ceiling) — BENCH_builder_r4 measured the whole force call at 31 TF/s,
i.e. ~95% of that ceiling. This script measures the same-shape matmul at
each precision so the 'high' (three-pass, ~66 TF/s ceiling, ~1e-7
relative error) option can be weighed for the production default.
"""
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

P, R1, CC = 320, 25, 2048
rng = np.random.default_rng(0)
A = jnp.asarray(rng.normal(size=(P * R1, P)) * 0.1, jnp.float32)
B = jnp.asarray(rng.normal(size=(P, CC)) * 0.1, jnp.float32)
flops = 2 * P * R1 * P * CC


def make(prec, dtype=jnp.float32):
    def mk(n):
        @jax.jit
        def run(b0):
            def body(i, b):
                o = jax.lax.dot_general(
                    A.astype(dtype), b.astype(dtype),
                    (((1,), (0,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32)
                return b + (1e-6 * o[:P, :]).astype(b.dtype)
            return jax.lax.fori_loop(0, n, body, b0)
        return run
    return mk


for tag, prec, dt in [
    ("f32 DEFAULT", None, jnp.float32),
    ("f32 HIGH (bf16_3x)", jax.lax.Precision.HIGH, jnp.float32),
    ("f32 HIGHEST (bf16_6x)", jax.lax.Precision.HIGHEST, jnp.float32),
    ("bf16 1-pass", None, jnp.bfloat16),
]:
    ms = static_marginal(tag, make(prec, dt), B)
    print(f"   -> {flops / (ms * 1e-3) / 1e12:.1f} TF/s effective")

# numeric error ladder vs f64 on this shape
A64 = np.asarray(A, np.float64)
B64 = np.asarray(B, np.float64)
ref = A64 @ B64
for tag, prec, dt in [
    ("DEFAULT", None, jnp.float32),
    ("HIGH", jax.lax.Precision.HIGH, jnp.float32),
    ("HIGHEST", jax.lax.Precision.HIGHEST, jnp.float32),
    ("bf16", None, jnp.bfloat16),
]:
    o = jax.lax.dot_general(A.astype(dt), B.astype(dt),
                            (((1,), (0,)), ((), ())), precision=prec,
                            preferred_element_type=jnp.float32)
    err = np.max(np.abs(np.asarray(o, np.float64) - ref)) / \
        np.max(np.abs(ref))
    print(f"precision {tag:8s} max rel err vs f64: {err:.2e}")
