"""eSCN (escn-md) full-Hessian wall-clock at 300 atoms: Analytical
(batched fwd-over-rev HVPs through the all-XLA variant — custom_vjp has
no forward mode) vs FiniteDifference (1+6N batched central-difference
force calls through the pallas-mega kernel, the reference's own method:
uma_pysis.py:601,652-675 with eps=1e-3 A).

Stage-4 cost driver: tsopt seeding, freq, and IRC each consume full
Hessians. Whichever mode wins here becomes the measured default for
pallas-kernel eSCN calculators.

Usage: [PDB2R_TPU_BATCH_CHUNK=c] python scripts/tpu_escn_hessian.py [modes]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax

from pdb2reaction_tpu.workflows.common import enable_compile_cache  # noqa: F401
print("devices:", jax.devices())
from pdb2reaction_tpu.core.structure import Structure
from pdb2reaction_tpu.mlip.uma import make_uma_calculator

rng = np.random.default_rng(0)
n = 300
zs = rng.choice([1, 6, 7, 8, 16], size=n, p=[0.45, 0.35, 0.08, 0.10, 0.02])
grid = int(np.ceil(n ** (1 / 3)))
pts = np.stack(np.meshgrid(*[np.arange(grid)] * 3), -1).reshape(-1, 3)
coords = pts[:n] * 1.8 + rng.normal(scale=0.15, size=(n, 3))
st = Structure(zs.astype(np.int32), coords)
cb = st.coords_bohr.reshape(-1)

modes = sys.argv[1:] or ["FiniteDifference", "Analytical"]
for mode in modes:
    calc = make_uma_calculator(st, model="escn-md", hessian_calc_mode=mode)
    t0 = time.perf_counter()
    H1 = calc.get_hessian(cb)["hessian"]
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    H2 = calc.get_hessian(cb.copy() + 1e-5)["hessian"]
    t_warm = time.perf_counter() - t0
    print(f"HESSIAN mode={mode} chunk="
          f"{os.environ.get('PDB2R_TPU_BATCH_CHUNK', '1')}: "
          f"first(+compile) {t_first:.1f}s, warm {t_warm:.1f}s; "
          f"|H|max {np.abs(H1).max():.3e}", flush=True)
    if mode == "FiniteDifference":
        Hf = H1
    elif "Hf" in dir():
        d = np.abs(H1 - Hf).max()
        print(f"  |H_analytic - H_fd|max = {d:.2e} au (fd eps=1e-3 A)",
              flush=True)
