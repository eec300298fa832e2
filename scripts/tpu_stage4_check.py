"""Stage-4 chain timings at 300 atoms on one v5e with the round-2 device
loops, 1:1 comparable to the round-1 hardware record (STATUS.md: IRC
15 cycles both branches = 50.7 s; dimer cycles were host-synced)."""
import time
import numpy as np
import jax

print("devices:", jax.devices())
from __graft_entry__ import _flagship_system
from pdb2reaction_tpu.core.structure import Structure
from pdb2reaction_tpu.mlip.uma import make_uma_calculator
from pdb2reaction_tpu.engines.dimer import make_dimer_pass, DIMER_KW
from pdb2reaction_tpu.engines.irc import eulerpc_irc
from pdb2reaction_tpu.engines.thresholds import get_thresholds
import jax.numpy as jnp

sysp = _flagship_system()
st = Structure(np.asarray(sysp.numbers)[:300], np.asarray(sysp.coords)[:300])
calc = make_uma_calculator(st, model="uma-s-1p1", charge=0, spin=1)

x0 = calc.pad_bohr(st.coords_bohr)

# --- dimer pass: 30 translation cycles incl. rotations, ONE device program
run = make_dimer_pass(calc.au_energy_force_fn_p(), get_thresholds("never"),
                      DIMER_KW, False, 0.3)
N0 = np.zeros(x0.size); N0[0] = 1.0
N0 = jnp.asarray(N0 / np.linalg.norm(N0))
fm = jnp.asarray(np.repeat(np.asarray(calc.system.free_mask) > 0,
                           3).astype(float))
t0 = time.perf_counter()
stt = run(jnp.asarray(np.asarray(x0).reshape(-1)), N0, fm, calc.pack(),
          jnp.asarray(30))
int(stt.cycle)
t_compile = time.perf_counter() - t0
t0 = time.perf_counter()
stt = run(jnp.asarray(np.asarray(x0).reshape(-1)), N0, fm, calc.pack(),
          jnp.asarray(30))
calls = int(stt.calls)
t_dimer = time.perf_counter() - t0
print(f"dimer pass: 30 cycles ({calls} force calls) in {t_dimer:.2f} s warm "
      f"(compile {t_compile:.1f} s) -> {t_dimer/30*1000:.0f} ms/cycle")

# --- IRC: 15 macro cycles both branches (round-1 record: 50.7 s)
t0 = time.perf_counter()
res = eulerpc_irc(calc, x0, step_length=0.10, max_cycles=15,
                  rms_grad_thresh=1e-9)
t_irc_cold = time.perf_counter() - t0
t0 = time.perf_counter()
res = eulerpc_irc(calc, x0, step_length=0.10, max_cycles=15,
                  rms_grad_thresh=1e-9)
t_irc = time.perf_counter() - t0
nf = len(res.forward.coords) if res.forward else 0
nb = len(res.backward.coords) if res.backward else 0
print(f"irc: fwd {nf} + bwd {nb} cycles in {t_irc:.2f} s warm "
      f"(cold incl. Hessian+compile {t_irc_cold:.1f} s) "
      f"[round-1: 50.7 s]")
