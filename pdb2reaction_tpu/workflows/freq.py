"""Vibrational analysis + thermochemistry driver (`freq` subcommand).

Capability match: /root/reference/pdb2reaction/freq.py — Hessian (analytic
default here; batched FD alternative), PHVA with freeze links, frequency
table ``frequencies_cm-1.txt``, mode animations, and a Gaussian-style
QRRHO thermochemistry block -> ``thermoanalysis.yaml`` (freq.py:758-859).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import numpy as np
import yaml

from ..engines.vib import frequencies_and_modes, mode_animation_frames
from ..engines.thermo import thermochemistry
from ..core import io_xyz
from . import common
from .config import format_elapsed


def write_vib_outputs(out_dir, struct, vib, th, *, max_write_modes=10,
                      amplitude_ang=0.3, n_frames=20,
                      sort_modes="value"):
    """Write the freq output tree — frequencies_cm-1.txt, mode animation
    .trj files, thermoanalysis.yaml — shared by the freq driver and
    stage 4 of ``all`` (the reference runs the freq CLI per stationary
    point, all.py:1297-1374, so every state gets this tree).

    ``struct.coords`` must be in Angstrom. Returns the written paths,
    frequencies file first."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    freq_txt = out / "frequencies_cm-1.txt"
    freq_txt.write_text("\n".join(f"{f:12.4f}" for f in vib.freqs_cm)
                        + "\n")

    # mode animations for the lowest n modes (freq.py:742-757); --sort abs
    # orders by |frequency| instead of signed value
    order = np.argsort(np.abs(vib.freqs_cm) if sort_modes == "abs"
                       else vib.freqs_cm)
    wrote = []
    for rank, k in enumerate(order[:max_write_modes]):
        frames = mode_animation_frames(struct.coords, vib.modes_cart[k],
                                       amplitude_ang, n_frames)
        trj = out / f"mode_{rank:03d}_{vib.freqs_cm[k]:.1f}cm-1.trj"
        io_xyz.write_trj(trj, [struct.copy(coords=f) for f in frames])
        wrote.append(trj)

    (out / "thermoanalysis.yaml").write_text(
        yaml.safe_dump(th.as_dict(), sort_keys=False))
    return [freq_txt] + wrote


def run_freq(
    input_path,
    *,
    charge: Optional[int] = None,
    spin: Optional[int] = None,
    freeze_atoms: Sequence = (),
    auto_freeze_links: bool = True,
    calc_mode: str = "uma",
    model: str = "uma-s-1p1",
    hessian_calc_mode: str = "auto",
    temperature: float = 298.15,
    pressure: float = 101325.0,
    max_write_modes: int = 10,
    amplitude_ang: float = 0.3,
    n_frames: int = 20,
    sort_modes: str = "value",   # "value" | "abs" (reference freq --sort)
    out_dir="./result_freq/",
    mesh=None,
    verbose: bool = True,
    **calc_kw,
) -> Dict[str, Any]:
    t0 = time.time()
    struct = common.load_structure(input_path)
    q, s = common.resolve_charge_spin(struct, charge, spin)
    freeze = common.merge_freeze(struct, [common.resolve_atom_spec(f, struct)
                                          for f in freeze_atoms],
                                 auto_freeze_links)
    struct.freeze = freeze
    calc = common.make_calculator(struct, calc_mode=calc_mode, charge=q,
                                  spin=s, freeze_atoms=freeze, model=model,
                                  hessian_calc_mode=hessian_calc_mode,
                                  mesh=mesh, **calc_kw)
    if verbose:
        from .config import pretty_block
        print(pretty_block("freq", {
            "temperature": temperature, "pressure": pressure,
            "max_write": max_write_modes, "amplitude_ang": amplitude_ang,
            "n_frames": n_frames, "sort": sort_modes, "charge": q,
            "spin": s, "hessian_calc_mode": hessian_calc_mode,
            "calc_mode": calc_mode, "model": model}))
    x = struct.coords_bohr.reshape(-1)
    res = calc.get_hessian(x)
    H = res["hessian"]
    e0 = res["energy"]
    vib = frequencies_and_modes(H, struct.numbers, struct.coords_bohr,
                                freeze_idx=freeze)

    th = thermochemistry(vib.freqs_cm, struct.numbers, struct.coords,
                         electronic_energy=e0, T=temperature,
                         pressure=pressure, multiplicity=s)
    outputs = write_vib_outputs(out_dir, struct, vib, th,
                                max_write_modes=max_write_modes,
                                amplitude_ang=amplitude_ang,
                                n_frames=n_frames, sort_modes=sort_modes)
    out = Path(out_dir)
    freq_txt, wrote = outputs[0], outputs[1:]

    if verbose:
        n_imag = int((vib.freqs_cm < 0).sum())
        print(f"[freq] {len(vib.freqs_cm)} modes, {n_imag} imaginary; "
              f"ZPE = {th.zpe:.6f} Ha, G = {th.gibbs:.8f} Ha")
        print(f"[freq] elapsed {format_elapsed(t0)}")
    return {"freqs_cm": vib.freqs_cm, "modes_cart": vib.modes_cart,
            "thermo": th, "energy": e0, "hessian": H,
            "outputs": [freq_txt] + wrote, "structure": struct,
            "calculator": calc}
