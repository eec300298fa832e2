"""Single-structure geometry optimization driver (`opt` subcommand).

Capability match: /root/reference/pdb2reaction/opt.py — LBFGS ("light") or
RFO ("heavy") minimization with threshold presets, optional harmonic
distance restraints (``--bias``-style pairs) and ``--dist-freeze``
restraints, freeze-link auto-detection, XYZ/PDB/GJF output mirroring, exit
conventions (converged flag in the result instead of exit codes; the CLI
maps them, cli.py).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..engines.lbfgs import lbfgs_minimize
from ..engines.rfo import rfo_optimize
from ..engines.bias import (make_biased_energy_fn, bias_params,
                            dist_freeze_pairs)
from ..mlip.calculator import Calculator
from . import common
from .config import normalize_choice, format_elapsed

OPT_MODES = ("lbfgs", "rfo")


def optimize_structure(
    struct,
    calc: Calculator,
    *,
    opt_mode: str = "lbfgs",
    coord_type: str = "cart",
    thresh: str = "gau",
    max_cycles: int = 10000,
    max_step_lbfgs: float = 0.30,
    trust_radius: float = 0.10,
    callback=None,
    **engine_kw,
):
    """Library entry: minimize with a prepared calculator; returns
    (coords_bohr [N,3], energy, converged, cycles)."""
    x0 = calc.pad_bohr(struct.coords_bohr)
    fn = calc.au_energy_force_fn()
    if coord_type == "dlc":
        # delocalized internals (reference opt.py:43 coord_type="dlc");
        # frozen atoms run constrained delocalization (engines/dlc.py)
        from ..engines.dlc import dlc_lbfgs_minimize
        res = dlc_lbfgs_minimize(
            calc.au_energy_force_fn_p(), x0, struct.numbers,
            calc.n_atoms, params=calc.pack(), freeze=struct.freeze,
            thresh=thresh, max_cycles=max_cycles, **engine_kw)
        calc.force_calls += int(res.cycles) + 1
        coords = calc.unpad(res.x)
        return coords, float(res.e), bool(res.converged), int(res.cycles)
    if opt_mode == "rfo":
        H0 = calc.get_hessian(struct.coords_bohr.reshape(-1))["hessian"]
        res = rfo_optimize(calc.au_energy_force_fn_p(), x0,
                           calc.system.free_mask, calc.n_atoms,
                           params=calc.pack(),
                           hessian0=H0, thresh=thresh,
                           max_cycles=max_cycles,
                           trust_radius=trust_radius,
                           callback=callback, **engine_kw)
        coords = calc.unpad(res.x)
        return coords, float(res.e), bool(res.converged), int(res.cycles)
    res = lbfgs_minimize(fn, x0, calc.system.free_mask, thresh=thresh,
                         max_cycles=max_cycles, max_step=max_step_lbfgs,
                         callback=callback, **engine_kw)
    coords = calc.unpad(res.x)
    return coords, float(res.e), bool(res.converged), int(res.cycles)


def run_opt(
    input_path,
    *,
    charge: Optional[int] = None,
    spin: Optional[int] = None,
    opt_mode: str = "lbfgs",
    coord_type: str = "cart",
    thresh: str = "gau",
    max_cycles: int = 10000,
    freeze_atoms: Sequence = (),
    auto_freeze_links: bool = True,
    bias_pairs: Optional[List[Tuple[Any, Any, float]]] = None,  # (i,j,target Ang)
    bias_k: float = 10.0,                                        # eV/Ang^2
    dist_freeze: Optional[List[Tuple[Any, Any]]] = None,
    calc_mode: str = "uma",
    model: str = "uma-s-1p1",
    out_dir="./result_opt/",
    mesh=None,
    convert_files: bool = True,
    dump: bool = False,
    dump_restart: int = 0,
    verbose: bool = True,
    **calc_kw,
) -> Dict[str, Any]:
    t0 = time.time()
    common.set_convert_enabled(convert_files)
    struct = common.load_structure(input_path)
    q, s = common.resolve_charge_spin(struct, charge, spin)
    freeze_idx = [common.resolve_atom_spec(f, struct) for f in freeze_atoms]
    freeze = common.merge_freeze(struct, freeze_idx, auto_freeze_links)
    struct.freeze = freeze
    opt_mode = normalize_choice(opt_mode, choices=OPT_MODES)

    pairs = []
    targets = []
    if bias_pairs:
        for (i, j, t) in bias_pairs:
            pairs.append((common.resolve_atom_spec(i, struct),
                          common.resolve_atom_spec(j, struct)))
            targets.append(float(t))
    if dist_freeze:
        df_pairs = [(common.resolve_atom_spec(i, struct),
                     common.resolve_atom_spec(j, struct))
                    for (i, j) in dist_freeze]
        pairs.extend(df_pairs)
        targets.extend(dist_freeze_pairs(struct.coords, df_pairs))

    if pairs:
        base_calc = common.make_calculator(
            struct, calc_mode=calc_mode, charge=q, spin=s,
            freeze_atoms=freeze, model=model, mesh=mesh, **calc_kw)
        biased_fn = make_biased_energy_fn(base_calc.energy_fn, pairs)
        calc = Calculator(struct, biased_fn,
                          params=bias_params(targets, bias_k,
                                             base_calc.params),
                          freeze_atoms=freeze, mesh=mesh)
    else:
        calc = common.make_calculator(
            struct, calc_mode=calc_mode, charge=q, spin=s,
            freeze_atoms=freeze, model=model, mesh=mesh, **calc_kw)

    if verbose:
        from .config import pretty_block
        print(pretty_block("opt", {
            "opt_mode": opt_mode, "coord_type": coord_type,
            "thresh": thresh, "max_cycles": max_cycles,
            "charge": q, "spin": s, "calc_mode": calc_mode,
            "model": model, "freeze_atoms": list(freeze),
            "dist_freeze": dist_freeze, "bias_k": bias_k}))

    def cb(cyc, e, f):
        if verbose:
            print(f"[opt] cycle {cyc}: E = {e:.8f} Ha, "
                  f"max|F| = {np.abs(f).max():.2e}")

    # YAML `lbfgs:`/`rfo:` sections merge into the top-level cfg
    # (config.apply_yaml_overrides); route recognised engine knobs through
    # instead of silently dropping them
    from ..engines.rfo import RFO_KW
    engine_keys = set(RFO_KW) | {
        "max_step", "keep_last", "max_step_lbfgs", "trust_radius",
        "gdiis", "gdiis_thresh", "max_step_s", "max_step_cart",
        "back_iters"}
    engine_kw = {k: calc_kw.pop(k) for k in list(calc_kw)
                 if k in engine_keys}
    engine_kw.pop("thresh", None)
    engine_kw.pop("max_cycles", None)
    if dump_restart and opt_mode == "lbfgs" and coord_type == "cart":
        # mid-run restartability (reference dump_restart, opt.py:211-214):
        # the L-BFGS carry is dumped every N cycles; a rerun resumes from
        # the last dump (engines/lbfgs.py restart contract)
        from ..runtime.checkpoint import CheckpointStore
        engine_kw["restart"] = {
            "store": CheckpointStore(Path(out_dir) / "restart"),
            "name": "opt", "every": int(dump_restart)}
    coords, e, conv, cycles = optimize_structure(
        struct, calc, opt_mode=opt_mode, coord_type=coord_type,
        thresh=thresh, max_cycles=max_cycles,
        callback=cb if verbose else None, **engine_kw)

    out_dir = Path(out_dir)
    paths = common.write_outputs(out_dir, "final_geometry", struct,
                                 coords, energy=e)
    if dump:
        # reference --dump (opt.py:211-214 dump_restart) writes per-cycle
        # trajectories; the device-resident while_loop exposes its sync
        # points (start/end), so the dump carries those snapshots
        paths += common.write_trajectory(
            out_dir, "opt", struct,
            [struct.coords_bohr, np.asarray(coords)])
    if verbose:
        print(f"[opt] {'converged' if conv else 'NOT converged'} in "
              f"{cycles} cycles; E = {e:.8f} Ha")
        print(f"[opt] wrote {[str(p) for p in paths]}")
        print(f"[opt] elapsed {format_elapsed(t0)}")
    return {
        "coords_bohr": np.asarray(coords),
        "energy": e, "converged": conv, "cycles": cycles,
        "force_calls": calc.force_calls, "outputs": paths,
        "structure": struct, "calculator": calc,
        "weights": calc.weights_source,
    }
