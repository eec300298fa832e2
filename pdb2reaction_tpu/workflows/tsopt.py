"""Transition-state optimization driver (`tsopt` subcommand).

Capability match: /root/reference/pdb2reaction/tsopt.py — two modes:
"light" (HessianDimer: dimer translations with Hessian-seeded orientation,
flatten loop) and "heavy" (RS-I-RFO uphill mode following); final
imaginary-mode animation export (tsopt.py:1099-1147, 1594-1642).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import numpy as np

from ..constants import BOHR2ANG
from ..engines.dimer import hessian_dimer, HESSIAN_DIMER_KW
from ..engines.rfo import rfo_optimize, RSIRFO_KW
from ..engines.vib import frequencies_and_modes, count_imaginary, \
    mode_animation_frames
from ..core import io_xyz
from . import common
from .config import normalize_choice, format_elapsed

TS_MODES = ("dimer", "rsirfo")
_TS_ALIASES = {"light": "dimer", "heavy": "rsirfo", "rs-i-rfo": "rsirfo",
               "hessian_dimer": "dimer"}


def run_tsopt(
    input_path,
    *,
    charge: Optional[int] = None,
    spin: Optional[int] = None,
    opt_mode: str = "dimer",
    coord_type: str = "cart",
    thresh: str = "baker",
    max_cycles: int = 10000,
    freeze_atoms: Sequence = (),
    auto_freeze_links: bool = True,
    calc_mode: str = "uma",
    model: str = "uma-s-1p1",
    out_dir="./result_tsopt/",
    mesh=None,
    verbose: bool = True,
    hessian_dimer_kw: Optional[Dict[str, Any]] = None,
    rsirfo_kw: Optional[Dict[str, Any]] = None,
    write_imag_mode: bool = True,
    dump_restart: int = 0,
    calculator=None,
    **calc_kw,
) -> Dict[str, Any]:
    t0 = time.time()
    struct = common.load_structure(input_path)
    q, s = common.resolve_charge_spin(struct, charge, spin)
    if calculator is not None:
        # orchestrator reuse (reference all.py shares one UMA calculator
        # across stage-4 sub-steps, path_search.py:141-144): the caller's
        # calculator carries the authoritative freeze list
        freeze = list(calculator.structure.freeze or [])
    else:
        freeze = common.merge_freeze(
            struct, [common.resolve_atom_spec(f, struct)
                     for f in freeze_atoms], auto_freeze_links)
    struct.freeze = freeze
    mode = normalize_choice(opt_mode, aliases=_TS_ALIASES, choices=TS_MODES)
    if coord_type == "dlc" and mode == "dimer":
        # pysisyphus' Dimer is a Cartesian calculator wrapper; like the
        # reference, the light path runs cart regardless of geom config
        print("[tsopt] coord_type=dlc applies to the rsirfo mode only; "
              "dimer runs Cartesian")
        coord_type = "cart"
    # YAML `hessian_dimer:`/`rsirfo:` sections merge into the top-level cfg
    # (config.apply_yaml_overrides); route recognised engine knobs to the
    # engines instead of silently dropping them into calc_kw
    hessian_dimer_kw = dict(hessian_dimer_kw or {})
    rsirfo_kw = dict(rsirfo_kw or {})
    for k in list(calc_kw):
        if k in HESSIAN_DIMER_KW:
            hessian_dimer_kw.setdefault(k, calc_kw.pop(k))
        elif k in RSIRFO_KW:
            rsirfo_kw.setdefault(k, calc_kw.pop(k))
    calc = calculator if calculator is not None else common.make_calculator(
        struct, calc_mode=calc_mode, charge=q,
        spin=s, freeze_atoms=freeze, model=model,
        mesh=mesh, **calc_kw)
    if calculator is not None and struct.n_atoms != calc.n_atoms:
        raise ValueError(
            f"calculator atom count {calc.n_atoms} != input "
            f"{struct.n_atoms} ({input_path})")
    x0 = calc.pad_bohr(struct.coords_bohr)

    if verbose:
        from .config import pretty_block
        print(pretty_block("tsopt", {
            "opt_mode": mode, "coord_type": coord_type,
            "thresh": thresh, "max_cycles": max_cycles,
            "charge": q, "spin": s, "calc_mode": calc_mode, "model": model,
            "hessian_dimer": dict(hessian_dimer_kw or {}),
            "rsirfo": dict(rsirfo_kw or {})}))

    if mode == "dimer":
        kw = {**HESSIAN_DIMER_KW, **(hessian_dimer_kw or {})}
        kw["thresh"] = thresh if thresh != "gau" else kw["thresh"]
        # an explicit engine-level budget (e.g. all --tsopt-max-cycles via
        # hessian_dimer_kw) wins over the driver default
        if "max_cycles_total" not in (hessian_dimer_kw or {}):
            kw["max_cycles_total"] = max_cycles
        if dump_restart:
            # mid-run restartability (reference dump_restart semantics):
            # Hessians/passes memoized + within-pass carry dumps
            from ..runtime.checkpoint import CheckpointStore
            kw["restart"] = {
                "store": CheckpointStore(Path(out_dir) / "restart"),
                "name": "tsopt", "every": int(dump_restart)}
        res = hessian_dimer(calc, x0, **kw)
        coords = calc.unpad(res.x)
        e = res.e
        conv = res.converged
        cycles = res.cycles
        freqs = res.freqs_cm
        imode = res.imag_mode_cart
        n_imag = res.n_imag
    else:
        kw = {**RSIRFO_KW, **(rsirfo_kw or {})}
        kw["thresh"] = thresh or kw["thresh"]
        H0 = calc.get_hessian(struct.coords_bohr.reshape(-1))["hessian"]
        eng_kw = {k: v for k, v in kw.items()
                  if k in ("roots", "thresh", "trust_radius",
                           "trust_max", "trust_min",
                           "hessian_update", "hessian_recalc",
                           "small_eigval_thresh")}
        hess_fn = lambda xp: calc.get_hessian(  # noqa: E731
            np.asarray(xp)[: calc.n_atoms].reshape(-1))["hessian"]
        if coord_type == "dlc":
            # reference honors geom coord_type in the RS-I-RFO driver
            # (tsopt.py:669,1523); RS-I-RFO in constrained DLC space
            from ..engines.dlc import dlc_rfo_optimize
            r = dlc_rfo_optimize(
                calc.au_energy_force_fn_p(), x0, struct.numbers,
                calc.n_atoms, params=calc.pack(), freeze=freeze,
                hessian0=H0, mode="ts", max_cycles=max_cycles,
                hessian_fn=hess_fn, **eng_kw)
        else:
            r = rfo_optimize(calc.au_energy_force_fn_p(), x0,
                             calc.system.free_mask, calc.n_atoms,
                             params=calc.pack(),
                             hessian0=H0, mode="ts", max_cycles=max_cycles,
                             hessian_fn=hess_fn, **eng_kw)
        coords = calc.unpad(r.x)
        e = r.e
        conv = r.converged
        cycles = r.cycles
        H = calc.get_hessian(coords.reshape(-1))["hessian"]
        vib = frequencies_and_modes(H, struct.numbers, coords, freeze)
        freqs = vib.freqs_cm
        imode = (vib.modes_cart[int(np.argmin(freqs))]
                 if len(freqs) else None)
        if len(freqs) == 0 and freeze:
            # tiny active spaces: PHVA's in-subspace TR projection can
            # annihilate every mode; report unprojected free-block
            # wavenumbers instead (same fallback as the dimer engine)
            from ..constants import NU_CM_FACTOR
            from ..engines.vib import free_block_modes
            from .. import elements
            w, modes = free_block_modes(H, struct.numbers, freeze)
            freqs = np.sign(w) * np.sqrt(np.abs(w)) * NU_CM_FACTOR
            sqm = np.sqrt(np.repeat(elements.masses_of(
                np.asarray(struct.numbers, int)), 3))
            m = modes[int(np.argmin(freqs))] / sqm
            imode = (m / max(np.linalg.norm(m), 1e-30)).reshape(-1, 3)
        n_imag = count_imaginary(freqs)

    out = Path(out_dir)
    paths = common.write_outputs(out, "final_geometry", struct, coords,
                                 energy=e)
    if write_imag_mode and imode is not None:
        frames = mode_animation_frames(coords * BOHR2ANG, imode)
        trj = out / "imag_mode.trj"
        io_xyz.write_trj(trj, [struct.copy(coords=f) for f in frames])
        paths.append(trj)

    if verbose:
        print(f"[tsopt:{mode}] {'converged' if conv else 'NOT converged'} "
              f"in {cycles} cycles; E = {e:.8f} Ha; "
              f"{n_imag} imaginary mode(s)")
        if len(freqs):
            print(f"[tsopt] lowest mode: {np.min(freqs):.1f} cm-1")
        print(f"[tsopt] elapsed {format_elapsed(t0)}")
    return {"coords_bohr": coords, "energy": e, "converged": conv,
            "cycles": cycles, "freqs_cm": freqs, "n_imag": n_imag,
            "imag_mode_cart": imode, "outputs": paths,
            "structure": struct, "calculator": calc,
            "force_calls": calc.force_calls}
