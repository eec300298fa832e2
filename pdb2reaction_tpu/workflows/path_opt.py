"""Two-endpoint MEP driver (`path-opt` subcommand).

Capability match: /root/reference/pdb2reaction/path_opt.py — GSM
(default) or DMF between two endpoints: optional per-endpoint
preoptimization (:826-864), freeze-guided Kabsch alignment before the MEP
(:870-886), HEI selection preferring internal maxima (:259-278), trajectory
+ HEI exports with PDB mirroring (:980-1074).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import numpy as np

from ..constants import BOHR2ANG
from ..engines.gsm import gsm_mep, GS_KW, STOPT_KW
from ..bio.align import align_sequence_inplace
from . import common
from .opt import optimize_structure
from .config import format_elapsed, normalize_choice


def run_mep_between(
    structA, structB, calc, *, mep_mode: str = "gsm",
    gs_kw: Optional[Dict[str, Any]] = None,
    stopt_kw: Optional[Dict[str, Any]] = None,
    dmf_kw: Optional[Dict[str, Any]] = None,
    verbose: bool = True,
):
    """Library core shared with path_search: run one MEP segment between two
    aligned structures using a shared calculator. Returns a GsmResult-like
    object (images [M,P,3] Bohr, energies, hei_idx, converged)."""
    if mep_mode == "dmf":
        from ..engines.dmf import dmf_mep
        return dmf_mep(calc,
                       calc.pad_bohr(structA.coords_bohr),
                       calc.pad_bohr(structB.coords_bohr),
                       **(dmf_kw or {}))
    kw = {**GS_KW, **(gs_kw or {})}
    skw = {**STOPT_KW, **(stopt_kw or {})}
    # GSM loop driver: "device" fuses growth/relaxation each into one
    # lax.while_loop (one host sync per phase — right for small/medium
    # programs); "host" drives the same jitted macro-cycle from Python,
    # paying per-cycle syncs but compiling only the batched force call
    # plus a tiny epilogue (the 300-atom eSCN batched-string while_loop
    # otherwise takes ~35 min of remote compile; see engines/gsm.py).
    # "auto" picks the calculator's preference (eSCN-backbone
    # calculators set gsm_loop_default="host", mlip/uma.py).
    loop = kw.get("loop", "auto")
    if loop == "auto":
        loop = getattr(calc, "gsm_loop_default", "device")
    eb = calc.au_energy_force_batch_fn()

    def cb(cyc, E, rms, grown, climb):
        if verbose:
            print(f"[gsm] cycle {cyc}: grown {grown}, rms(F_perp) = "
                  f"{rms:.2e}, climb = {climb}")

    res = gsm_mep(
        eb,
        calc.pad_bohr(structA.coords_bohr),
        calc.pad_bohr(structB.coords_bohr),
        calc.system.free_mask,
        max_nodes=kw["max_nodes"], perp_thresh=kw["perp_thresh"],
        max_cycles=skw["max_cycles"],
        stop_in_when_full=skw["stop_in_when_full"],
        scale_step=skw.get("scale_step", "global"),
        climb=kw["climb"], climb_rms=kw["climb_rms"],
        climb_lanczos=kw.get("climb_lanczos", True),
        fix_ends=bool(kw.get("fix_ends",
                             kw.get("fix_first", True)
                             and kw.get("fix_last", True))),
        hvp_fn=calc.au_hvp_fn(),
        reparam_every=kw["reparam_every"],
        reparam_every_full=kw["reparam_every_full"],
        max_micro_cycles=kw.get("max_micro_cycles", 10),
        callback=cb if verbose else None,
        print_every=skw.get("print_every", 10),
        loop=loop,
    )
    # the string engine drives the raw batched closure; account its force
    # calls on the calculator (bench contract, SURVEY.md §5.1)
    calc.force_calls += int(res.force_calls)
    return res


def run_path_opt(
    input_paths: Sequence,                # two endpoint files
    *,
    charge: Optional[int] = None,
    spin: Optional[int] = None,
    freeze_atoms: Sequence = (),
    auto_freeze_links: bool = True,
    mep_mode: str = "gsm",
    preopt: bool = True,
    preopt_mode: str = "lbfgs",       # reference --opt-mode (light|heavy)
    preopt_thresh: str = "gau_loose",
    preopt_max_cycles: int = 10000,
    thresh: Optional[str] = None,     # reference --thresh: preset for the
    align: bool = True,               # string optimizer + endpoint preopt
    calc_mode: str = "uma",
    model: str = "uma-s-1p1",
    out_dir="./result_path_opt/",
    mesh=None,
    verbose: bool = True,
    gs_kw: Optional[Dict[str, Any]] = None,
    stopt_kw: Optional[Dict[str, Any]] = None,
    dmf_kw: Optional[Dict[str, Any]] = None,
    **calc_kw,
) -> Dict[str, Any]:
    t0 = time.time()
    assert len(input_paths) == 2, "path-opt needs exactly two endpoints"
    mep_mode = normalize_choice(mep_mode, choices=("gsm", "dmf"))
    # route YAML-merged engine keys out of calc_kw into the nested kw
    # dicts (same pattern as run_opt/run_tsopt)
    from ..engines.dmf import DMF_KW
    gs_kw = dict(gs_kw or {})
    stopt_kw = dict(stopt_kw or {})
    dmf_kw = dict(dmf_kw or {})
    for k in list(calc_kw):
        for table, dst in ((GS_KW, gs_kw), (STOPT_KW, stopt_kw),
                           (DMF_KW, dmf_kw)):
            if k in table:
                dst[k] = calc_kw.pop(k)
                break
    if thresh is not None:
        # reference path_opt.py --thresh: one preset drives the string
        # optimizer's convergence and the endpoint preoptimizations; map
        # the preset's rms-force onto the GSM perpendicular-force
        # criteria (the device GSM converges on perp-force RMS)
        import math
        from ..engines.thresholds import get_thresholds
        preset = get_thresholds(str(thresh))
        rms = float(preset.rms_force)
        if not math.isfinite(rms):          # baker: rms unchecked
            rms = float(preset.max_force)
        gs_kw = dict(gs_kw or {})
        gs_kw.setdefault("perp_thresh", rms)
        gs_kw.setdefault("climb_rms", rms)
        gs_kw.setdefault("climb_lanczos_rms", rms)
        preopt_thresh = str(thresh)
    structs = [common.load_structure(p) for p in input_paths]
    q, s = common.resolve_charge_spin(structs[0], charge, spin)
    for st in structs:
        st.freeze = common.merge_freeze(
            st, [common.resolve_atom_spec(f, st) for f in freeze_atoms],
            auto_freeze_links)
    A, B = structs
    if A.n_atoms != B.n_atoms or list(A.numbers) != list(B.numbers):
        raise ValueError("Endpoints must share atom count and ordering")

    calc = common.make_calculator(A, calc_mode=calc_mode, charge=q, spin=s,
                                  freeze_atoms=A.freeze, model=model,
                                  mesh=mesh, **calc_kw)
    if verbose:
        from .config import pretty_block
        print(pretty_block("path-opt", {
            "mep_mode": mep_mode, "preopt": preopt, "align": align,
            "charge": q, "spin": s, "calc_mode": calc_mode,
            "model": model, "gs": dict(gs_kw or {}),
            "sopt": dict(stopt_kw or {}), "dmf": dict(dmf_kw or {})}))
    if preopt:
        for st in structs:
            coords, e, conv, cyc = optimize_structure(
                st, calc, opt_mode=preopt_mode, thresh=preopt_thresh,
                max_cycles=preopt_max_cycles)
            st.coords = coords * BOHR2ANG
            if verbose:
                print(f"[path-opt] preopt endpoint: E = {e:.6f} Ha "
                      f"({'conv' if conv else 'max cycles'})")
    if align:
        align_sequence_inplace(structs)

    res = run_mep_between(A, B, calc, mep_mode=mep_mode, gs_kw=gs_kw,
                          stopt_kw=stopt_kw, dmf_kw=dmf_kw, verbose=verbose)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = calc.n_atoms
    frames = [img[:n] for img in res.images]
    paths = common.write_trajectory(out, "final_geometries", A, frames,
                                    res.energies)
    hei = res.hei_idx
    paths += common.write_outputs(out, "hei", A, frames[hei],
                                  energy=res.energies[hei])
    if verbose:
        Erel = (res.energies - res.energies[0]) * 627.509
        print(f"[path-opt] HEI = image {hei}; barrier = "
              f"{Erel[hei]:.2f} kcal/mol; converged = {res.converged}")
        print(f"[path-opt] elapsed {format_elapsed(t0)}")
    return {"images_bohr": frames, "energies": np.asarray(res.energies),
            "hei_idx": hei, "converged": res.converged,
            "outputs": paths, "structures": structs, "calculator": calc,
            "force_calls": calc.force_calls}
