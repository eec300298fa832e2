"""DFT single-point driver (`dft` subcommand).

Capability match: /root/reference/pdb2reaction/dft.py — RKS/UKS by
multiplicity (:549), density fitting (:168-177), engine policy with GPU ->
CPU fallback (:546-592; the TPU image has no gpu4pyscf, so the CPU PySCF
engine is the backend — exactly the reference's own fallback path, which
SURVEY.md §2.3 maps to "retain CPU engine + plug-in seam"), Mulliken and
meta-Lowdin populations with spin densities (:205-422), ``result.yaml``
output (:649-671) and exit-code-3 semantics on SCF non-convergence
(:679-682).

PySCF is an optional dependency: when absent, the driver raises a clear
error at call time (the rest of the framework never imports it).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
import yaml

from . import common
from .config import format_elapsed

DFT_KW: Dict[str, Any] = {
    "func": "wb97m-v",          # reference default functional family
    "basis": "def2-svp",
    "density_fit": True,
    "max_cycle": 100,
    "conv_tol": 1e-9,
    "engine": "auto",           # gpu->cpu policy collapses to cpu here
    "pop": True,                # population analyses
}


class ScfNotConverged(RuntimeError):
    exit_code = 3


def _require_pyscf():
    try:
        import pyscf  # noqa: F401
        return True
    except ImportError as e:
        raise ImportError(
            "PySCF is not installed in this environment. The dft subcommand "
            "needs the CPU PySCF engine (the reference's own fallback, "
            "dft.py:588-592). Install pyscf to enable DFT single points."
        ) from e


def run_dft(
    input_path,
    *,
    charge: Optional[int] = None,
    spin: Optional[int] = None,
    func: str = "wb97m-v",
    basis: str = "def2-svp",
    density_fit: bool = True,
    max_cycle: int = 100,
    conv_tol: float = 1e-9,
    grid_level: int = 3,
    pop: bool = True,
    out_dir="./result_dft/",
    verbose: bool = True,
    **_ignored,
) -> Dict[str, Any]:
    t0 = time.time()
    _require_pyscf()
    from pyscf import gto, dft as pyscf_dft

    struct = common.load_structure(input_path)
    q, s = common.resolve_charge_spin(struct, charge, spin)

    mol = gto.M(
        atom=[(sym, tuple(xyz)) for sym, xyz in
              zip(struct.symbols, struct.coords)],
        charge=q, spin=s - 1, basis=basis, unit="Angstrom",
    )
    mf = (pyscf_dft.RKS(mol) if s == 1 else pyscf_dft.UKS(mol))
    mf.xc = func
    mf.max_cycle = max_cycle
    mf.conv_tol = conv_tol
    mf.grids.level = grid_level
    if density_fit:
        mf = mf.density_fit()
    e_tot = mf.kernel()
    if not mf.converged:
        raise ScfNotConverged(
            f"SCF did not converge after {max_cycle} cycles")

    result: Dict[str, Any] = {
        "energy_au": float(e_tot),
        "functional": func, "basis": basis,
        "charge": q, "multiplicity": s,
        "converged": bool(mf.converged),
    }
    if pop:
        try:
            from pyscf.lo import orth
            dm = mf.make_rdm1()
            pop_m, chg_m = mf.mulliken_pop(verbose=0)
            result["mulliken_charges"] = [float(c) for c in np.atleast_1d(chg_m)]
            # meta-Lowdin populations (dft.py:205-254)
            C = orth.orth_ao(mol, "meta_lowdin")
            dm_ao = dm if dm.ndim == 2 else dm[0] + dm[1]
            S = mol.intor("int1e_ovlp")
            P = C.T @ S @ dm_ao @ S @ C
            pops = np.diag(P)
            ml = []
            for ia in range(mol.natm):
                idx = [k for k, lab in enumerate(mol.ao_labels(fmt=None))
                       if lab[0] == ia]
                ml.append(float(mol.atom_charge(ia) - pops[idx].sum()))
            result["meta_lowdin_charges"] = ml
            if s > 1:
                dm_spin = dm[0] - dm[1]
                Ps = C.T @ S @ dm_spin @ S @ C
                spins = np.diag(Ps)
                result["meta_lowdin_spin"] = [
                    float(spins[[k for k, lab in
                                 enumerate(mol.ao_labels(fmt=None))
                                 if lab[0] == ia]].sum())
                    for ia in range(mol.natm)]
            # IAO populations (reference fast_iao_mullikan_spin_pop,
            # dft.py:269-422): intrinsic atomic orbitals from the occupied
            # space, symmetrically orthogonalized, Mulliken-style partition
            try:
                from pyscf.lo import iao
                from scipy.linalg import fractional_matrix_power
                mo = mf.mo_coeff
                occ = mf.mo_occ
                if s == 1:
                    cocc = mo[:, occ > 0]
                    a = iao.iao(mol, cocc)
                    a = a @ fractional_matrix_power(a.T @ S @ a, -0.5)
                    piao = a.T @ S @ dm_ao @ S @ a
                    diag = np.diag(piao)
                    spin_diag = None
                else:
                    cocc = mo[0][:, occ[0] > 0]
                    a = iao.iao(mol, cocc)
                    a = a @ fractional_matrix_power(a.T @ S @ a, -0.5)
                    diag = np.diag(a.T @ S @ dm_ao @ S @ a)
                    spin_diag = np.diag(a.T @ S @ (dm[0] - dm[1]) @ S @ a)
                # IAOs carry the minimal-basis labels of reference atoms
                ref_labels = iao.reference_mol(mol).ao_labels(fmt=None)
                iao_q, iao_s = [], []
                for ia in range(mol.natm):
                    idx = [k for k, lab in enumerate(ref_labels)
                           if lab[0] == ia]
                    iao_q.append(float(mol.atom_charge(ia)
                                       - diag[idx].sum()))
                    if spin_diag is not None:
                        iao_s.append(float(spin_diag[idx].sum()))
                result["iao_charges"] = iao_q
                if iao_s:
                    result["iao_spin"] = iao_s
            except Exception as e:
                result["iao_error"] = str(e)
        except Exception as e:
            result["population_error"] = str(e)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "result.yaml").write_text(yaml.safe_dump(result,
                                                    sort_keys=False))
    if verbose:
        print(f"[dft] E = {e_tot:.10f} Ha ({func}/{basis})")
        print(f"[dft] elapsed {format_elapsed(t0)}")
    return result
