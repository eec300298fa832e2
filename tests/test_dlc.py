"""Delocalized internal coordinates: construction, back-transformation,
and the convergence advantage over Cartesian (VERDICT #4 'done' criterion:
a 20+ atom molecule in measurably fewer cycles)."""

import numpy as np
import jax
import jax.numpy as jnp

from pdb2reaction_tpu.constants import BOHR2ANG
from pdb2reaction_tpu.core.structure import Structure
from pdb2reaction_tpu.mlip.calculator import Calculator
from pdb2reaction_tpu.mlip import potentials
from pdb2reaction_tpu.engines.lbfgs import lbfgs_minimize
from pdb2reaction_tpu.engines.dlc import (build_primitives, make_prim_fn,
                                          dlc_lbfgs_minimize)


def _zigzag(n=21, bond=1.5):
    coords = np.zeros((n, 3))
    for i in range(1, n):
        ang = 0.6 if i % 2 else -0.6
        coords[i] = coords[i - 1] + bond * np.array(
            [np.cos(ang), np.sin(ang), 0.0])
    return coords


def test_primitive_construction_counts():
    coords = _zigzag(8)
    st = Structure.from_symbols(["C"] * 8, coords)
    bonds, angles, dihedrals = build_primitives(st.numbers, coords)
    assert len(bonds) == 7          # chain
    assert len(angles) == 6
    assert len(dihedrals) == 5
    # delocalization spans exactly 3N-6
    prim_fn, _ = make_prim_fn(bonds, angles, dihedrals, 8)
    x = jnp.asarray(st.coords_bohr.reshape(-1))
    B = jax.jacrev(prim_fn)(x)
    w = np.linalg.eigvalsh(np.asarray(B @ B.T))
    assert (w > 1e-6).sum() == 3 * 8 - 6


def test_fragment_joining():
    """Two disconnected fragments must get a joining bond."""
    coords = np.vstack([_zigzag(4), _zigzag(4) + np.array([0, 6.0, 0])])
    st = Structure.from_symbols(["C"] * 8, coords)
    bonds, _, _ = build_primitives(st.numbers, coords)
    # 3+3 intra + 1 inter
    assert len(bonds) == 7
    inter = [(i, j) for (i, j) in bonds if (i < 4) != (j < 4)]
    assert len(inter) == 1


def _vff_setup(n=21, seed=5):
    """Valence force field (stiff bonds, soft dihedrals) around the zigzag
    equilibrium — the classic stiffness separation DLC is built for."""
    rng = np.random.default_rng(seed)
    coords = _zigzag(n)
    st0 = Structure.from_symbols(["C"] * n, coords)
    x_eq = st0.coords_bohr
    bonds, angles, dihedrals = build_primitives(st0.numbers, coords)
    prim_fn, (nb, na, nd) = make_prim_fn(bonds, angles, dihedrals, n)
    q_eq = prim_fn(jnp.asarray(x_eq.reshape(-1)))

    def vff_energy(coords_ang, system, params):
        x = (coords_ang[:n] / BOHR2ANG).reshape(-1)
        q = prim_fn(x)
        db = q[:nb] - q_eq[:nb]
        da = q[nb:nb + na] - q_eq[nb:nb + na]
        dd = q[nb + na:] - q_eq[nb + na:]
        dd = (dd + jnp.pi) % (2 * jnp.pi) - jnp.pi
        return (20.0 * jnp.sum(db ** 2) + 1.0 * jnp.sum(da ** 2)
                + 0.02 * jnp.sum(1 - jnp.cos(dd)))

    vff_energy.takes_params = True
    pert = coords + rng.normal(scale=0.25, size=coords.shape)
    st = Structure.from_symbols(["C"] * n, pert)
    return st, vff_energy


def test_dlc_beats_cartesian_on_21_atoms():
    st, vff = _vff_setup()
    calc = Calculator(st, vff)
    x0 = calc.pad_bohr(st.coords_bohr)
    fn = calc.au_energy_force_fn()
    res_c = lbfgs_minimize(fn, x0, calc.system.free_mask, thresh="gau",
                           max_cycles=5000)
    res_d = dlc_lbfgs_minimize(fn, x0, st.numbers, calc.n_atoms,
                               thresh="gau", max_cycles=5000)
    assert bool(res_c.converged) and bool(res_d.converged)
    assert res_d.e < float(res_c.e) + 1e-3          # same (or better) min
    assert res_d.cycles < int(res_c.cycles) * 0.6, (
        res_d.cycles, int(res_c.cycles))


def test_dlc_frozen_atoms_constrained():
    """Constrained delocalization: frozen atoms never move, free forces
    relax, and the frozen positions pin the global frame."""
    st, vff = _vff_setup(n=12, seed=9)
    st.freeze = [0, 11]
    calc = Calculator(st, vff)
    x0 = calc.pad_bohr(st.coords_bohr)
    fn = calc.au_energy_force_fn()
    res = dlc_lbfgs_minimize(fn, x0, st.numbers, calc.n_atoms,
                             freeze=st.freeze, thresh="gau",
                             max_cycles=3000)
    assert bool(res.converged)
    x_fin = np.asarray(res.x)[: calc.n_atoms]
    np.testing.assert_allclose(x_fin[[0, 11]],
                               st.coords_bohr[[0, 11]], atol=1e-12)
    # converged free forces under the gau preset
    f = np.asarray(res.f)[: calc.n_atoms]
    assert np.abs(f[1:11]).max() < 4.5e-4
    # matches the Cartesian frozen minimization energy
    res_c = lbfgs_minimize(fn, x0, calc.system.free_mask, thresh="gau",
                           max_cycles=5000)
    assert res.e < float(res_c.e) + 1e-5


def test_dlc_through_opt_workflow(tmp_path):
    """coord_type=dlc end-to-end through the opt driver on a small Morse
    molecule near its minimum."""
    from pdb2reaction_tpu.workflows.opt import run_opt
    xyz = tmp_path / "m.xyz"
    xyz.write_text(
        "4\n\nC 0 0 0\nC 1.45 0 0\nC 2.2 1.25 0\nC 3.65 1.3 0.1\n")
    res = run_opt(xyz, charge=0, spin=1, calc_mode="morse",
                  coord_type="dlc", out_dir=tmp_path / "o", verbose=False)
    assert res["converged"]
    assert res["cycles"] < 200


def test_dlc_rfo_ts_double_well():
    """RS-I-RFO in constrained DLC: frozen-endpoint 3-H double well.

    With both ends frozen and a collinear geometry the constrained DLC set
    collapses to ONE combination (the reaction coordinate) — the TS search
    walks uphill in that subspace to the symmetric midpoint saddle."""
    from pdb2reaction_tpu.engines.dlc import dlc_rfo_optimize
    L = 2.4
    st = Structure.from_symbols(
        ["H", "H", "H"],
        [[0, 0, 0], [1.05, 0.0, 0.0], [L, 0, 0]],
        freeze=[0, 2])
    calc = Calculator(st, potentials.make_morse())
    fn = calc.au_energy_force_fn()
    x0 = calc.pad_bohr(st.coords_bohr)
    H0 = calc.get_hessian(st.coords_bohr.reshape(-1))["hessian"]
    res = dlc_rfo_optimize(fn, x0, st.numbers, calc.n_atoms,
                           hessian0=H0, mode="ts", roots=[0],
                           freeze=st.freeze, thresh="baker",
                           hessian_update="bofill", max_cycles=300)
    assert res.converged
    x = np.asarray(res.x)[:3] * BOHR2ANG
    assert abs(x[1, 0] - L / 2) < 1e-3
    # frozen endpoints never moved
    np.testing.assert_allclose(np.asarray(res.x)[[0, 2]],
                               st.coords_bohr[[0, 2]], atol=1e-12)


def test_dlc_rfo_min_water_matches_cart():
    """mode=min DLC-RFO reaches the same water minimum as Cartesian RFO
    (internals are TR-invariant, so no small-eigval filtering is needed)."""
    from pdb2reaction_tpu.engines.dlc import dlc_rfo_optimize
    from pdb2reaction_tpu.engines.rfo import rfo_optimize
    st = Structure.from_symbols(
        ["O", "H", "H"],
        [[0.0, 0.0, 0.0], [1.1, 0.1, 0.0], [-0.3, 1.05, 0.0]])
    calc = Calculator(st, potentials.make_morse())
    fn = calc.au_energy_force_fn()
    x0 = calc.pad_bohr(st.coords_bohr)
    H0 = calc.get_hessian(st.coords_bohr.reshape(-1))["hessian"]
    res_d = dlc_rfo_optimize(fn, x0, st.numbers, calc.n_atoms,
                             hessian0=H0, mode="min", thresh="gau",
                             hessian_update="bfgs", max_cycles=200)
    res_c = rfo_optimize(fn, x0, calc.system.free_mask, calc.n_atoms,
                         hessian0=H0, thresh="gau", max_cycles=200)
    assert res_d.converged and res_c.converged
    # both under the gau force threshold; energy agreement limited by
    # f32 force noise near the flat minimum, not by the coordinates
    assert abs(res_d.e - float(res_c.e)) < 5e-5


def test_dlc_rfo_through_tsopt_workflow(tmp_path):
    """coord_type=dlc end-to-end through the tsopt rsirfo driver
    (reference honors geom.coord_type there, tsopt.py:669,1523)."""
    from pdb2reaction_tpu.workflows.tsopt import run_tsopt
    xyz = tmp_path / "h3.xyz"
    xyz.write_text("3\n\nH 0 0 0\nH 1.05 0 0\nH 2.4 0 0\n")
    res = run_tsopt(xyz, charge=0, spin=1, calc_mode="morse",
                    opt_mode="rsirfo", coord_type="dlc",
                    freeze_atoms=[0, 2], auto_freeze_links=False,
                    out_dir=tmp_path / "o", verbose=False)
    assert res["converged"]
    x = np.asarray(res["coords_bohr"]) * BOHR2ANG
    assert abs(x[1, 0] - 1.2) < 1e-3
    assert res["n_imag"] >= 1
