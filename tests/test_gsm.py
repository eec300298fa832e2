import numpy as np
import pytest

from pdb2reaction_tpu.constants import BOHR2ANG, ANG2BOHR
from pdb2reaction_tpu.core.structure import Structure
from pdb2reaction_tpu.mlip.calculator import Calculator
from pdb2reaction_tpu.mlip import potentials
from pdb2reaction_tpu.engines.gsm import gsm_mep, select_hei_index


def test_select_hei_prefers_internal_maxima():
    assert select_hei_index([0.0, 1.0, 0.5, 2.0, 0.1]) == 3
    # no internal local max -> argmax of interior
    assert select_hei_index([0.0, 1.0, 2.0, 3.0, 4.0]) == 3
    assert select_hei_index([1.0, 0.5]) == 0


def test_gsm_double_well_path():
    """H between two frozen H at L=2.4: MEP from left well to right well;
    the HEI must sit at the symmetric barrier (midpoint)."""
    L = 2.4
    stA = Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [0.686, 0, 0], [L, 0, 0]],
        freeze=[0, 2])
    xB = np.array([[0, 0, 0], [L - 0.686, 0, 0], [L, 0, 0]])

    calc = Calculator(stA, potentials.make_morse())
    eb = calc.au_energy_force_batch_fn()
    res = gsm_mep(
        eb,
        calc.pad_bohr(stA.coords_bohr),
        calc.pad_bohr(xB * ANG2BOHR),
        calc.system.free_mask,
        max_nodes=8, max_cycles=300, conv_perp_rms=5e-4)
    assert res.converged
    E = res.energies
    hei = res.hei_idx
    assert 0 < hei < len(E) - 1
    x_hei = res.images[hei][:3] * BOHR2ANG
    # barrier at the midpoint
    assert x_hei[1, 0] == pytest.approx(L / 2, abs=0.05)
    # path is continuous and endpoints unchanged
    np.testing.assert_allclose(res.images[0][:3] * BOHR2ANG,
                               stA.coords, atol=1e-10)
    np.testing.assert_allclose(res.images[-1][:3] * BOHR2ANG, xB, atol=1e-10)
    # barrier height matches the PES scan value (~0.0177 Ha)
    barrier = E[hei] - E[0]
    assert barrier == pytest.approx(0.0177, abs=2e-3)


def test_gsm_force_call_accounting():
    L = 2.4
    stA = Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [0.686, 0, 0], [L, 0, 0]],
        freeze=[0, 2])
    xB = np.array([[0, 0, 0], [L - 0.686, 0, 0], [L, 0, 0]])
    calc = Calculator(stA, potentials.make_morse())
    eb = calc.au_energy_force_batch_fn()
    res = gsm_mep(eb, calc.pad_bohr(stA.coords_bohr),
                  calc.pad_bohr(xB * ANG2BOHR),
                  calc.system.free_mask,
                  max_nodes=4, max_cycles=50, conv_perp_rms=5e-4)
    # growth cycles + device cycles + the device phase's energy seed,
    # all at M=6 images per batched call
    assert res.force_calls == (res.cycles + 1) * 6


def test_gsm_host_loop_matches_device():
    """loop="host" (per-cycle jitted programs driven from Python — the
    flagship-bench path for giant backbones whose batched-string while_loop
    program takes ~35 min to compile) must reproduce the device while_loop
    result exactly: same cycle count, convergence, HEI, and images."""
    L = 2.4
    stA = Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [0.686, 0, 0], [L, 0, 0]],
        freeze=[0, 2])
    xB = np.array([[0, 0, 0], [L - 0.686, 0, 0], [L, 0, 0]])
    calc = Calculator(stA, potentials.make_morse())
    eb = calc.au_energy_force_batch_fn()
    kw = dict(max_nodes=8, max_cycles=300, conv_perp_rms=5e-4,
              climb=True, hvp_fn=calc.au_hvp_fn())
    res_d = gsm_mep(eb, calc.pad_bohr(stA.coords_bohr),
                    calc.pad_bohr(xB * ANG2BOHR),
                    calc.system.free_mask, loop="device", **kw)
    res_h = gsm_mep(eb, calc.pad_bohr(stA.coords_bohr),
                    calc.pad_bohr(xB * ANG2BOHR),
                    calc.system.free_mask, loop="host", **kw)
    assert res_h.converged == res_d.converged
    assert res_h.cycles == res_d.cycles
    assert res_h.force_calls == res_d.force_calls
    assert res_h.hei_idx == res_d.hei_idx
    np.testing.assert_allclose(res_h.images, res_d.images,
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(res_h.energies, res_d.energies,
                               rtol=0, atol=1e-8)


def test_lanczos_lowest_mode_matches_exact():
    """Lanczos on the analytic HVP must recover the exact lowest Hessian
    eigenvector (the climb_lanczos tangent, reference path_opt.py:177)."""
    import jax.numpy as jnp
    from pdb2reaction_tpu.core.structure import Structure
    from pdb2reaction_tpu.mlip.calculator import Calculator
    from pdb2reaction_tpu.mlip import potentials
    from pdb2reaction_tpu.engines.gsm import lanczos_lowest_mode

    st = Structure.from_symbols(
        ["H", "H", "H"], [[0, 0, 0], [1.2, 0, 0], [2.4, 0, 0]],
        freeze=[0, 2])
    calc = Calculator(st, potentials.make_morse())
    x = calc.pad_bohr(st.coords_bohr)
    fm_flat = jnp.repeat(jnp.asarray(calc.system.free_mask), 3)
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.normal(size=x.size))
    d = np.asarray(lanczos_lowest_mode(calc.au_hvp_fn(), x, v0, fm_flat,
                                       iters=10))
    # exact reference: lowest eigenvector of the free-block Hessian
    H = calc.get_hessian(st.coords_bohr.reshape(-1))["hessian"]
    free = calc.free_dof_mask
    Hf = H[np.ix_(free, free)]
    w, V = np.linalg.eigh(Hf)
    exact = np.zeros(3 * calc.n_atoms)
    exact[free] = V[:, 0]
    full = np.zeros(x.size)
    full[: 3 * calc.n_atoms] = exact
    overlap = abs(float(np.dot(d, full)))
    assert overlap > 0.999, overlap


def test_gsm_growth_fidelity_curved_valley():
    """VERDICT r2 item 10: quantify the linear-reinterp growth deviation
    (engines/gsm.py reinterp) on the Muller-Brown curved valley. The true
    MEP bows far outside the straight line between the two minima, so the
    growth shortcut is maximally stressed; the relax phase must repair it
    and the climbing image must land on the analytic saddle."""
    import jax
    import jax.numpy as jnp
    from pdb2reaction_tpu.engines.gsm import (make_device_growth,
                                              _interp_linear)

    SCALE = 0.02
    A = jnp.array([-200., -100., -170., 15.])
    a = jnp.array([-1., -1., -6.5, 0.7])
    b = jnp.array([0., 0., 11., 0.6])
    c = jnp.array([-10., -10., -6.5, 0.7])
    x0v = jnp.array([1., 0., -0.5, -1.])
    y0v = jnp.array([0., 0.5, 1.5, 1.])

    def mb2d(x, y):
        dx = x - x0v
        dy = y - y0v
        return SCALE * jnp.sum(A * jnp.exp(a * dx**2 + b * dx * dy
                                           + c * dy**2))

    def efn(coords, system):
        return mb2d(coords[0, 0], coords[0, 1]) \
            + 0.5 * SCALE * coords[0, 2] ** 2

    g2 = jax.grad(lambda p: mb2d(p[0], p[1]))
    H2 = jax.hessian(lambda p: mb2d(p[0], p[1]))

    def newton(p0):
        p = jnp.array(p0)
        for _ in range(30):
            p = p - jnp.linalg.solve(H2(p), g2(p))
        return np.asarray(p)

    mA = newton([-0.05, 0.47])
    mB = newton([-0.56, 1.44])
    sad = newton([-0.822, 0.624])

    stA = Structure.from_symbols(["H"], [[mA[0], mA[1], 0.0]])
    stB = Structure.from_symbols(["H"], [[mB[0], mB[1], 0.0]])
    calc = Calculator(stA, efn)
    x0 = calc.pad_bohr(stA.coords_bohr)
    x1 = calc.pad_bohr(stB.coords_bohr)
    fb = calc.au_energy_force_batch_fn()

    res = gsm_mep(fb, x0, x1, calc.system.free_mask, max_nodes=12,
                  max_cycles=600, stop_in_when_full=600,
                  conv_perp_rms=4e-4, perp_thresh=2e-3, climb=True,
                  hvp_fn=calc.au_hvp_fn())
    assert res.converged
    pts = res.images[:, 0, :2] * BOHR2ANG
    # climbing image on the analytic saddle (measured 0.0018 Ang)
    assert np.linalg.norm(pts[res.hei_idx] - sad) < 0.02

    # grown-only string (growth loop alone, no relaxation)
    grow = make_device_growth(fb, jnp.asarray(calc.system.free_mask), 0.1,
                              "global", 2e-3, 10, True)
    imgs_g, _, _, _, _ = grow(_interp_linear(x0, x1, 14), jnp.asarray(1),
                              jnp.asarray(1), jnp.asarray(600))
    pts_g = np.asarray(imgs_g)[:, 0, :2] * BOHR2ANG

    # dense steepest-descent MEP from the saddle, both directions
    gfull = jax.jit(jax.grad(lambda q: mb2d(q[0], q[1])))
    w, V = np.linalg.eigh(np.asarray(H2(jnp.asarray(sad))))
    mode = V[:, 0]

    def dense(sign, ds=2e-4):
        q = sad + sign * 1e-3 * mode
        out = [q.copy()]
        for _ in range(40000):
            g = np.asarray(gfull(jnp.asarray(q)))
            ng = np.linalg.norm(g)
            if ng < 1e-4:
                break
            q = q - ds * g / ng
            out.append(q.copy())
        return np.array(out)

    ref = np.vstack([dense(1.0), dense(-1.0), sad[None]])

    def maxdev(p):
        return np.sqrt(((p[:, None, :] - ref[None, :, :]) ** 2)
                       .sum(-1)).min(1).max()

    # relax repairs the growth shortcut (measured: 0.078 -> 0.035 Ang)
    assert maxdev(pts) < 0.06
    assert maxdev(pts) < maxdev(pts_g)
