"""Hessian-seeded dimer TS refinement ("light" tsopt mode).

Capability match: the reference's ``HessianDimer``
(/root/reference/pdb2reaction/tsopt.py:587-1147):

1. exact Hessian -> mass-weighted, TR-projected lowest mode as the initial
   dimer orientation (tsopt.py:300-366);
2. loose dimer+LBFGS pass, orientation refresh from a fresh Hessian, then a
   tight pass under a global cycle budget (tsopt.py:734-826);
3. flatten loop: probe extra imaginary modes with +/- displacements and
   move downhill along them to escape higher-order saddles
   (tsopt.py:829-961), separation gating off by default
   (flatten_sep_cutoff = 0.0, tsopt.py:1216);
4. final Hessian, imaginary-mode count and animation frames.

TPU-first redesign:
- dimer rotations use the Fourier method (Heyden/Kastner) with the
  endpoint force evaluated on device; the +/- flatten probes for ALL extra
  imaginary modes are evaluated in ONE batched force call;
- translation runs LBFGS on the projected dimer force (line search off —
  the projected force is not a gradient);
- Hessians come from the calculator's batched analytic/FD path, so a
  refresh costs one sharded pass instead of 6N serial calls.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .vib import frequencies_and_modes, count_imaginary
from .thresholds import get_thresholds

# Reference option surface (tsopt.py:1166-1199, 1211-1224)
DIMER_KW: Dict[str, Any] = {
    "length": 0.0189,               # Bohr (~0.01 Ang)
    "rotation_max_cycles": 15,
    "rotation_method": "fourier",
    "rotation_thresh": 1e-4,
    "rotation_tol": 1.0,            # degrees
    "rotation_disable": False,
    "rotation_disable_pos_curv": True,
    "rotation_remove_trans": True,
    "trans_force_f_perp": True,
}

HESSIAN_DIMER_KW: Dict[str, Any] = {
    "thresh_loose": "gau_loose",
    "thresh": "baker",
    "update_interval_hessian": 500,
    "neg_freq_thresh_cm": 5.0,
    "flatten_amp_ang": 0.10,
    "flatten_max_iter": 50,
    "flatten_sep_cutoff": 0.0,
    "flatten_k": 10,
    "root": 0,
    "max_cycles_total": 10000,
}


class DimerResult(NamedTuple):
    x: jnp.ndarray              # [P,3] Bohr
    e: float
    freqs_cm: np.ndarray
    imag_mode_cart: Optional[np.ndarray]   # [N,3]
    n_imag: int
    converged: bool
    cycles: int


def lowest_mode_direction(H_au, numbers, coords_bohr, freeze_idx,
                          root: int = 0) -> np.ndarray:
    """Cartesian unit vector of the root-th lowest TR-projected MW mode
    (reference _mode_direction_by_root, tsopt.py:300-366)."""
    vib = frequencies_and_modes(H_au, numbers, coords_bohr,
                                freeze_idx=freeze_idx)
    if len(vib.freqs_cm) == 0:
        # tiny active spaces: TR projection can annihilate every mode;
        # fall back to the unprojected mass-weighted free-block eigenvector
        from .. import elements
        from .vib import free_block_modes
        N = len(numbers)
        masses = elements.masses_of(np.asarray(numbers, int))
        sqm = np.sqrt(np.repeat(masses, 3))
        _, modes = free_block_modes(H_au, numbers, freeze_idx)
        mode = modes[min(root, modes.shape[0] - 1)] / sqm
        return mode / max(np.linalg.norm(mode), 1e-30)
    order = np.argsort(vib.freqs_cm)
    k = order[min(root, len(order) - 1)]
    mode = vib.modes_cart[k].reshape(-1)
    n = np.linalg.norm(mode)
    return mode / max(n, 1e-30)


def _rotate_dimer(eforce, x_flat, F0, N, length, kw, free_mask_flat):
    """Fourier rotation of the dimer orientation. Returns (N, curvature,
    n_force_calls)."""
    calls = 0
    L = kw["length"]
    for _ in range(kw["rotation_max_cycles"]):
        _, F1 = eforce(x_flat + L * N)
        calls += 1
        dF = F1 - F0
        C0 = -np.dot(dF, N) / L
        F_rot = 2.0 * dF - 2.0 * np.dot(dF, N) * N
        F_rot = F_rot * free_mask_flat
        if kw["rotation_remove_trans"] and free_mask_flat.all():
            # remove net translation (only meaningful without frozen atoms)
            fr3 = F_rot.reshape(-1, 3)
            F_rot = (fr3 - fr3.mean(axis=0)).reshape(-1) * free_mask_flat
        frn = np.linalg.norm(F_rot)
        if frn < kw["rotation_thresh"]:
            return N, C0, calls
        theta_dir = F_rot / frn
        dC = -2.0 * np.dot(dF, theta_dir) / L
        theta1 = -0.5 * np.arctan2(dC, 2.0 * abs(C0) + 1e-30)
        if abs(theta1) < np.deg2rad(kw["rotation_tol"]):
            return N, C0, calls
        N_trial = N * np.cos(theta1) + theta_dir * np.sin(theta1)
        N_trial /= np.linalg.norm(N_trial)
        _, F1t = eforce(x_flat + L * N_trial)
        calls += 1
        C1 = -np.dot(F1t - F0, N_trial) / L
        b1 = 0.5 * dC
        denom = 1.0 - np.cos(2.0 * theta1)
        a1 = (C0 - C1 + b1 * np.sin(2.0 * theta1)) / max(denom, 1e-12)
        theta_min = 0.5 * np.arctan2(b1, a1)
        # pick the minimum (not maximum) of the Fourier curve
        C_min = (a1 * np.cos(2 * theta_min) + b1 * np.sin(2 * theta_min))
        if C_min > 0:
            theta_min += 0.5 * np.pi
        N_new = N * np.cos(theta_min) + theta_dir * np.sin(theta_min)
        N_new /= np.linalg.norm(N_new)
        C_new = C0  # refined next iteration
        prev_N = N
        N = N_new
        if kw["rotation_disable_pos_curv"] and C_new > 0 and C0 < 0:
            N = prev_N
            return N, C0, calls
    return N, C0, calls


def _projected_force(F, N, C, trans_force_f_perp: bool):
    f_par = np.dot(F, N) * N
    if C < 0:
        return (F - 2.0 * f_par) if trans_force_f_perp else (-f_par + (F - f_par))
    return -f_par


def hessian_dimer(
    calc,                          # Calculator (provides hessian + forces)
    x0_bohr_pad: jnp.ndarray,
    *,
    dimer_kw: Optional[Dict[str, Any]] = None,
    thresh_loose: str = "gau_loose",
    thresh: str = "baker",
    update_interval_hessian: int = 500,
    neg_freq_thresh_cm: float = 5.0,
    flatten_amp_ang: float = 0.10,
    flatten_max_iter: int = 50,
    root: int = 0,
    max_step: float = 0.3,
    max_cycles_total: int = 10000,
    callback: Optional[Callable] = None,
    **_ignored,
) -> DimerResult:
    kw = {**DIMER_KW, **(dimer_kw or {})}
    sysm = calc.system
    n = calc.n_atoms
    free_flat_pad = np.repeat(np.asarray(sysm.free_mask) > 0, 3)
    fm_flat = free_flat_pad.astype(float)
    eff = calc.au_energy_force_fn()
    ebatch = calc.au_energy_force_batch_fn()
    P = calc.n_pad

    def eforce_flat(x_flat):
        e, f = eff(jnp.asarray(x_flat.reshape(P, 3)))
        calc.force_calls += 1
        return float(e), np.asarray(f).reshape(-1)

    x = np.asarray(x0_bohr_pad).reshape(-1)
    freeze = calc.structure.freeze

    def fresh_mode(xc):
        H = calc.get_hessian(xc.reshape(P, 3)[:n].reshape(-1))["hessian"]
        d = lowest_mode_direction(H, calc.structure.numbers,
                                  xc.reshape(P, 3)[:n], freeze, root)
        out = np.zeros(3 * P)
        out[: 3 * n] = d
        out *= fm_flat
        nn = np.linalg.norm(out)
        return out / max(nn, 1e-30), H

    N, H0 = fresh_mode(x)
    total_cycles = 0
    converged = False

    def dimer_pass(x, N, thresh_name, budget):
        """LBFGS translation on the projected dimer force."""
        nonlocal total_cycles
        th = get_thresholds(thresh_name)
        e_prev = None
        hist_s, hist_y = [], []
        g_prev = None
        gamma = 1.0     # Barzilai-Borwein H0 scale (clamped; accelerates
                        # the SD-like start)
        trust = min(0.1, max_step)   # adaptive per-pass step cap (Bohr)
        prev_step = None
        cycles = 0
        while cycles < budget and total_cycles < max_cycles_total:
            e, F = eforce_flat(x)
            F = F * fm_flat
            if not kw["rotation_disable"]:
                N, C, _ = _rotate_dimer(eforce_flat, x, F, N,
                                        kw["length"], kw, fm_flat)
            else:
                _, F1 = eforce_flat(x + kw["length"] * N)
                C = -np.dot(F1 - F, N) / kw["length"]
            Fp = _projected_force(F, N, C, kw["trans_force_f_perp"]) * fm_flat
            g = -Fp
            # two-loop LBFGS on projected force
            q = g.copy()
            alphas = []
            for s, y in reversed(list(zip(hist_s, hist_y))):
                rho = 1.0 / max(np.dot(y, s), 1e-30)
                a = rho * np.dot(s, q)
                q -= a * y
                alphas.append((a, s, y))
            r = q * gamma
            for a, s, y in reversed(alphas):
                rho = 1.0 / max(np.dot(y, s), 1e-30)
                b = rho * np.dot(y, r)
                r += (a - b) * s
            step = -r
            mx = np.abs(step).max()
            if mx > trust:
                step *= trust / mx
            # oscillation guard: if this step reverses the previous one,
            # shrink the trust and damp the step (prevents ping-pong over
            # the saddle when the BB scale overshoots)
            if prev_step is not None:
                d = np.dot(step, prev_step)
                if d < 0:
                    trust = max(trust * 0.5, 1e-4)
                    step *= 0.5
                    hist_s.clear()
                    hist_y.clear()
                    gamma = 1.0
                elif np.abs(step).max() >= 0.99 * trust:
                    trust = min(trust * 1.2, max_step)
            prev_step = step.copy()
            x_new = x + step
            dE = 0.0 if e_prev is None else (e - e_prev)
            # convergence on the projected force
            nfree = max(fm_flat.sum(), 1.0)
            max_f = np.abs(Fp).max()
            rms_f = np.sqrt((Fp ** 2).sum() / nfree)
            max_s = np.abs(step).max()
            rms_s = np.sqrt((step ** 2).sum() / nfree)
            if th.baker:
                ok = (max_f < th.max_force) and (
                    (e_prev is not None and abs(dE) < 1e-6)
                    or max_s < th.max_step)
            elif th.never:
                ok = False
            else:
                ok = (max_f < th.max_force and rms_f < th.rms_force
                      and max_s < th.max_step and rms_s < th.rms_step)
            if g_prev is not None:
                s_v = x_new - x_prev_v
                y_v = g - g_prev
                if np.dot(s_v, y_v) > 1e-12:
                    hist_s.append(s_v)
                    hist_y.append(y_v)
                    gamma = float(np.clip(
                        np.dot(s_v, y_v) / max(np.dot(y_v, y_v), 1e-30),
                        1e-2, 10.0))
                    if len(hist_s) > 7:
                        hist_s.pop(0)
                        hist_y.pop(0)
            x_prev_v = x.copy()
            g_prev = g.copy()
            e_prev = e
            x = x_new
            cycles += 1
            total_cycles += 1
            if callback and total_cycles % 50 == 0:
                callback(total_cycles, e, Fp)
            if ok:
                return x, N, True
        return x, N, False

    # (2) loose pass, refresh, (3) tight pass (tsopt.py:775-826)
    x, N, _ = dimer_pass(x, N, thresh_loose, update_interval_hessian)
    N, _ = fresh_mode(x)
    x, N, converged = dimer_pass(x, N, thresh, update_interval_hessian)
    while not converged and total_cycles < max_cycles_total:
        N, _ = fresh_mode(x)
        x, N, converged = dimer_pass(x, N, thresh, update_interval_hessian)

    # (4) flatten loop over extra imaginary modes (tsopt.py:1036-1097)
    for _ in range(flatten_max_iter if flatten_max_iter else 0):
        H = calc.get_hessian(x.reshape(P, 3)[:n].reshape(-1))["hessian"]
        vib = frequencies_and_modes(H, calc.structure.numbers,
                                    x.reshape(P, 3)[:n], freeze)
        n_imag = count_imaginary(vib.freqs_cm, neg_freq_thresh_cm)
        if n_imag <= 1:
            break
        order = np.argsort(vib.freqs_cm)
        extra = [k for k in order[1:n_imag]]
        # batched +/- probes along every extra mode in ONE force call
        amp = flatten_amp_ang * 1.8897259886   # Ang -> Bohr displacement
        probes = []
        for k in extra:
            mode = np.zeros((P, 3))
            mode[:n] = vib.modes_cart[k]
            probes.append(x.reshape(P, 3) + amp * mode)
            probes.append(x.reshape(P, 3) - amp * mode)
        Eb, _ = ebatch(jnp.asarray(np.stack(probes)))
        Eb = np.asarray(Eb)
        # displace along the lowest-energy probe of the most imaginary extra
        best = int(np.argmin(Eb))
        x = probes[best].reshape(-1)
        # re-refine with the dimer
        N, _ = fresh_mode(x)
        x, N, converged = dimer_pass(x, N, thresh, update_interval_hessian)

    # (5) final Hessian + mode export data (tsopt.py:1099-1147)
    H = calc.get_hessian(x.reshape(P, 3)[:n].reshape(-1))["hessian"]
    vib = frequencies_and_modes(H, calc.structure.numbers,
                                x.reshape(P, 3)[:n], freeze)
    n_imag = count_imaginary(vib.freqs_cm, neg_freq_thresh_cm)
    imode = (vib.modes_cart[int(np.argmin(vib.freqs_cm))]
             if len(vib.freqs_cm) else None)
    e_fin, _ = eforce_flat(x)
    return DimerResult(x=jnp.asarray(x.reshape(P, 3)), e=e_fin,
                       freqs_cm=vib.freqs_cm, imag_mode_cart=imode,
                       n_imag=n_imag, converged=converged,
                       cycles=total_cycles)
