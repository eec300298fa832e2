"""Rational Function Optimization — minimization (RFO) and TS search
(RS-I-RFO / P-RFO) in one engine.

Capability match: the reference's "heavy" optimizers — pysisyphus
``RFOptimizer`` (/root/reference/pdb2reaction/opt.py:241-277, RFO_KW) and
``RSIRFOptimizer`` (tsopt.py:1226-1241, RSIRFO_KW): trust-region step
control, BFGS/Bofill Hessian updates, exact-Hessian init/recalc, uphill
mode following for TS.

Design notes (TPU-first, not a port):
- Work happens in the compact free-DOF space (static shape). Each cycle is
  one jitted device step: eigendecomposition + restricted-step solve +
  quasi-Newton update. The restricted step solves the RFO secular equation
  nu = sum_i g_i^2/(nu - lam_i) by bisection (device-friendly fixed-iteration
  loop), falling back to a trust-radius shift when the unconstrained RFO
  step exceeds the trust region.
- TS mode uses the image-function formulation (the "I" in RS-I-RFO): the
  eigenvalues/gradient components of the followed roots are sign-flipped and
  the same minimization step machinery runs on the image spectrum, which
  walks uphill along the followed modes and downhill along the rest.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .thresholds import converged as _conv_check, get_thresholds
from .dof import DofMap

# Reference option surfaces (opt.py:241-277; tsopt.py:1226-1241)
RFO_KW: Dict[str, Any] = {
    "thresh": "gau",
    "max_cycles": 10000,
    "trust_radius": 0.10,
    "trust_update": True,
    "trust_min": 0.00,
    "trust_max": 0.10,
    "hessian_update": "bfgs",
    "hessian_init": "calc",
    "hessian_recalc": 200,
    "small_eigval_thresh": 1e-8,
    "max_micro_cycles": 50,
    "line_search": True,
    "print_every": 100,
}

_NO_PARAMS = object()

RSIRFO_KW: Dict[str, Any] = {
    **RFO_KW,
    "thresh": "baker",
    "roots": [0],
    "hessian_update": "bofill",
    "hessian_recalc_reset": True,
    "max_micro_cycles": 50,
    "assert_neg_eigval": False,
}


class RfoResult(NamedTuple):
    x: jnp.ndarray          # [P,3] Bohr
    e: float
    f: jnp.ndarray          # [P,3]
    hessian: np.ndarray     # [Df, Df] final quasi-Newton Hessian (au)
    cycles: int
    converged: bool


def _secular_rfo_step(lam, gt, trust, n_iter: int = 64):
    """Restricted RFO step in the eigenbasis.

    lam: [D] eigenvalues; gt: [D] gradient in eigenbasis. Solves
    f(nu) = nu - sum g^2/(nu - lam) = 0 for nu < min(lam) by bisection,
    then s_i = g_i / (nu - lam_i) (note g here is gradient, so step is
    downhill). If |s| > trust, instead find shift mu < min(lam) with
    |s(mu)| = trust (Levenberg-style), also by bisection.
    """
    g2 = gt * gt
    lam_min = jnp.min(lam)
    # --- RFO nu: bracket [lo, hi], f is increasing in nu on (-inf, lam_min)
    gnorm = jnp.sqrt(jnp.sum(g2))
    lo = lam_min - gnorm - 1.0
    hi = lam_min - 1e-12

    def f_nu(nu):
        return nu - jnp.sum(g2 / (nu - lam))

    def bisect(f, lo, hi):
        def body(_, ab):
            a, b = ab
            m = 0.5 * (a + b)
            fm = f(m)
            a = jnp.where(fm < 0, m, a)
            b = jnp.where(fm < 0, b, m)
            return a, b
        a, b = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
        return 0.5 * (a + b)

    # ensure lo brackets: f(lo) < 0. f(nu) -> -inf as nu -> -inf? f(nu)=nu - sum...
    # As nu -> -inf, f ~ nu -> -inf (<0). As nu -> lam_min^-, f -> +inf. OK.
    nu = bisect(f_nu, lo - 10.0 * gnorm, hi)
    s_rfo = gt / (nu - lam)
    s_norm = jnp.sqrt(jnp.sum(s_rfo * s_rfo))

    # --- trust-limited shifted-Newton step if RFO step too long
    def step_len(mu):
        s = gt / (mu - lam)
        return jnp.sqrt(jnp.sum(s * s))

    def f_mu(mu):
        return step_len(mu) - trust   # decreasing in -mu distance

    # |s(mu)| decreases as mu -> -inf; bracket lo2 (far) .. hi2 (near lam_min)
    lo2 = lam_min - gnorm / jnp.maximum(trust, 1e-12) - 1.0
    hi2 = lam_min - 1e-10

    def bisect_mu(lo, hi):
        def body(_, ab):
            a, b = ab
            m = 0.5 * (a + b)
            too_long = f_mu(m) > 0
            # step too long -> move away from lam_min (decrease mu): set b=m? no:
            # far (a) gives short step, near (b) gives long step.
            a2 = jnp.where(too_long, a, m)
            b2 = jnp.where(too_long, m, b)
            return a2, b2
        a, b = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
        return 0.5 * (a + b)

    mu = bisect_mu(lo2, hi2)
    s_tr = gt / (mu - lam)

    use_tr = s_norm > trust
    return jnp.where(use_tr, s_tr, s_rfo)


def _bfgs_update(H, s, y):
    Hs = H @ s
    sy = jnp.dot(s, y)
    sHs = jnp.dot(s, Hs)
    dH = (jnp.outer(y, y) / jnp.where(jnp.abs(sy) > 1e-30, sy, 1e-30)
          - jnp.outer(Hs, Hs) / jnp.where(jnp.abs(sHs) > 1e-30, sHs, 1e-30))
    ok = (sy > 1e-12)
    return jnp.where(ok, H + dH, H)


def _bofill_update(H, s, y):
    """Bofill: phi*SR1 + (1-phi)*PSB (tsopt.py:514-580 semantics)."""
    r = y - H @ s                   # residual
    ss = jnp.dot(s, s)
    rr = jnp.dot(r, r)
    sr = jnp.dot(s, r)
    phi = jnp.where(ss * rr > 1e-30, (sr * sr) / (ss * rr), 0.0)
    dH_sr1 = jnp.outer(r, r) / jnp.where(jnp.abs(sr) > 1e-30, sr, 1e-30)
    dH_psb = ((jnp.outer(r, s) + jnp.outer(s, r)) / jnp.maximum(ss, 1e-30)
              - sr * jnp.outer(s, s) / jnp.maximum(ss * ss, 1e-30))
    ok = jnp.abs(sr) > 1e-14
    dH = phi * jnp.where(ok, dH_sr1, 0.0) + (1.0 - phi) * dH_psb
    return H + dH


def make_rfo_cycle(ts_roots: Optional[Sequence[int]], hessian_update: str,
                   small_eigval_thresh: float):
    """Build the jitted per-cycle step function over compact [Df] arrays."""

    n_roots = len(ts_roots) if ts_roots else 0
    if ts_roots:
        roots = tuple(int(r) for r in ts_roots)

    def cycle(H, g, trust):
        lam, V = jnp.linalg.eigh(H)
        gt = V.T @ g
        # remove near-zero modes (TR modes of unfrozen systems)
        tiny = jnp.abs(lam) < small_eigval_thresh
        gt = jnp.where(tiny, 0.0, gt)
        lam_eff = jnp.where(tiny, 1.0, lam)
        if n_roots:
            # image function: flip followed roots (lowest-eigenvalue modes)
            flip = jnp.zeros_like(lam, dtype=bool)
            for r in roots:
                flip = flip.at[r].set(True)
            lam_eff = jnp.where(flip, -lam_eff, lam_eff)
            gt = jnp.where(flip, -gt, gt)
        st = _secular_rfo_step(lam_eff, gt, trust)
        # NOTE: no un-flip — the image transform acts on the function, not
        # the coordinates; the image-minimization step applies directly.
        st = jnp.where(tiny, 0.0, st)
        step = V @ st
        pred = jnp.dot(g, step) + 0.5 * jnp.dot(step, (H @ step))
        return step, pred, lam

    upd = _bofill_update if hessian_update == "bofill" else _bfgs_update
    return jax.jit(cycle), jax.jit(upd)


_RFO_RUN_CACHE: dict = {}


_GDIIS_M = 6      # DIIS history depth (host version kept 6 too)


def _make_rfo_runner(energy_force_fn, dmap: DofMap, ts_roots,
                     hessian_update: str, small_eigval_thresh: float,
                     th, mode: str, trust_update: bool, trust_min: float,
                     trust_max: float, max_energy_incr, use_params: bool,
                     gdiis: bool = False, gdiis_thresh: float = 2.5e-3):
    """Device while_loop running RFO/RS-I-RFO cycles between Hessian
    refreshes — one host sync per chunk instead of per cycle (same design
    as engines/lbfgs.py; a host-synced cycle costs ~7.3 s through the axon
    relay vs ms of compute).

    ``gdiis=True`` adds the GDIIS endgame ON DEVICE: a fixed-depth ring
    buffer of (geometry, gradient) pairs and a masked (M+2)x(M+2) DIIS
    solve per cycle — the least-squares c minimizing |sum c_i g_i| with
    sum c_i = 1 (reference RFO gdiis=True, opt.py:262-271), gated on small
    RFO steps and rejected on ill-conditioning (|c|_max > 10, singular
    system -> non-finite solve) or an over-long extrapolation."""
    key = (energy_force_fn, tuple(dmap.free_idx.tolist()), ts_roots,
           hessian_update, float(small_eigval_thresh), th, mode,
           bool(trust_update), float(trust_min), float(trust_max),
           None if max_energy_incr is None else float(max_energy_incr),
           bool(use_params), bool(gdiis), float(gdiis_thresh))
    hit = _RFO_RUN_CACHE.get(key)
    if hit is not None:
        return hit

    cycle_j, update_j = make_rfo_cycle(ts_roots, hessian_update,
                                       small_eigval_thresh)
    n_free_dof = float(dmap.n_free)
    is_min = mode == "min"
    M = _GDIIS_M

    def _gdiis_device(hist_x, hist_g, n_hist, x_free, step, g, H, trust):
        """Masked DIIS extrapolation; returns the (possibly) replaced step."""
        g_est = g + H @ step
        Xc = jnp.concatenate([hist_x, (x_free + step)[None]], 0)  # [M+1,D]
        Gc = jnp.concatenate([hist_g, g_est[None]], 0)
        valid = jnp.concatenate(
            [jnp.arange(M) < n_hist, jnp.ones((1,), bool)])
        Bm = Gc @ Gc.T
        vm = valid[:, None] & valid[None, :]
        A = jnp.zeros((M + 2, M + 2), Bm.dtype)
        A = A.at[: M + 1, : M + 1].set(
            jnp.where(vm, Bm, 0.0)
            + jnp.diag(jnp.where(valid, 0.0, 1.0)))
        A = A.at[M + 1, : M + 1].set(valid.astype(Bm.dtype))
        A = A.at[: M + 1, M + 1].set(valid.astype(Bm.dtype))
        rhs = jnp.zeros((M + 2,), Bm.dtype).at[M + 1].set(1.0)
        sol = jnp.linalg.solve(A, rhs)
        c = jnp.where(valid, sol[: M + 1], 0.0)
        dstep = c @ Xc - x_free
        nrm = jnp.linalg.norm(dstep)
        step_rms = jnp.sqrt(jnp.mean(step * step))
        ok = (jnp.all(jnp.isfinite(c))
              & (jnp.max(jnp.abs(c)) <= 10.0)
              & (nrm > 0.0) & (nrm <= 2.0 * trust)
              & (step_rms < gdiis_thresh) & (n_hist >= 1))
        return jnp.where(ok, dstep, step)

    @jax.jit
    def run(x0, H0, e0, f0, trust0, budget, hist0, p):
        def eff(xc):
            return energy_force_fn(xc, p) if use_params \
                else energy_force_fn(xc)

        def body(st):
            x, H, e, f, trust, cyc, done, hist_x, hist_g, n_hist = st
            x_free = dmap.gather(x)
            g = -dmap.gather(f)
            step, pred, lam = cycle_j(H, g, trust)
            if gdiis and is_min:
                step = _gdiis_device(hist_x, hist_g, n_hist, x_free,
                                     step, g, H, trust)
            x_new = dmap.scatter(x_free + step, x)
            e_new, f_new = eff(x_new)
            dE = e_new - e
            g_new = -dmap.gather(f_new)
            reject = jnp.array(False) if max_energy_incr is None \
                else (dE > max_energy_incr)
            slen = jnp.linalg.norm(step)
            if trust_update:
                ratio = jnp.where(jnp.abs(pred) > 1e-14, dE / pred, 1.0)
                shrink = (ratio < 0.25) | (jnp.asarray(is_min) & (dE > 1e-12))
                grow = (ratio > 0.75) & (slen >= 0.8 * trust)
                trust_new = jnp.where(
                    shrink, jnp.maximum(trust_min,
                                        jnp.minimum(trust, slen) * 0.5),
                    jnp.where(grow, jnp.minimum(trust_max, trust * 2.0),
                              trust))
                trust_new = jnp.maximum(trust_new, 1e-4)
            else:
                trust_new = trust
            trust_new = jnp.where(
                reject, jnp.maximum(trust_min, 0.25 * slen), trust_new)
            H_new = update_j(H, step, g_new - g)
            is_conv = _conv_check(th, f_new.reshape(-1),
                                  (x_new - x).reshape(-1), dE,
                                  jnp.asarray(n_free_dof))
            # DIIS ring buffer: append the accepted geometry/gradient
            full = n_hist >= M
            hx2 = jnp.where(full, jnp.roll(hist_x, -1, axis=0), hist_x)
            hg2 = jnp.where(full, jnp.roll(hist_g, -1, axis=0), hist_g)
            slot = jnp.minimum(n_hist, M - 1)
            hx2 = hx2.at[slot].set(dmap.gather(x_new))
            hg2 = hg2.at[slot].set(g_new)
            n2 = jnp.minimum(n_hist + 1, M)
            # on reject: keep everything but the shrunken trust
            x2 = jnp.where(reject, x, x_new)
            H2 = jnp.where(reject, H, H_new)
            e2 = jnp.where(reject, e, e_new)
            f2 = jnp.where(reject, f, f_new)
            hx2 = jnp.where(reject, hist_x, hx2)
            hg2 = jnp.where(reject, hist_g, hg2)
            n2 = jnp.where(reject, n_hist, n2)
            return (x2, H2, e2, f2, trust_new, cyc + 1,
                    is_conv & ~reject, hx2, hg2, n2)

        def cond(st):
            return (~st[6]) & (st[5] < budget)

        hist_x0, hist_g0, n_hist0 = hist0
        return jax.lax.while_loop(
            cond, body,
            (x0, H0, e0, f0, trust0, jnp.array(0), jnp.array(False),
             hist_x0, hist_g0, n_hist0))

    _RFO_RUN_CACHE[key] = run
    return run


def rfo_optimize(
    energy_force_fn: Callable,      # [P,3] Bohr -> (E Ha, F [P,3] au)
    x0_bohr_pad: jnp.ndarray,
    free_mask: jnp.ndarray,         # [P]
    n_atoms: int,
    *,
    hessian0: np.ndarray,           # (3N,3N) or (Df,Df) au
    mode: str = "min",              # "min" | "ts"
    roots: Sequence[int] = (0,),
    thresh: str = "gau",
    max_cycles: int = 10000,
    trust_radius: float = 0.10,
    trust_update: bool = True,
    trust_min: float = 0.0,
    trust_max: float = 0.10,
    hessian_update: str = "bfgs",
    hessian_recalc: Optional[int] = 200,
    hessian_fn: Optional[Callable] = None,   # x_pad -> (3N,3N) au (exact)
    params: Any = _NO_PARAMS,                # packed params for fn(x, p)
    small_eigval_thresh: float = 1e-8,
    max_energy_incr: Optional[float] = None,
    gdiis: bool = True,
    gdiis_thresh: float = 2.5e-3,   # RMS(step) gate (opt.py:266)
    callback: Optional[Callable] = None,
    print_every: int = 100,
    **_ignored,
) -> RfoResult:
    th = get_thresholds(thresh)
    dmap = DofMap(np.asarray(free_mask), n_atoms)
    Df = dmap.n_free

    H = np.asarray(hessian0, dtype=np.float64)
    if H.shape[0] == 3 * n_atoms:
        H = dmap.compact_hessian(H)
    assert H.shape == (Df, Df), (H.shape, Df)
    H = jnp.asarray(H)

    ts_roots = tuple(roots) if mode == "ts" else None
    use_params = params is not _NO_PARAMS
    p_arg = params if use_params else None

    # One device while_loop per Hessian-refresh chunk — single host sync —
    # for BOTH modes: RS-I-RFO TS refinement and GDIIS-accelerated
    # minimization (the DIIS solve runs on device too).
    runner = _make_rfo_runner(energy_force_fn, dmap, ts_roots,
                              hessian_update, small_eigval_thresh, th,
                              mode, trust_update, trust_min, trust_max,
                              max_energy_incr, use_params,
                              gdiis=bool(gdiis and mode == "min"),
                              gdiis_thresh=float(gdiis_thresh))
    eff0 = (lambda xc: energy_force_fn(xc, p_arg)) if use_params \
        else energy_force_fn
    x = jnp.asarray(x0_bohr_pad)
    e_j, f = eff0(x)
    H = jnp.asarray(H)
    trust = jnp.asarray(float(trust_radius))
    hist = (jnp.zeros((_GDIIS_M, Df)), jnp.zeros((_GDIIS_M, Df)),
            jnp.array(0))
    cyc_total = 0
    conv = False
    while cyc_total < max_cycles and not conv:
        chunk = max_cycles - cyc_total
        if hessian_fn is not None and hessian_recalc:
            chunk = min(chunk, int(hessian_recalc))
        st = runner(x, H, e_j, f, trust, jnp.asarray(chunk), hist, p_arg)
        x, H, e_j, f, trust, ncyc, done = st[:7]
        hist = st[7:]
        cyc_total += int(ncyc)
        conv = bool(done)
        if callback:
            callback(cyc_total, float(e_j), np.asarray(f))
        if not conv and hessian_fn is not None and hessian_recalc \
                and cyc_total < max_cycles:
            Hfull = hessian_fn(x)
            H = jnp.asarray(dmap.compact_hessian(np.asarray(Hfull)))
    return RfoResult(x=x, e=float(e_j), f=f, hessian=np.asarray(H),
                     cycles=cyc_total, converged=conv)
