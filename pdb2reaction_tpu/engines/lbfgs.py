"""L-BFGS minimizer as a single on-device lax.while_loop.

Capability match: the reference's "light" optimizer — pysisyphus LBFGS with
double damping, component-wise step control and threshold presets
(/root/reference/pdb2reaction/opt.py:218-238, LBFGS_KW). TPU-first design:
the entire optimization (force calls included) is one compiled
``lax.while_loop`` — no host round-trip per cycle, versus the reference's
host->GPU boundary every force call (SURVEY.md §3.2).

Units: atomic units throughout (Bohr coordinates, Hartree energies).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .thresholds import Thresholds, converged, get_thresholds

# Reference LBFGS_KW surface (opt.py:218-238)
LBFGS_KW: Dict[str, Any] = {
    "thresh": "gau",
    "max_cycles": 10000,
    "keep_last": 7,
    "beta": 1.0,
    "max_step": 0.30,
    "control_step": True,
    "double_damp": True,
    "gamma_mult": False,
    "line_search": True,
    "min_step_norm": 1e-8,
    "print_every": 100,
}


class LBFGSState(NamedTuple):
    x: jnp.ndarray          # [D] coords (Bohr, padded-flat)
    e: jnp.ndarray          # scalar energy (Hartree)
    f: jnp.ndarray          # [D] forces
    s_hist: jnp.ndarray     # [M, D]
    y_hist: jnp.ndarray     # [M, D]
    rho: jnp.ndarray        # [M]
    n_hist: jnp.ndarray     # scalar int
    cycle: jnp.ndarray      # scalar int
    done: jnp.ndarray       # bool
    last_step: jnp.ndarray  # [D]
    dE: jnp.ndarray         # scalar
    gamma: jnp.ndarray      # scalar: initial Hessian scale


class OptResult(NamedTuple):
    x: jnp.ndarray
    e: jnp.ndarray
    f: jnp.ndarray
    cycles: jnp.ndarray
    converged: jnp.ndarray


def _two_loop(f, s_hist, y_hist, rho, n_hist, gamma, beta):
    """Two-loop recursion producing the quasi-Newton step direction."""
    M = s_hist.shape[0]
    q = f  # note: we work with forces (= -gradient), so result is the step
    alphas = jnp.zeros(M)

    def bwd(i, carry):
        q, alphas = carry
        j = M - 1 - i  # newest (index n_hist-1) last stored at slot n_hist-1
        valid = j < n_hist
        a = jnp.where(valid, rho[j] * jnp.dot(s_hist[j], q), 0.0)
        q = q - a * y_hist[j] * jnp.where(valid, 1.0, 0.0)
        return q, alphas.at[j].set(a)

    q, alphas = jax.lax.fori_loop(0, M, bwd, (q, alphas))
    r = q * (gamma / beta)

    def fwd(j, r):
        valid = j < n_hist
        b = jnp.where(valid, rho[j] * jnp.dot(y_hist[j], r), 0.0)
        return r + (alphas[j] - b) * s_hist[j] * jnp.where(valid, 1.0, 0.0)

    r = jax.lax.fori_loop(0, M, fwd, r)
    return r


def _double_damp(s, y, s_hist, y_hist, rho, n_hist, gamma, beta,
                 mu1: float = 0.2, mu2: float = 1e-3):
    """Damping to guarantee positive curvature s.y > 0 (double-damped LBFGS).

    First damping (Powell-style on y using the implicit H0 = gamma I):
      theta = 0.8 * sBs / (sBs - sy) when sy < mu1*sBs; y <- theta*y + (1-theta)*B s
    Second damping on s to bound the step length contribution.
    """
    sy = jnp.dot(s, y)
    Bs = s / jnp.maximum(gamma, 1e-12)        # B0 = (1/gamma) I
    sBs = jnp.dot(s, Bs)
    theta = jnp.where(
        sy < mu1 * sBs,
        0.8 * sBs / jnp.maximum(sBs - sy, 1e-12),
        1.0,
    )
    y_d = theta * y + (1.0 - theta) * Bs
    # second damping: shrink s if s.y_d too small relative to y.y
    sy_d = jnp.dot(s, y_d)
    yy = jnp.dot(y_d, y_d)
    phi = jnp.where(sy_d < mu2 * yy, 0.0, 1.0)  # drop pair if still bad
    return s, y_d, phi


def make_lbfgs_step(energy_force_fn, free_mask_flat, th: Thresholds,
                    keep_last: int, max_step: float, beta: float,
                    gamma_mult: bool, line_search: bool, shape3):
    """Build the while-loop body. ``energy_force_fn``: flat Bohr -> (E, F flat)."""

    n_free = jnp.sum(free_mask_flat)

    def body(st: LBFGSState) -> LBFGSState:
        d = _two_loop(st.f, st.s_hist, st.y_hist, st.rho, st.n_hist,
                      st.gamma, beta)
        d = d * free_mask_flat
        # component-wise step control (opt.py "control_step")
        max_comp = jnp.max(jnp.abs(d))
        scale = jnp.where(max_comp > max_step, max_step / jnp.maximum(max_comp, 1e-30), 1.0)
        step = d * scale

        x_new = st.x + step
        e_new, f_new = energy_force_fn(x_new)

        if line_search:
            # polynomial-style backtracking: if energy rose, quadratic
            # interpolation along the step (single retry keeps it on-device)
            def retry(_):
                # minimize quadratic through (0, e0, slope) and (1, e1)
                g0 = -jnp.dot(st.f, step)         # dE/dalpha at 0
                denom = 2.0 * (e_new - st.e - g0)
                alpha = jnp.clip(jnp.where(jnp.abs(denom) > 1e-30,
                                           -g0 / denom, 0.5), 0.05, 0.9)
                x_r = st.x + alpha * step
                e_r, f_r = energy_force_fn(x_r)
                better = e_r < e_new
                return (jnp.where(better, e_r, e_new),
                        jnp.where(better, f_r, f_new),
                        jnp.where(better, x_r, x_new),
                        jnp.where(better, alpha * step, step))

            def keep(_):
                return e_new, f_new, x_new, step

            e2, f2, x2, step2 = jax.lax.cond(e_new > st.e + 1e-12, retry, keep, None)
        else:
            e2, f2, x2, step2 = e_new, f_new, x_new, step

        s = x2 - st.x
        y = st.f - f2   # y = g_new - g_old = -(f_new - f_old)
        s, y, phi = _double_damp(s, y, st.s_hist, st.y_hist, st.rho,
                                 st.n_hist, st.gamma, beta)
        sy = jnp.dot(s, y)
        store = (phi > 0) & (sy > 1e-16)

        # shift history (oldest drops, newest appended at slot n_hist (or M-1))
        M = keep_last
        full = st.n_hist >= M
        sh = jnp.where(full, jnp.roll(st.s_hist, -1, axis=0), st.s_hist)
        yh = jnp.where(full, jnp.roll(st.y_hist, -1, axis=0), st.y_hist)
        rh = jnp.where(full, jnp.roll(st.rho, -1), st.rho)
        slot = jnp.minimum(st.n_hist, M - 1)
        sh = jnp.where(store, sh.at[slot].set(s), st.s_hist)
        yh = jnp.where(store, yh.at[slot].set(y), st.y_hist)
        rh = jnp.where(store, rh.at[slot].set(1.0 / jnp.maximum(sy, 1e-30)), st.rho)
        n_hist = jnp.where(store, jnp.minimum(st.n_hist + 1, M), st.n_hist)

        gamma = jnp.where(
            store & jnp.asarray(gamma_mult),
            sy / jnp.maximum(jnp.dot(y, y), 1e-30),
            st.gamma)

        dE = e2 - st.e
        is_conv = converged(th, f2, step2, dE, n_free)
        return LBFGSState(x=x2, e=e2, f=f2, s_hist=sh, y_hist=yh, rho=rh,
                          n_hist=n_hist, cycle=st.cycle + 1, done=is_conv,
                          last_step=step2, dE=dE, gamma=gamma)

    return body


_NO_PARAMS = object()
_RUN_CACHE: dict = {}


def lbfgs_minimize(
    energy_force_fn: Callable,        # [P,3] Bohr -> (E Ha, F [P,3])
    x0_bohr_pad: jnp.ndarray,         # [P,3]
    free_mask: jnp.ndarray,           # [P]
    *,
    params: Any = _NO_PARAMS,         # when set, fn is (coords, params)
    thresh: str = "gau",
    max_cycles: int = 10000,
    keep_last: int = 7,
    max_step: float = 0.30,
    beta: float = 1.0,
    gamma_mult: bool = False,
    line_search: bool = True,
    chunk: int = 0,                   # 0 = run fully on device
    callback: Optional[Callable] = None,
    restart: Optional[Dict[str, Any]] = None,
    **_ignored,
) -> OptResult:
    """Minimize. ``callback(cycle, e, f)`` fires every ``chunk`` cycles when
    chunk > 0 (host logging); otherwise the whole run is one device program.

    Pass a stable ``energy_force_fn`` (e.g. ``Calculator.au_energy_force_fn_p``)
    plus ``params`` to reuse the compiled loop across calls — scan drivers
    retarget restraints hundreds of times with ONE compilation.

    ``restart={"store": CheckpointStore, "name": str, "every": int}``
    enables mid-run restartability (reference ``dump_restart``,
    opt.py:211-214, done TPU-first): the device loop runs in chunks of
    ``every`` cycles and the full carry is dumped at each host sync; a
    rerun with the same x0/threshold resumes from the last dump instead
    of cycle 0.
    """
    th = get_thresholds(thresh)
    P3 = x0_bohr_pad.size
    mask_flat = jnp.repeat(free_mask, 3)
    use_params = params is not _NO_PARAMS

    key = (energy_force_fn, P3, thresh, keep_last, float(max_step),
           float(beta), bool(gamma_mult), bool(line_search), use_params)
    runner = _RUN_CACHE.get(key)
    if runner is None:
        def make_eff(p):
            def eff_flat(x_flat):
                if use_params:
                    e, f = energy_force_fn(x_flat.reshape(-1, 3), p)
                else:
                    e, f = energy_force_fn(x_flat.reshape(-1, 3))
                return e, f.reshape(-1)
            return eff_flat

        @jax.jit
        def run(st, n_max, p):
            body = make_lbfgs_step(make_eff(p), mask_flat, th, keep_last,
                                   max_step, beta, gamma_mult, line_search,
                                   None)

            def cond(s):
                return (~s.done) & (s.cycle < n_max)
            return jax.lax.while_loop(cond, body, st)

        @jax.jit
        def first(x0f, p):
            return make_eff(p)(x0f)

        runner = (run, first)
        _RUN_CACHE[key] = runner
    run, first = runner

    p_arg = params if use_params else None
    x0f = x0_bohr_pad.reshape(-1)

    rst_every = 0
    rkey = None
    if restart:
        from ..runtime.checkpoint import (content_key, load_state,
                                          save_state)
        rst_every = int(restart.get("every", 50)) or 50
        rkey = content_key(np.asarray(x0f),
                           extra=f"lbfgs:{thresh}:{keep_last}:{max_step}")
        hit = load_state(restart["store"], restart["name"], LBFGSState,
                         expect_key=rkey)
    else:
        hit = None

    if hit is not None:
        init = hit[1]
    else:
        e0, f0 = first(x0f, p_arg)
        init = LBFGSState(
            x=x0f, e=e0, f=f0,
            s_hist=jnp.zeros((keep_last, P3)),
            y_hist=jnp.zeros((keep_last, P3)),
            rho=jnp.zeros(keep_last), n_hist=jnp.array(0),
            cycle=jnp.array(0), done=jnp.array(False),
            last_step=jnp.zeros(P3), dE=jnp.array(0.0), gamma=jnp.array(1.0),
        )

    if rst_every or (chunk and callback is not None):
        step_c = rst_every or chunk
        st = init
        while (not bool(st.done)) and int(st.cycle) < max_cycles:
            st = run(st, jnp.minimum(st.cycle + step_c, max_cycles), p_arg)
            if callback is not None:
                callback(int(st.cycle), float(st.e), np.asarray(st.f))
            if rst_every:
                save_state(restart["store"], restart["name"], st,
                           {"key": rkey, "done": bool(st.done)})
    else:
        st = run(init, jnp.array(max_cycles), p_arg)

    return OptResult(x=st.x.reshape(-1, 3), e=st.e, f=st.f.reshape(-1, 3),
                     cycles=st.cycle, converged=st.done)
