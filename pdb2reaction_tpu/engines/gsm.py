"""Growing String Method with image-parallel batched forces.

Capability match: pysisyphus ``GrowingString`` + ``StringOptimizer`` as
configured by the reference (/root/reference/pdb2reaction/path_opt.py:168-200,
GS_KW/STOPT_KW): double-ended growth, equal-arc reparametrization, climbing
image above ``climb_rms``, perpendicular-force growth criterion, frontier
growth until ``max_nodes`` internal nodes exist, extra ``stop_in_when_full``
cycles after the string is fully grown.

TPU-first redesign (not a port):
- The string lives as ONE padded array [M, P, 3] (M = max_nodes + 2) from
  the start; "growing" flips entries of an image-active mask, so every jit
  shape is static (SURVEY.md §7 hard part #2).
- Every macro cycle evaluates ALL images in a single batched, mesh-sharded
  force call — the reference walks images serially through one calculator
  (path_opt.py:823, SURVEY.md §2.2). This is the headline speedup.
- Upwinded tangents (Henkelman-Jonsson), perpendicular projection, scaled
  steepest-descent step with global/per-image scaling, and arc-length
  reparametrization are all vectorized over the image axis on device.
- The climbing-image tangent (climb_lanczos, reference path_opt.py:177) is
  the TRUE lowest-curvature direction, computed by Lanczos iteration on the
  analytic Hessian-vector product (``lanczos_lowest_mode``, wired in via
  ``hvp_fn`` by workflows/path_opt.py) — pysisyphus probes the same operator
  with finite-difference force calls; here each product is one jvp. Growth
  fidelity measured on the Muller-Brown curved valley
  (tests/test_gsm.py::test_gsm_growth_fidelity_curved_valley): grown-only
  string 0.078 Ang off the analytic MEP, relax phase halves that (0.035),
  climbing image lands 0.002 Ang from the true saddle.
- Two loop drivers: ``loop="device"`` (default) runs growth and relaxation
  each as ONE on-device lax.while_loop (one host sync per phase);
  ``loop="host"`` drives the same jitted macro-cycle program from a host
  loop — the compiled program is just the batched force call plus a small
  epilogue, so giant backbones (300-atom eSCN) pay seconds of compile
  instead of the ~35-minute batched-string while_loop program (bench.py's
  flagship eSCN GSM section uses this).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Reference option surface (path_opt.py:168-200)
GS_KW: Dict[str, Any] = {
    "fix_first": True,
    "fix_last": True,
    "max_nodes": 10,
    "perp_thresh": 5e-3,
    "reparam_every": 1,
    "reparam_every_full": 1,
    "param": "equi",
    "max_micro_cycles": 10,
    "climb": True,
    "climb_rms": 5e-4,
    "climb_lanczos": True,
    "climb_lanczos_rms": 5e-4,
    "climb_fixed": False,
}

STOPT_KW: Dict[str, Any] = {
    "stop_in_when_full": 300,
    "max_cycles": 300,
    "scale_step": "global",
    "print_every": 10,
}


class GsmResult(NamedTuple):
    images: np.ndarray       # [M, P, 3] Bohr
    energies: np.ndarray     # [M] Hartree
    hei_idx: int
    converged: bool
    cycles: int
    force_calls: int
    perp_rms: float = float("nan")   # final overall perpendicular-force RMS


def select_hei_index(energies) -> int:
    """Prefer internal local maxima (reference path_opt.py:263-278)."""
    E = np.asarray(energies, dtype=float)
    n = len(E)
    if n >= 3:
        cands = [i for i in range(1, n - 1)
                 if E[i] > E[i - 1] and E[i] > E[i + 1]]
        if cands:
            return int(max(cands, key=lambda i: E[i]))
        return 1 + int(np.argmax(E[1:-1]))
    return int(np.argmax(E))


def _interp_linear(x0, x1, M):
    w = jnp.linspace(0.0, 1.0, M)[:, None, None]
    return (1.0 - w) * x0[None] + w * x1[None]


@jax.jit
def _tangents(images, energies, img_mask):
    """Upwinded tangents per image [M,P,3]; endpoints use one-sided."""
    M = images.shape[0]
    fwd = jnp.roll(images, -1, axis=0) - images          # x_{i+1} - x_i
    bwd = images - jnp.roll(images, 1, axis=0)
    e_next = jnp.roll(energies, -1)
    e_prev = jnp.roll(energies, 1)
    higher_fwd = (e_next > e_prev)[:, None, None]
    tau = jnp.where(higher_fwd, fwd, bwd)
    # endpoints: one-sided
    tau = tau.at[0].set(fwd[0])
    tau = tau.at[M - 1].set(bwd[M - 1])
    norm = jnp.sqrt(jnp.sum(tau * tau, axis=(1, 2), keepdims=True) + 1e-30)
    return tau / norm


@jax.jit
def _reparam_equal_arc(images, img_mask):
    """Redistribute interior images at equal arc length along the string."""
    M = images.shape[0]
    seg = images[1:] - images[:-1]
    seglen = jnp.sqrt(jnp.sum(seg * seg, axis=(1, 2)) + 1e-30)   # [M-1]
    cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seglen)])     # [M]
    total = cum[-1]
    targets = jnp.linspace(0.0, 1.0, M) * total
    # find segment index for each target via searchsorted
    seg_idx = jnp.clip(jnp.searchsorted(cum, targets, side="right") - 1,
                       0, M - 2)
    t0 = cum[seg_idx]
    frac = (targets - t0) / jnp.maximum(seglen[seg_idx], 1e-30)
    newpos = images[seg_idx] + frac[:, None, None] * seg[seg_idx]
    newpos = newpos.at[0].set(images[0])
    newpos = newpos.at[M - 1].set(images[M - 1])
    return newpos


_STEP_CACHE: dict = {}


def make_macro_step(eforce_batch_fn, free_mask, max_step: float,
                    scale_step: str, fix_ends: bool = True):
    """One jitted macro cycle: batched forces -> projected step.

    Cached per (force closure, step policy): repeated gsm_mep calls with the
    same calculator (path-search runs many segments) reuse one compiled
    program instead of re-tracing each segment."""
    key = (eforce_batch_fn, float(max_step), scale_step,
           bool(fix_ends))
    hit = _STEP_CACHE.get(key)
    if hit is not None:
        return hit

    fm = free_mask[None, :, None]
    core = _make_step_core(fm, max_step, scale_step, fix_ends)

    @jax.jit
    def step_fn(images, img_mask, climb_on, hei_idx, tau_hei, use_tau_hei):
        E, F = eforce_batch_fn(images)
        return core(images, E, F, img_mask, climb_on, hei_idx, tau_hei,
                    use_tau_hei)

    _STEP_CACHE[key] = step_fn
    return step_fn


def _make_step_core(fm, max_step: float, scale_step: str, fix_ends: bool):
    """Everything in a GSM macro step AFTER the batched force call:
    tangents, projection, climbing, step scaling, metrics. Shared between
    the fused step program (make_macro_step — device loops) and the
    host-loop epilogue programs (make_host_cycles), so both loop drivers
    run literally the same math."""

    def core(images, E, F, img_mask, climb_on, hei_idx, tau_hei,
             use_tau_hei):
        F = F * fm
        tau = _tangents(images, E, img_mask)
        # climb_lanczos: the HEI tangent may be overridden by the Lanczos
        # lowest-curvature direction (reference path_opt.py:177)
        tau = jnp.where(use_tau_hei, tau.at[hei_idx].set(tau_hei), tau)
        f_par = jnp.sum(F * tau, axis=(1, 2), keepdims=True) * tau
        f_perp = F - f_par
        M = images.shape[0]
        # climbing image: invert parallel component on the HEI
        climb_vec = f_perp - f_par  # NOTE: full climbing force F - 2(F.tau)tau
        is_hei = (jnp.arange(M) == hei_idx)[:, None, None] & climb_on
        f_eff = jnp.where(is_hei, climb_vec, f_perp)
        # endpoints fixed
        active = img_mask[:, None, None]
        f_eff = f_eff * active
        if fix_ends:  # reference fix_first/fix_last (path_opt.py:169-170)
            f_eff = f_eff.at[0].set(0.0).at[M - 1].set(0.0)
        # steepest-descent step with scaling
        if scale_step == "per_image":
            mx = jnp.max(jnp.abs(f_eff), axis=(1, 2), keepdims=True)
            scale = jnp.minimum(1.0, max_step / jnp.maximum(mx, 1e-30))
        else:  # global
            mx = jnp.max(jnp.abs(f_eff))
            scale = jnp.minimum(1.0, max_step / jnp.maximum(mx, 1e-30))
        step = f_eff * scale
        new_images = images + step
        # metrics
        perp_rms = jnp.sqrt(
            jnp.sum(f_perp * f_perp * active, axis=(1, 2))
            / jnp.maximum(jnp.sum(jnp.ones_like(f_perp) * fm * active,
                                  axis=(1, 2)), 1.0))
        rms_all = jnp.sqrt(jnp.sum(f_perp * f_perp * active)
                           / jnp.maximum(jnp.sum(jnp.ones_like(f_perp)
                                                 * fm * active), 1.0))
        # max |climbing force| on the HEI (full force with inverted parallel
        # component): drives the climb-converged criterion
        hei_fmax = jnp.max(jnp.abs(climb_vec[hei_idx] * fm[0]))
        return new_images, E, perp_rms, rms_all, hei_fmax

    return core


def _hei_device(E):
    """Device version of select_hei_index: prefer internal local maxima."""
    M = E.shape[0]
    interior = (jnp.arange(M) > 0) & (jnp.arange(M) < M - 1)
    is_max = (E > jnp.roll(E, 1)) & (E > jnp.roll(E, -1)) & interior
    any_max = jnp.any(is_max)
    cand = jnp.where(is_max, E, -jnp.inf)
    hei_lmax = jnp.argmax(cand)
    hei_int = 1 + jnp.argmax(jnp.where(interior, E, -jnp.inf)[1:M - 1])
    return jnp.where(any_max, hei_lmax, hei_int).astype(jnp.int32)


def lanczos_lowest_mode(hvp, x_pad, v0_flat, free_mask_flat,
                        iters: int = 10):
    """Lowest-curvature direction at ``x_pad`` by Lanczos iteration on the
    analytic Hessian-vector product (the climb_lanczos tangent,
    reference path_opt.py:177 — pysisyphus probes the same operator with
    finite-difference force calls; here each product is one jvp).

    hvp: (x_pad [P,3], v_pad [P,3]) -> H v [P,3].
    Returns a unit [D] flat direction restricted to free DOFs.
    """
    D = v0_flat.shape[0]
    q0 = v0_flat * free_mask_flat
    q0 = q0 / jnp.maximum(jnp.linalg.norm(q0), 1e-30)

    BIG = 1e6   # padding eigenvalue after Krylov breakdown: never lowest

    def body(carry, _):
        Q, q, q_prev, beta, alphas, betas, k, alive = carry
        Hq = hvp(x_pad, q.reshape(x_pad.shape)).reshape(-1) * free_mask_flat
        alpha = jnp.dot(q, Hq)
        r = Hq - alpha * q - beta * q_prev
        # full reorthogonalization (small iters, numerically safe)
        r = r - Q.T @ (Q @ r)
        beta_new = jnp.linalg.norm(r)
        # breakdown: the Krylov space is exhausted (free-DOF count < iters);
        # decouple the remaining tridiagonal rows with huge diagonals
        alive_next = alive & (beta_new > 1e-10)
        q_new = jnp.where(alive_next, r / jnp.maximum(beta_new, 1e-30), 0.0)
        Q = Q.at[k].set(jnp.where(alive, q, 0.0))
        alphas = alphas.at[k].set(jnp.where(alive, alpha, BIG))
        betas = betas.at[k].set(jnp.where(alive_next, beta_new, 0.0))
        return (Q, q_new, q, beta_new, alphas, betas, k + 1,
                alive_next), None

    Q0 = jnp.zeros((iters, D), v0_flat.dtype)
    init = (Q0, q0, jnp.zeros(D, v0_flat.dtype),
            jnp.asarray(0.0, v0_flat.dtype),
            jnp.zeros(iters, v0_flat.dtype),
            jnp.zeros(iters, v0_flat.dtype), jnp.asarray(0),
            jnp.asarray(True))
    (Q, _, _, _, alphas, betas, _, _), _ = jax.lax.scan(
        body, init, None, length=iters)
    T = jnp.diag(alphas) + jnp.diag(betas[:-1], 1) + jnp.diag(betas[:-1], -1)
    w, U = jnp.linalg.eigh(T)
    ritz = Q.T @ U[:, 0]
    ritz = ritz * free_mask_flat
    return ritz / jnp.maximum(jnp.linalg.norm(ritz), 1e-30)


_GROWTH_CACHE: dict = {}


def make_device_growth(eforce_batch_fn, free_mask, max_step: float,
                       scale_step: str, perp_thresh: float,
                       max_micro_cycles: int, fix_ends: bool = True):
    """The double-ended growth phase as ONE on-device lax.while_loop.

    Frontier bookkeeping (grow-on-relaxed-perp-force, stall-forced growth,
    linear re-interpolation of the ungrown interior) is all expressible
    with traced integers, so the whole growth runs with a single host sync
    like the fully-grown relaxation — a host growth cycle costs a full
    dispatch round-trip (~0.5 s measured through the axon relay) vs 20 ms
    of compute.

    Returns jitted ``grow(images, n_left0, n_right0, n_max) ->
    (images, n_left, n_right, cycles, E)``.
    """
    key = (eforce_batch_fn, float(max_step), scale_step,
           float(perp_thresh), int(max_micro_cycles), bool(fix_ends))
    hit = _GROWTH_CACHE.get(key)
    if hit is not None:
        return hit

    step_fn = make_macro_step(eforce_batch_fn, free_mask, max_step,
                              scale_step, fix_ends)

    @jax.jit
    def grow(images, nl0, nr0, n_max):
        M = images.shape[0]
        k = jnp.arange(M)

        def reinterp(imgs, nl, nr):
            # Documented deviation from pysisyphus (which extrapolates new
            # frontier nodes along the current string tangent): the ungrown
            # interior is re-interpolated LINEARLY between the frontier
            # nodes each cycle. Measured on the Muller-Brown curved valley
            # (tests/test_gsm.py::test_gsm_growth_fidelity_curved_valley):
            # the grown-only string sits 0.078 Ang off the analytic MEP,
            # the relax phase halves that (0.035) and the climbing image
            # still lands 0.002 Ang from the true saddle - the relax-phase
            # reparametrization repairs the growth-phase shortcut.
            li = nl
            ri = M - 1 - nr
            xli = imgs[li]
            xri = imgs[ri]
            w = ((k - li) / jnp.maximum(ri - li, 1)).astype(imgs.dtype)
            interior = (k > li) & (k < ri)
            interp = ((1.0 - w)[:, None, None] * xli[None]
                      + w[:, None, None] * xri[None])
            return jnp.where(interior[:, None, None], interp, imgs)

        def cond(st):
            imgs, nl, nr, stall, cyc, E = st
            return ((nl + nr) < (M - 2)) & (cyc < n_max)

        def body(st):
            imgs, nl, nr, stall, cyc, _E = st
            gm = ((k <= nl) | (k >= M - 1 - nr)).astype(imgs.dtype)
            imgs_new, E, perp_rms, rms_all, _ = step_fn(
                imgs, gm, jnp.array(False), jnp.asarray(M // 2),
                jnp.zeros_like(imgs[0]), jnp.array(False))
            imgs2 = jnp.where(gm[:, None, None] > 0, imgs_new, imgs)
            # grow a frontier once its perpendicular force has relaxed
            # below perp_thresh (pysisyphus growth criterion)
            can = (nl + nr) < (M - 2)
            grow_l = (perp_rms[nl] < perp_thresh) & can
            nl2 = nl + grow_l.astype(nl.dtype)
            can2 = (nl2 + nr) < (M - 2)
            grow_r = (perp_rms[M - 1 - nr] < perp_thresh) & can2
            nr2 = nr + grow_r.astype(nr.dtype)
            grew = grow_l | grow_r
            stall2 = jnp.where(grew, 0, stall + 1)
            force = (~grew) & (stall2 >= max_micro_cycles) \
                & ((nl2 + nr2) < (M - 2))
            nl3 = jnp.where(force & (nl2 <= nr2), nl2 + 1, nl2)
            nr3 = jnp.where(force & (nl2 > nr2), nr2 + 1, nr2)
            stall3 = jnp.where(force, 0, stall2)
            imgs3 = reinterp(imgs2, nl3, nr3)
            return (imgs3, nl3, nr3, stall3, cyc + 1, E)

        st0 = (reinterp(images, nl0, nr0), nl0, nr0, jnp.array(0),
               jnp.array(0), jnp.zeros(M, images.dtype))
        imgs, nl, nr, stall, cyc, E = jax.lax.while_loop(cond, body, st0)
        return imgs, nl, nr, cyc, E

    _GROWTH_CACHE[key] = grow
    return grow


_RELAX_CACHE: dict = {}


def make_device_relax(eforce_batch_fn, free_mask, max_step: float,
                      scale_step: str, climb: bool, climb_rms: float,
                      conv_perp_rms: float, hvp_fn=None,
                      lanczos_iters: int = 10, fix_ends: bool = True):
    """The fully-grown string relaxation as ONE on-device lax.while_loop.

    TPU-first rationale: a host-synced macro loop pays the full host<->device
    round trip every cycle — measured at ~7.3 s/call through the axon relay
    (vs ~40 ms of compute), turning a 25-cycle GSM into minutes. Running the
    whole loop on device syncs exactly once (same design as the L-BFGS
    engine)."""
    key = (eforce_batch_fn, float(max_step), scale_step, bool(climb),
           float(climb_rms), float(conv_perp_rms), hvp_fn,
           int(lanczos_iters), bool(fix_ends))
    hit = _RELAX_CACHE.get(key)
    if hit is not None:
        return hit

    step_fn_inner = make_macro_step(eforce_batch_fn, free_mask, max_step,
                                    scale_step, fix_ends)
    fm_flat = jnp.repeat(free_mask, 3)

    @jax.jit
    def relax(images, img_mask, n_max):
        M = images.shape[0]
        D = images.shape[1] * 3

        def cond(st):
            return (~st[3]) & (st[1] < n_max)

        def body(st):
            images, cycle, climb_on, done, E_prev, _rms = st
            hei = _hei_device(E_prev)
            if hvp_fn is not None:
                def mk_tau(_):
                    xh = images[hei]
                    v0 = (images[jnp.minimum(hei + 1, M - 1)]
                          - images[jnp.maximum(hei - 1, 0)]).reshape(-1)
                    return lanczos_lowest_mode(hvp_fn, xh, v0, fm_flat,
                                               lanczos_iters)

                tau_l = jax.lax.cond(
                    climb_on, mk_tau,
                    lambda _: jnp.zeros(D, images.dtype), None)
                use_l = climb_on
            else:
                tau_l = jnp.zeros(D, images.dtype)
                use_l = jnp.array(False)
            imgs2, E, perp, rms_all, hei_fmax = step_fn_inner(
                images, img_mask, climb_on, hei,
                tau_l.reshape(images.shape[1], 3), use_l)
            # reparametrize, preserving the climbing image
            hei_pos = imgs2[hei]
            reparamed = _reparam_equal_arc(imgs2, img_mask)
            reparamed = jnp.where(climb_on,
                                  reparamed.at[hei].set(hei_pos),
                                  reparamed)
            climb_on2 = climb_on | (jnp.asarray(climb) & (rms_all < climb_rms))
            climb_ok = (~jnp.asarray(climb)) | (
                climb_on & (hei_fmax < jnp.maximum(conv_perp_rms, climb_rms)))
            done_new = (rms_all < conv_perp_rms) & climb_ok
            return (reparamed, cycle + 1, climb_on2, done_new, E, rms_all)

        # seed energies for the first HEI pick
        E0, _ = eforce_batch_fn(images)
        st0 = (images, jnp.array(0), jnp.array(False), jnp.array(False), E0,
               jnp.asarray(jnp.inf, images.dtype))
        images, cycle, climb_on, done, E, rms = jax.lax.while_loop(
            cond, body, st0)
        return images, E, cycle, done, rms

    _RELAX_CACHE[key] = relax
    return relax


_HOST_CYCLE_CACHE: dict = {}


def make_host_cycles(eforce_batch_fn, free_mask, max_step: float,
                     scale_step: str, perp_thresh: float,
                     max_micro_cycles: int, climb: bool, climb_rms: float,
                     conv_perp_rms: float, hvp_fn=None,
                     lanczos_iters: int = 10, fix_ends: bool = True):
    """Host-driven GSM: one macro cycle per Python-loop iteration, split
    into TWO jitted programs — the caller's batched force program (shared
    by growth and relaxation, compiled ONCE) plus a tiny per-cycle
    epilogue (tangents/projection/step/bookkeeping on [M,P,3] arrays,
    compiles in seconds).

    Why this exists next to the device while_loops: the while_loop
    programs embed the whole batched force call in their body — for the
    300-atom eSCN backbone that single program took ~35 min to compile
    through the axon relay (bench.py round-2/3 note). Round-4 lesson
    (BENCH r4 first capture): even per-cycle programs that EMBED the
    force call cost ~6 min of compile EACH through the relay's remote
    compiler, and an unwarmed relax program put its whole compile inside
    the measured flagship wall-clock. Keeping the force program as its
    own dispatch means the expensive compile is paid exactly once for
    both phases, and the epilogues are negligible. The price is one extra
    host<->device round trip per macro cycle (~ms), negligible against a
    ~100 ms+ 12-image eSCN force batch. Use via ``gsm_mep(..., loop="host")``.

    Returns ``(grow_cycle, relax_cycle)`` — plain callables, two
    dispatches each (force + epilogue).
    """
    key = (eforce_batch_fn, float(max_step), scale_step,
           float(perp_thresh), int(max_micro_cycles), bool(climb),
           float(climb_rms), float(conv_perp_rms), hvp_fn,
           int(lanczos_iters), bool(fix_ends))
    hit = _HOST_CYCLE_CACHE.get(key)
    if hit is not None:
        return hit

    fm = free_mask[None, :, None]
    core = _make_step_core(fm, max_step, scale_step, fix_ends)
    fm_flat = jnp.repeat(free_mask, 3)

    @jax.jit
    def grow_epilogue(images, E, F, nl, nr, stall):
        # identical bookkeeping to make_device_growth's body, minus the
        # while_loop wrapper (host owns the loop) and the force call
        # (its own dispatch)
        M = images.shape[0]
        k = jnp.arange(M)
        gm = ((k <= nl) | (k >= M - 1 - nr)).astype(images.dtype)
        imgs_new, E, perp_rms, rms_all, _ = core(
            images, E, F, gm, jnp.array(False), jnp.asarray(M // 2),
            jnp.zeros_like(images[0]), jnp.array(False))
        imgs2 = jnp.where(gm[:, None, None] > 0, imgs_new, images)
        can = (nl + nr) < (M - 2)
        grow_l = (perp_rms[nl] < perp_thresh) & can
        nl2 = nl + grow_l.astype(nl.dtype)
        can2 = (nl2 + nr) < (M - 2)
        grow_r = (perp_rms[M - 1 - nr] < perp_thresh) & can2
        nr2 = nr + grow_r.astype(nr.dtype)
        grew = grow_l | grow_r
        stall2 = jnp.where(grew, 0, stall + 1)
        force = (~grew) & (stall2 >= max_micro_cycles) \
            & ((nl2 + nr2) < (M - 2))
        nl3 = jnp.where(force & (nl2 <= nr2), nl2 + 1, nl2)
        nr3 = jnp.where(force & (nl2 > nr2), nr2 + 1, nr2)
        stall3 = jnp.where(force, 0, stall2)
        # linear re-interpolation of the ungrown interior (same documented
        # deviation as make_device_growth)
        li, ri = nl3, M - 1 - nr3
        w = ((k - li) / jnp.maximum(ri - li, 1)).astype(imgs2.dtype)
        interior = (k > li) & (k < ri)
        interp = ((1.0 - w)[:, None, None] * imgs2[li][None]
                  + w[:, None, None] * imgs2[ri][None])
        imgs3 = jnp.where(interior[:, None, None], interp, imgs2)
        return imgs3, nl3, nr3, stall3, E

    @jax.jit
    def relax_epilogue(images, E, F, img_mask, climb_on, E_prev, tau_l,
                       use_l):
        # identical math to make_device_relax's body, minus the force
        # call and the Lanczos tangent (each its own dispatch)
        hei = _hei_device(E_prev)
        imgs2, E, perp, rms_all, hei_fmax = core(
            images, E, F, img_mask, climb_on, hei,
            tau_l.reshape(images.shape[1], 3), use_l)
        hei_pos = imgs2[hei]
        reparamed = _reparam_equal_arc(imgs2, img_mask)
        reparamed = jnp.where(climb_on, reparamed.at[hei].set(hei_pos),
                              reparamed)
        climb_on2 = climb_on | (jnp.asarray(climb) & (rms_all < climb_rms))
        climb_ok = (~jnp.asarray(climb)) | (
            climb_on & (hei_fmax < jnp.maximum(conv_perp_rms, climb_rms)))
        done = (rms_all < conv_perp_rms) & climb_ok
        return reparamed, E, rms_all, climb_on2, done

    if hvp_fn is not None:
        @jax.jit
        def lanczos_tau(images, E_prev):
            # same math as make_device_relax's mk_tau branch; a separate
            # program so relax_epilogue never embeds the (big) hvp_fn
            M = images.shape[0]
            hei = _hei_device(E_prev)
            xh = images[hei]
            v0 = (images[jnp.minimum(hei + 1, M - 1)]
                  - images[jnp.maximum(hei - 1, 0)]).reshape(-1)
            return lanczos_lowest_mode(hvp_fn, xh, v0, fm_flat,
                                       lanczos_iters)

    def grow_cycle(images, nl, nr, stall):
        E, F = eforce_batch_fn(images)
        return grow_epilogue(images, E, F, nl, nr, stall)

    def relax_cycle(images, img_mask, climb_on, E_prev):
        D = images.shape[1] * 3
        E, F = eforce_batch_fn(images)
        # climb_on is already host-synced once per cycle by the loop
        # (`bool(done)`), so branching on it here costs nothing extra
        if hvp_fn is not None and bool(climb_on):
            tau_l = lanczos_tau(images, E_prev)
            use_l = jnp.array(True)
        else:
            tau_l = jnp.zeros(D, images.dtype)
            use_l = jnp.array(False)
        return relax_epilogue(images, E, F, img_mask, climb_on, E_prev,
                              tau_l, use_l)

    _HOST_CYCLE_CACHE[key] = (grow_cycle, relax_cycle)
    return grow_cycle, relax_cycle


def gsm_mep(
    eforce_batch_fn: Callable,     # [M,P,3] Bohr -> (E [M], F [M,P,3])
    x0_bohr_pad: jnp.ndarray,      # [P,3] endpoint A
    x1_bohr_pad: jnp.ndarray,      # [P,3] endpoint B
    free_mask: jnp.ndarray,        # [P]
    *,
    max_nodes: int = 10,
    perp_thresh: float = 5e-3,
    max_cycles: int = 300,
    stop_in_when_full: int = 300,
    max_step: float = 0.1,         # Bohr, per-cycle displacement cap
    scale_step: str = "global",
    climb: bool = True,
    climb_rms: float = 5e-4,
    climb_lanczos: bool = True,
    fix_ends: bool = True,
    lanczos_iters: int = 10,
    hvp_fn: Optional[Callable] = None,   # (x_pad, v_pad) -> H v
    reparam_every: int = 1,
    reparam_every_full: int = 1,
    conv_perp_rms: float = 1.0e-3, # converged when overall perp RMS below
    callback: Optional[Callable] = None,
    print_every: int = 10,
    loop: str = "device",          # "device" (one while_loop/phase) | "host"
    **_ignored,
) -> GsmResult:
    M = max_nodes + 2
    images = _interp_linear(jnp.asarray(x0_bohr_pad), jnp.asarray(x1_bohr_pad), M)
    img_mask = jnp.ones(M)        # shape bookkeeping; growth via frontier below
    # Double-ended growth over the padded string: frontier counters select
    # how many images near each end are optimized; images beyond the
    # frontiers are re-interpolated between the frontier nodes each cycle.
    n_left, n_right = 1, 1          # grown interior nodes per side
    fully_grown = M - 2 <= (n_left + n_right - 0)  # handles tiny M
    force_calls = 0
    conv = False
    E = np.zeros(M)
    cyc = 0
    max_micro_cycles = int(_ignored.get("max_micro_cycles", 10))

    if loop == "host":
        return _gsm_mep_host(
            eforce_batch_fn, images, jnp.asarray(free_mask),
            fully_grown=fully_grown, max_step=max_step,
            scale_step=scale_step, perp_thresh=perp_thresh,
            max_micro_cycles=max_micro_cycles, max_cycles=max_cycles,
            stop_in_when_full=stop_in_when_full, climb=climb,
            climb_rms=climb_rms, conv_perp_rms=conv_perp_rms,
            hvp_fn=(hvp_fn if climb_lanczos else None),
            lanczos_iters=lanczos_iters, fix_ends=fix_ends,
            callback=callback)

    # ---- growth phase: ONE on-device while_loop (frontier bookkeeping is
    # traced-integer arithmetic; a host growth cycle costs a dispatch
    # round-trip vs 20 ms of compute) ---------------------------------------
    g_steps = 0
    if not fully_grown:
        grow = make_device_growth(eforce_batch_fn, jnp.asarray(free_mask),
                                  max_step, scale_step, perp_thresh,
                                  max_micro_cycles, fix_ends)
        images, nl_j, nr_j, g_j, E_j = grow(
            images, jnp.asarray(n_left), jnp.asarray(n_right),
            jnp.asarray(max_cycles))
        n_left, n_right = int(nl_j), int(nr_j)
        g_steps = int(g_j)
        E = np.asarray(E_j)
        force_calls += g_steps * M
        if callback and g_steps:
            callback(g_steps, E, -1.0, n_left + n_right, False)

    # ---- fully-grown relaxation: ONE on-device while_loop ------------------
    # (a host-synced macro loop pays the host<->device round trip every
    # cycle — ~7.3 s/call through the axon relay vs ~40 ms of compute)
    gm = jnp.ones(M)
    budget = min(max_cycles - g_steps, stop_in_when_full)
    relax = make_device_relax(eforce_batch_fn, jnp.asarray(free_mask),
                              max_step, scale_step, climb, climb_rms,
                              conv_perp_rms,
                              hvp_fn=(hvp_fn if climb_lanczos else None),
                              lanczos_iters=lanczos_iters,
                              fix_ends=fix_ends)
    images, E_j, cycles_dev, done, rms_j = relax(images, gm,
                                                 jnp.asarray(budget))
    n_dev = int(cycles_dev)
    force_calls += (n_dev + 1) * M     # +1: energy seed for the HEI pick
    cyc = g_steps + n_dev
    conv = bool(done)
    E = np.asarray(E_j)
    if callback:
        callback(cyc, E, -1.0, M - 2, True)
    return GsmResult(images=np.asarray(images), energies=E,
                     hei_idx=select_hei_index(E), converged=conv,
                     cycles=cyc, force_calls=force_calls,
                     perp_rms=float(rms_j))


def _gsm_mep_host(eforce_batch_fn, images, free_mask, *, fully_grown,
                  max_step, scale_step, perp_thresh, max_micro_cycles,
                  max_cycles, stop_in_when_full, climb, climb_rms,
                  conv_perp_rms, hvp_fn, lanczos_iters, fix_ends,
                  callback) -> GsmResult:
    """Host-driven GSM loop (see make_host_cycles for why this exists)."""
    M = images.shape[0]
    grow_cycle, relax_cycle = make_host_cycles(
        eforce_batch_fn, free_mask, max_step, scale_step, perp_thresh,
        max_micro_cycles, climb, climb_rms, conv_perp_rms,
        hvp_fn=hvp_fn, lanczos_iters=lanczos_iters, fix_ends=fix_ends)
    force_calls = 0
    g_steps = 0
    E = np.zeros(M)
    if not fully_grown:
        nl = jnp.asarray(1)
        nr = jnp.asarray(1)
        stall = jnp.asarray(0)
        while g_steps < max_cycles:
            images, nl, nr, stall, E_j = grow_cycle(images, nl, nr, stall)
            g_steps += 1
            force_calls += M
            if int(nl) + int(nr) >= M - 2:
                break
        if g_steps:
            E = np.asarray(E_j)
        if callback and g_steps:
            callback(g_steps, E, -1.0, int(nl) + int(nr), False)

    budget = min(max_cycles - g_steps, stop_in_when_full)
    gm = jnp.ones(M)
    E_j, _ = eforce_batch_fn(images)   # energy seed for the first HEI pick
    force_calls += M
    climb_on = jnp.array(False)
    conv = False
    rms = float("inf")
    n_relax = 0
    for _ in range(max(budget, 0)):
        images, E_j, rms_j, climb_on, done = relax_cycle(
            images, gm, climb_on, E_j)
        n_relax += 1
        force_calls += M
        if bool(done):        # one scalar host sync per macro cycle
            conv = True
            rms = float(rms_j)
            break
        rms = float(rms_j)
    cyc = g_steps + n_relax
    E = np.asarray(E_j)
    if callback:
        callback(cyc, E, -1.0, M - 2, True)
    return GsmResult(images=np.asarray(images), energies=E,
                     hei_idx=select_hei_index(E), converged=conv,
                     cycles=cyc, force_calls=force_calls,
                     perp_rms=float(rms))
