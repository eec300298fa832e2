"""eSCN-MoE backbone: spherical-channel message passing with SO(2)
convolutions and mixture-of-linear-experts conditioning — the UMA-class
architecture behind fairchem's pretrained checkpoints, rebuilt TPU-first.

Reference seam being filled (/root/reference/pdb2reaction/uma_pysis.py:246-318):
the reference drives fairchem's UMA predictor as a black box (radius graph
with cutoff 6.0 A / nearest-``max_neighbors``, task/charge/spin attached to
the batch, energy + forces out). This module provides the same class of
network natively:

- node features are real-spherical-harmonic coefficient arrays
  ``[P, (lmax+1)^2, C]``;
- each edge's messages are computed in an edge-aligned frame (Wigner
  rotation so the edge direction is +z, the polar axis of this real-SH
  convention — see so3.edge_rot_mat), where an SO(2) convolution mixes
  only +-m pairs with |m| <= mmax — the eSCN factorization;
- every linear layer is a mixture of linear experts (MoLE): expert
  coefficients come from a routing MLP over (task, charge, spin)
  embeddings and the expert weights are merged ONCE per system into a
  plain matmul (UMA's inference trick — zero per-edge routing cost);
- point-wise spherical FFN on a Gauss-Legendre S2 grid; equivariant
  RMS layer norms per l; per-element reference energies.

TPU-first layout: padded dense neighbor matrices ``[P, K]`` (core.neighbors)
— every gather is a static-shape ``x[idx]``, every aggregation a masked
reduction over K, every contraction an MXU matmul; no scatters, no dynamic
shapes. Forces are exact gradients (conservative), Hessians batched HVPs via
the shared Calculator.

Edge-message nonlinearity (``ESCNConfig.edge_act``):
- ``"s2"`` — the fairchem-faithful per-edge separable S2 grid activation
  (SiLU on the l=0 scalars; the full coefficient vector projected to the
  sphere grid, SiLU'd point-wise, projected back, keeping the l>0 rows —
  fairchem SeparableS2Activation semantics). This is the DEFAULT for
  checkpoint-loadable configs: a converted fairchem checkpoint reproduces
  fairchem outputs only through this path.
- ``"gate"`` — the TPU-fast equivariant gate (scalar-channel SiLU +
  sigmoid gates on l>0): cheaper HBM (no per-edge grid tensors), kept as
  an option for surrogate/training workloads.
The node FFN keeps the full point-wise S2 grid nonlinearity in both modes.

Other notes:
- hyperparameters (lmax/mmax/channels/experts) are config, not hardcoded;
  checkpoint conversion reads them from the checkpoint tensor shapes
  (convert.py), so the named registry entries only size surrogate runs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.structure import PaddedSystem
from ..core.neighbors import dense_neighbors_rows, neighbor_vectors
from .so3 import (edge_rot_mat, num_coeffs, s2_grid_tables,
                  s2_grid_tables_midpoint, wigner_blocks, wigner_full)


@dataclass(frozen=True)
class ESCNConfig:
    lmax: int = 2
    mmax: int = 2
    sphere_channels: int = 64       # C: channels per (l,m) coefficient
    hidden_channels: int = 64       # SO(2) conv hidden width
    edge_channels: int = 32         # invariant edge scalar embedding
    ffn_hidden: int = 128
    num_layers: int = 2
    num_experts: int = 4
    route_dim: int = 16
    num_gauss: int = 32             # Gaussian radial basis size
    cutoff: float = 6.0             # Angstrom (uma_pysis.py:304 default)
    max_neighbors: int = 32
    max_z: int = 100
    charge_range: int = 8
    spin_range: int = 8
    num_tasks: int = 8              # omol/omat/oc20/odac/omc/... slots
    avg_degree: float = 12.0        # aggregation normalization
    # S2 grid resolution for the point-wise FFN. 0 = auto: 4(lmax+1) x
    # (4 lmax+7) — oversampled 2x beyond band limit, measured to push the
    # grid-aliasing equivariance error from ~2e-4 to ~1e-7 eV (the only
    # non-exact symmetry in the architecture) at negligible matmul cost.
    grid_ntheta: int = 0
    grid_nphi: int = 0
    # rematerialize each message block in the backward pass: the [P,K,M,2C]
    # edge tensors otherwise hold one live copy per layer through autodiff
    # (escn-md at 300 atoms: ~262 MB each). With the chunk=1 sequential
    # batch schedule (calculator.py) only ONE image is live at a time, so
    # the tensors fit v5e HBM and remat costs 1.9x wall-clock for nothing
    # (escn-md measured 257 ms/force-call without remat vs 494 ms with);
    # enable only for image-batch workloads that vmap the model directly.
    remat_blocks: bool = False
    # edge-message nonlinearity: "s2" = fairchem-faithful separable S2 grid
    # activation; "gate" = TPU-fast equivariant gate (see module docstring)
    edge_act: str = "s2"
    # edge-activation grid oversampling (XLA path only). 1 = fairchem's
    # SO3_Grid(lmax, mmax) nodes — required for checkpoint parity; >1
    # multiplies both node counts, shrinking the grid-aliasing
    # equivariance error ~scale^2 (the symmetry test pins this scaling,
    # which distinguishes inherent aliasing from an implementation bug)
    edge_grid_scale: int = 1
    # "pallas" runs the fused conv1->S2act->conv2 edge chain as a VMEM
    # Pallas kernel (escn_edge_kernel.py): bf16 matmuls / f32 accumulation
    # (~1e-3 relative — below MLIP force-error floors), s2 + reduced
    # (mmax < lmax) layout only. Reverse-mode AD flows through its custom
    # VJP; forward-over-reverse (HVP/Hessian) paths must use the "xla"
    # variant (mlip/uma.py builds Hessian kernels with it automatically).
    edge_kernel: str = "xla"
    # node S2-FFN kernel: "auto" = fused Pallas FFN (escn_ffn_kernel.py)
    # whenever the edge chain runs a Pallas variant (the [P,G,H] grid
    # activations are the force program's dominant HBM traffic — see that
    # module's docstring), plain XLA otherwise; "pallas"/"xla" force it.
    ffn_kernel: str = "auto"
    dtype: Any = jnp.float32

    @property
    def use_pallas_ffn(self) -> bool:
        if self.ffn_kernel == "auto":
            return self.edge_kernel.startswith("pallas")
        return self.ffn_kernel == "pallas"

    @property
    def grid(self):
        nt = self.grid_ntheta or 4 * (self.lmax + 1)
        np_ = self.grid_nphi or 4 * self.lmax + 7
        return nt, np_

    @property
    def m(self) -> int:
        return num_coeffs(self.lmax)


@lru_cache(maxsize=None)
def _m_indices(lmax: int, mmax: int):
    """Flat (l,m) coefficient indices grouped by |m| for SO(2) convs."""
    m0 = np.array([l * (l + 1) for l in range(lmax + 1)])
    pos, neg = [], []
    for m in range(1, mmax + 1):
        pos.append(np.array([l * (l + 1) + m for l in range(m, lmax + 1)]))
        neg.append(np.array([l * (l + 1) - m for l in range(m, lmax + 1)]))
    return m0, pos, neg


@lru_cache(maxsize=None)
def _used_indices(lmax: int, mmax: int):
    """Ordered flat indices of the |m| <= mmax coefficients the SO(2) conv
    touches: [m0 block, +1, -1, +2, -2, ...]. Rotating DIRECTLY into this
    reduced basis (D rows gathered once) shrinks every per-edge tensor
    from M=(lmax+1)^2 to U rows (25 -> 19 at lmax=4/mmax=2) and turns the
    conv's scatter writes into contiguous concatenates — the coefficients
    with |m| > mmax never contributed (the conv discards them and emits
    zeros there), so this is exactly the same math."""
    m0, pos, neg = _m_indices(lmax, mmax)
    parts = [m0]
    for m in range(1, mmax + 1):
        parts += [pos[m - 1], neg[m - 1]]
    return np.concatenate(parts)


# ---------------------------------------------------------------------------
# parameter init
# ---------------------------------------------------------------------------

def _mole_linear(key, experts, n_in, n_out, dtype):
    kw, _ = jax.random.split(key)
    # scale with a python float: dividing by np.sqrt (a numpy f64 scalar)
    # silently promotes the weights to f64 under the x64 test policy
    return {"w": jax.random.normal(kw, (experts, n_in, n_out), dtype)
            * float(1.0 / np.sqrt(n_in)),
            "b": jnp.zeros((experts, n_out), dtype)}


def _linear(key, n_in, n_out, dtype):
    return {"w": jax.random.normal(key, (n_in, n_out), dtype)
            * float(1.0 / np.sqrt(n_in)),
            "b": jnp.zeros((n_out,), dtype)}


def _so2_conv(key, cfg: ESCNConfig, c_in: int, c_out: int,
              with_edge: bool) -> Dict[str, Any]:
    """One SO(2) convolution: per-|m| MoLE linear maps."""
    E = cfg.num_experts
    dt = cfg.dtype
    keys = jax.random.split(key, cfg.mmax + 1)
    nl0 = cfg.lmax + 1
    d_in0 = nl0 * c_in + (cfg.edge_channels if with_edge else 0)
    p = {"fc_m0": _mole_linear(keys[0], E, d_in0, nl0 * c_out, dt)}
    for m in range(1, cfg.mmax + 1):
        nl = cfg.lmax + 1 - m
        kr, ki = jax.random.split(keys[m])
        p[f"fc_m{m}_r"] = _mole_linear(kr, E, nl * c_in, nl * c_out, dt)
        p[f"fc_m{m}_i"] = _mole_linear(ki, E, nl * c_in, nl * c_out, dt)
    return p


def init_escn_params(key, cfg: ESCNConfig) -> Dict[str, Any]:
    C = cfg.sphere_channels
    dt = cfg.dtype
    E = cfg.num_experts
    ks = iter(jax.random.split(key, 16 + 8 * cfg.num_layers))
    params: Dict[str, Any] = {
        "sphere_embedding": jax.random.normal(next(ks), (cfg.max_z + 1, C),
                                              dt) * 0.5,
        "source_embedding": jax.random.normal(
            next(ks), (cfg.max_z + 1, cfg.edge_channels), dt) * 0.5,
        "target_embedding": jax.random.normal(
            next(ks), (cfg.max_z + 1, cfg.edge_channels), dt) * 0.5,
        "charge_embedding": jax.random.normal(
            next(ks), (2 * cfg.charge_range + 1, cfg.route_dim), dt) * 0.5,
        "spin_embedding": jax.random.normal(
            next(ks), (cfg.spin_range + 1, cfg.route_dim), dt) * 0.5,
        "task_embedding": jax.random.normal(
            next(ks), (cfg.num_tasks, cfg.route_dim), dt) * 0.5,
        "router": [_linear(next(ks), 3 * cfg.route_dim, cfg.route_dim, dt),
                   _linear(next(ks), cfg.route_dim, E, dt)],
        "edge_mlp": [
            _linear(next(ks), 2 * cfg.edge_channels + cfg.num_gauss,
                    cfg.edge_channels, dt),
            _linear(next(ks), cfg.edge_channels, cfg.edge_channels, dt)],
        "edge_degree_proj": _mole_linear(
            next(ks), E, cfg.edge_channels, (cfg.lmax + 1) * C, dt),
        "blocks": [],
        "energy_norm": jnp.ones((cfg.lmax + 1, C), dt),
        "energy_head": [_mole_linear(next(ks), E, C, C, dt),
                        _mole_linear(next(ks), E, C, 1, dt)],
        "atom_ref": jnp.zeros((cfg.max_z + 1,), jnp.float32),
    }
    h = cfg.hidden_channels
    for _ in range(cfg.num_layers):
        k0, k1, k2, k3 = jax.random.split(next(ks), 4)
        blk = {
            "norm_1": jnp.ones((cfg.lmax + 1, C), dt),
            "so2_conv_1": _so2_conv(k0, cfg, 2 * C, h, with_edge=True),
            "so2_conv_2": _so2_conv(k2, cfg, h, C, with_edge=False),
            "norm_2": jnp.ones((cfg.lmax + 1, C), dt),
            "ffn": [_mole_linear(k3, E, C, cfg.ffn_hidden, dt),
                    _mole_linear(jax.random.fold_in(k3, 1), E,
                                 cfg.ffn_hidden, C, dt)],
        }
        if cfg.edge_act == "gate":
            blk["gate"] = _mole_linear(k1, E, h, h, dt)
        params["blocks"].append(blk)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _mole(p, alpha, x):
    """Apply a MoLE linear with merged expert weights. A pre-merged block
    (``premerge_escn_params``) carries a 2-D ``w`` and applies directly."""
    if p["w"].ndim == 2:
        return x @ p["w"] + p["b"]
    W = jnp.einsum("e,eio->io", alpha, p["w"])
    b = jnp.einsum("e,eo->o", alpha, p["b"])
    return x @ W + b


def _route_alpha(params, cfg: ESCNConfig):
    """Expert routing coefficients from the system's (task, charge, spin)
    conditioning — fixed for a given system (UMA MoLE semantics)."""
    q_idx = jnp.clip(params["charge"].astype(jnp.int32) + cfg.charge_range,
                     0, 2 * cfg.charge_range)
    s_idx = jnp.clip(params["spin"].astype(jnp.int32), 0, cfg.spin_range)
    t_idx = jnp.clip(params.get("task", jnp.asarray(0)).astype(jnp.int32),
                     0, cfg.num_tasks - 1)
    route_in = jnp.concatenate([params["task_embedding"][t_idx],
                                params["charge_embedding"][q_idx],
                                params["spin_embedding"][s_idx]], -1)
    return jax.nn.softmax(_apply_linear_stack(params["router"], route_in))


def premerge_escn_params(params, cfg: ESCNConfig):
    """Merge every MoLE expert bank with the system's routing coefficients
    ONCE, returning an inference params pytree with plain 2-D linears.

    The routing input (task, charge, spin) is fixed for the lifetime of a
    calculator, yet the jitted force call re-merges the [E, in, out]
    expert banks every evaluation — ~794 MB of HBM reads per escn-md
    force call (8 experts x ~25 MB x 4 layers), ~1 ms on v5e. Calculators
    premerge at construction (mlip/uma.py); training keeps the expert
    banks so gradients flow to every expert. Exact: the merge is linear
    and performed in the same dtype/order as the in-graph einsum."""
    alpha = _route_alpha(params, cfg)

    def is_mole(p):
        return (isinstance(p, dict) and set(p) == {"w", "b"}
                and hasattr(p["w"], "ndim") and p["w"].ndim == 3)

    def conv(tree):
        if is_mole(tree):
            return {"w": jnp.einsum("e,eio->io", alpha, tree["w"]),
                    "b": jnp.einsum("e,eo->o", alpha, tree["b"])}
        if isinstance(tree, dict):
            return {k: conv(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [conv(v) for v in tree]
        return tree

    return conv(params)


def _merged_wb(p, alpha):
    """Merged (W, b) for one MoLE linear: a pre-merged calculator
    (premerge_escn_params) carries a 2-D ``w``; otherwise merge the
    [E, in, out] expert bank with the routing coefficients."""
    if p["w"].ndim == 2:
        return p["w"], p["b"]
    return (jnp.einsum("e,eio->io", alpha, p["w"]),
            jnp.einsum("e,eo->o", alpha, p["b"]))


def _pack_conv_weights(blk, alpha, cfg: ESCNConfig):
    """The fused edge kernels' 12-tuple of merged conv1 + conv2 weights.

    The ±m bias convention follows _so2_apply_reduced semantics: each
    _mole adds its own bias there, so the packed yp row carries (br - bi)
    and yn carries (br + bi). ONE shared implementation — the pallas /
    pallas-full / pallas-mega branches must pack identically or their
    parity tests diverge."""
    c1, c2 = blk["so2_conv_1"], blk["so2_conv_2"]
    W0, b0 = _merged_wb(c1["fc_m0"], alpha)
    V0, c0 = _merged_wb(c2["fc_m0"], alpha)
    Wrs, Wis, brs, bis = [], [], [], []
    Vrs, Vis, crs, cis = [], [], [], []
    for mm in range(1, cfg.mmax + 1):
        wr, br = _merged_wb(c1[f"fc_m{mm}_r"], alpha)
        wi, bi = _merged_wb(c1[f"fc_m{mm}_i"], alpha)
        Wrs.append(wr), Wis.append(wi)
        brs.append(br - bi), bis.append(br + bi)
        vr, cr = _merged_wb(c2[f"fc_m{mm}_r"], alpha)
        vi, ci = _merged_wb(c2[f"fc_m{mm}_i"], alpha)
        Vrs.append(vr), Vis.append(vi)
        crs.append(cr - ci), cis.append(cr + ci)
    return (W0, tuple(Wrs), tuple(Wis), b0, tuple(brs), tuple(bis),
            V0, tuple(Vrs), tuple(Vis), c0, tuple(crs), tuple(cis))


def _apply_linear_stack(layers, x):
    for i, p in enumerate(layers):
        x = x @ p["w"] + p["b"]
        if i < len(layers) - 1:
            x = jax.nn.silu(x)
    return x


@lru_cache(maxsize=None)
def _l_of_m_tables(lmax: int):
    """[L, M] block-membership indicator and [M] l-index for the
    vectorized norm below."""
    import numpy as _np
    M = (lmax + 1) ** 2
    l_of_m = _np.concatenate(
        [_np.full(2 * l + 1, l) for l in range(lmax + 1)])
    ind = _np.zeros((lmax + 1, M), _np.float32)
    ind[l_of_m, _np.arange(M)] = 1.0
    return ind, l_of_m


def _equi_rms_norm(x, gamma, cfg: ESCNConfig, eps=1e-6):
    """Per-l RMS norm over (m, C) with learned per-(l, C) scales.

    x: [..., M, C]; gamma: [lmax+1, C].

    Vectorized: ONE indicator-matmul per call instead of a per-l
    slice/mean/concat chain (lmax+1 slices x 3 norms/layer x 4 layers x
    fwd+VJP was measurable dispatch glue around the Pallas kernels —
    VERDICT r4 weak 7 backward-glue audit). Same math: the (m, C) mean
    per l-block just reassociates. Set PDB2R_TPU_NORM_V1=1 to fall back
    to the sliced reference implementation (A/B + parity)."""
    if os.environ.get("PDB2R_TPU_NORM_V1"):
        outs = []
        for l in range(cfg.lmax + 1):  # noqa: E741
            i0 = l * l
            blk = x[..., i0:i0 + 2 * l + 1, :]
            rms = jnp.sqrt(
                jnp.mean(blk * blk, axis=(-2, -1), keepdims=True) + eps)
            outs.append(blk / rms * gamma[l])
        return jnp.concatenate(outs, axis=-2)
    ind_np, l_of_m = _l_of_m_tables(cfg.lmax)
    ind = jnp.asarray(ind_np, x.dtype)
    C = x.shape[-1]
    counts = jnp.asarray(
        (2 * np.arange(cfg.lmax + 1) + 1) * C, x.dtype)
    sums = jnp.einsum("lm,...mc->...l", ind, x * x)
    rms = jnp.sqrt(sums / counts + eps)              # [..., L]
    inv_m = (1.0 / rms)[..., l_of_m]                 # [..., M]
    return x * inv_m[..., None] * gamma[l_of_m]


def _gauss_basis(d, cfg: ESCNConfig):
    """Fixed Gaussian radial basis on [0, cutoff] (fairchem-style smearing)."""
    offsets = jnp.linspace(0.0, cfg.cutoff, cfg.num_gauss).astype(d.dtype)
    width = cfg.cutoff / (cfg.num_gauss - 1)
    return jnp.exp(-0.5 * ((d[..., None] - offsets) / width) ** 2)


def _envelope(d, cfg: ESCNConfig):
    """Smooth polynomial cutoff envelope (1 at 0, 0 with zero slope at rc)."""
    u = jnp.clip(d / cfg.cutoff, 0.0, 1.0)
    return 1.0 - 10.0 * u ** 3 + 15.0 * u ** 4 - 6.0 * u ** 5


def _so2_apply(p, alpha, x_rot, edge_scalar, cfg: ESCNConfig, c_in, c_out):
    """SO(2) convolution in the edge frame.

    x_rot: [..., M, c_in] coefficients in the edge-aligned frame.
    edge_scalar: [..., edge_channels] or None (concatenated into m=0).
    Returns [..., M, c_out] (entries with |m| > mmax are zero).
    """
    m0, pos, neg = _m_indices(cfg.lmax, cfg.mmax)
    batch = x_rot.shape[:-2]
    nl0 = cfg.lmax + 1

    x0 = x_rot[..., m0, :].reshape(batch + (nl0 * c_in,))
    if edge_scalar is not None:
        x0 = jnp.concatenate([x0, edge_scalar], axis=-1)
    y0 = _mole(p["fc_m0"], alpha, x0).reshape(batch + (nl0, c_out))

    out = jnp.zeros(batch + (num_coeffs(cfg.lmax), c_out), x_rot.dtype)
    out = out.at[..., m0, :].set(y0)
    for m in range(1, cfg.mmax + 1):
        nl = cfg.lmax + 1 - m
        xp = x_rot[..., pos[m - 1], :].reshape(batch + (nl * c_in,))
        xn = x_rot[..., neg[m - 1], :].reshape(batch + (nl * c_in,))
        Wr, Wi = p[f"fc_m{m}_r"], p[f"fc_m{m}_i"]
        yp = _mole(Wr, alpha, xp) - _mole(Wi, alpha, xn)
        yn = _mole(Wi, alpha, xp) + _mole(Wr, alpha, xn)
        out = out.at[..., pos[m - 1], :].set(
            yp.reshape(batch + (nl, c_out)))
        out = out.at[..., neg[m - 1], :].set(
            yn.reshape(batch + (nl, c_out)))
    return out


def _so2_apply_reduced(p, alpha, x_u, edge_scalar, cfg: ESCNConfig,
                       c_in, c_out):
    """SO(2) convolution on the REDUCED |m| <= mmax layout.

    x_u: [..., U, c_in] coefficients ordered [m0, +1, -1, +2, -2, ...]
    (see _used_indices). Returns [..., U, c_out] in the same order — all
    slices contiguous, no scatters."""
    batch = x_u.shape[:-2]
    nl0 = cfg.lmax + 1
    x0 = x_u[..., :nl0, :].reshape(batch + (nl0 * c_in,))
    if edge_scalar is not None:
        x0 = jnp.concatenate([x0, edge_scalar], axis=-1)
    outs = [_mole(p["fc_m0"], alpha, x0).reshape(batch + (nl0, c_out))]
    off = nl0
    for m in range(1, cfg.mmax + 1):
        nl = cfg.lmax + 1 - m
        xp = x_u[..., off:off + nl, :].reshape(batch + (nl * c_in,))
        xn = x_u[..., off + nl:off + 2 * nl, :].reshape(
            batch + (nl * c_in,))
        Wr, Wi = p[f"fc_m{m}_r"], p[f"fc_m{m}_i"]
        yp = _mole(Wr, alpha, xp) - _mole(Wi, alpha, xn)
        yn = _mole(Wi, alpha, xp) + _mole(Wr, alpha, xn)
        outs.append(yp.reshape(batch + (nl, c_out)))
        outs.append(yn.reshape(batch + (nl, c_out)))
        off += 2 * nl
    return jnp.concatenate(outs, axis=-2)


@lru_cache(maxsize=None)
def _edge_grid_tables(lmax: int, mmax: int, scale: int = 1):
    """S2 grid tables for the per-edge activation, restricted to the
    |m| <= mmax coefficient subspace in the _used_indices order.

    Resolution AND nodes follow fairchem's SO3_Grid(lmax, mmax)
    convention: 2*(lmax+1) midpoint theta nodes (e3nn s2_grid /
    Driscoll-Healy weights) x (2*mmax+1) uniform phi nodes — exact
    quadrature for the band-limited projections; the from-grid map only
    reconstructs |m| <= mmax rows (fairchem CoefficientMapping
    semantics), so phi aliasing from the point-wise nonlinearity cannot
    leak into high-m rows. (The nonlinearity itself still aliases WITHIN
    |m| <= mmax — inherent to the architecture at this resolution;
    fairchem's trained weights bake it in, so matching their nodes
    matters more than suppressing it.)
    ``scale`` > 1 oversamples both node counts (test-only; checkpoint
    parity requires scale=1). Returns (to_grid [G, U], from_grid [U, G])."""
    tg, fg = s2_grid_tables_midpoint(lmax, scale * 2 * (lmax + 1),
                                     2 * scale * mmax + 1)
    used = _used_indices(lmax, mmax)
    return tg[:, used], fg[used, :]


def _s2_sep_act(x, cfg: ESCNConfig, reduced: bool):
    """Separable S2 activation on edge messages (fairchem
    SeparableS2Activation): SiLU on the l=0 scalars; the coefficient
    vector projected to the sphere grid, SiLU'd point-wise, projected
    back; output keeps the activated scalars at the (0,0) row.

    Works on both layouts: ``reduced`` = [..., U, C] rows in
    _used_indices order (row 0 is (l=0,m=0)); full = [..., M, C] flat
    (l,m) rows where the |m| > mmax rows are zero after the SO(2) conv
    (the from-grid map keeps them zero)."""
    dt = x.dtype
    tg, fg = _edge_grid_tables(cfg.lmax, cfg.mmax,
                               getattr(cfg, "edge_grid_scale", 1))
    if not reduced:
        used = jnp.asarray(_used_indices(cfg.lmax, cfg.mmax))
        x_u = x[..., used, :]
    else:
        x_u = x
    s = x_u[..., 0, :]
    grid = jnp.einsum("gu,...uc->...gc", jnp.asarray(tg, dt), x_u)
    grid = jax.nn.silu(grid)
    back = jnp.einsum("ug,...gc->...uc", jnp.asarray(fg, dt), grid)
    back = back.at[..., 0, :].set(jax.nn.silu(s))
    if not reduced:
        out = jnp.zeros_like(x)
        return out.at[..., used, :].set(back)
    return back


def _gate_act(p, alpha, x, cfg: ESCNConfig):
    """Equivariant gate: SiLU on the l=0 scalars; l>0 blocks gated by
    sigmoid(MoLE(scalars)) channel-wise. Works on both the full [M] and
    the reduced [U] layouts — the l=0 scalar sits at row 0 in either."""
    s = x[..., 0, :]
    gates = jax.nn.sigmoid(_mole(p, alpha, s))
    out = x * gates[..., None, :]
    return out.at[..., 0, :].set(jax.nn.silu(s))


def _block_diag_rotate(D, x, transpose=False):
    """Rotate [..., M, C] coefficients by the edge-frame Wigner rotation.

    ``D`` is either the full block-diagonal [..., M, M] matrix (one batched
    MXU matmul per edge — measured 13% faster end-to-end for lmax=4 than
    per-l einsums despite ~3.8x padded flops) or the per-l block list
    (cheaper at small lmax where the padding overhead dominates: escn-s
    lmax=2 measured 19.5 ms per-l vs 25.7 ms full). escn_energy picks by
    lmax."""
    if isinstance(D, (list, tuple)):
        outs = []
        for l, Dl in enumerate(D):  # noqa: E741
            i0 = l * l
            blk = x[..., i0:i0 + 2 * l + 1, :]
            Dm = jnp.swapaxes(Dl, -1, -2) if transpose else Dl
            outs.append(jnp.einsum("...mn,...nc->...mc", Dm, blk))
        return jnp.concatenate(outs, axis=-2)
    Df = jnp.swapaxes(D, -1, -2) if transpose else D
    return jnp.einsum("...mn,...nc->...mc", Df, x)


def escn_energy(coords_ang, system: PaddedSystem, params, cfg: ESCNConfig,
                *, axis_name=None, n_shards: int = 1):
    """Total potential energy in eV (conservative: forces via jax.grad).

    Inside a ``shard_map`` over ``axis_name`` this runs SPATIALLY
    PARTITIONED: each shard owns P/n_shards atom rows (its neighbor slab,
    edge frames, messages, node features); the only cross-shard traffic is
    one tiled ``all_gather`` of the normalized node features per layer
    plus the psum'd energy — the same design as
    model.gather_energy_core (parallel/spatial.py wires both)."""
    dt = cfg.dtype
    assert getattr(cfg, "edge_grid_scale", 1) == 1 \
        or cfg.edge_kernel == "xla", \
        "edge_grid_scale > 1 is an XLA-path test knob (kernels bake the " \
        "fairchem grid)"
    P = coords_ang.shape[0]
    C = cfg.sphere_channels
    M = num_coeffs(cfg.lmax)
    if axis_name is None:
        P_loc, i0 = P, 0
        allg = lambda v: v                              # noqa: E731
        psum = lambda e: e                              # noqa: E731
    else:
        assert P % n_shards == 0, (P, n_shards)
        P_loc = P // n_shards
        i0 = jax.lax.axis_index(axis_name) * P_loc
        allg = lambda v: jax.lax.all_gather(            # noqa: E731
            v, axis_name, tiled=True)
        psum = lambda e: jax.lax.psum(e, axis_name)     # noqa: E731
    atom_mask = jax.lax.dynamic_slice_in_dim(
        system.atom_mask, i0, P_loc).astype(dt)
    z = jnp.clip(jax.lax.dynamic_slice_in_dim(system.numbers, i0, P_loc),
                 0, cfg.max_z)

    # ---- routing: task/charge/spin -> expert coefficients -----------------
    # (skipped when the calculator pre-merged the expert banks — see
    # premerge_escn_params; detect by the energy head's weight rank)
    premerged = params["energy_head"][0]["w"].ndim == 2
    alpha = None if premerged else _route_alpha(params, cfg)

    # ---- radius graph (nearest-K within cutoff, uma_pysis.py:299-318) -----
    rows = jax.lax.dynamic_slice_in_dim(coords_ang, i0, P_loc)
    idx, nbr_mask = dense_neighbors_rows(coords_ang, system.atom_mask,
                                         cfg.cutoff, cfg.max_neighbors,
                                         i0, P_loc)
    idx = jax.lax.stop_gradient(idx)
    nbr_mask = jax.lax.stop_gradient(nbr_mask).astype(dt)
    vec, dist = neighbor_vectors(coords_ang, idx, nbr_mask, origin=rows)
    vec = vec.astype(dt)
    dist = dist.astype(dt)
    z_full = jnp.clip(system.numbers, 0, cfg.max_z)   # idx is global

    # edge-aligned Wigner rotation. When mmax < lmax, gather the rows of
    # the |m| <= mmax coefficients once and rotate DIRECTLY into that
    # reduced basis (D_sel [P,K,U,M]): every per-edge tensor shrinks from
    # M to U rows (25 -> 19 at escn-md) and the conv needs no scatters —
    # exact same math since |m| > mmax coefficients never contribute.
    # Otherwise: full [P,K,M,M] matrix for large lmax (one MXU matmul per
    # rotate), per-l blocks for small lmax (measured faster there).
    rot = edge_rot_mat(vec + (1.0 - nbr_mask[..., None]))  # safe for masked
    reduced = cfg.mmax < cfg.lmax
    if reduced:
        used = jnp.asarray(_used_indices(cfg.lmax, cfg.mmax))
        # pin the config dtype: the recursion's f64 coefficient tables
        # would otherwise promote everything downstream under x64
        D_sel = wigner_full(rot, cfg.lmax)[..., used, :].astype(dt)
    else:
        Dl = (wigner_full(rot, cfg.lmax) if cfg.lmax >= 3
              else wigner_blocks(rot, cfg.lmax))
        Dl = (Dl.astype(dt) if not isinstance(Dl, (list, tuple))
              else [d.astype(dt) for d in Dl])

    # ---- invariant edge scalars -------------------------------------------
    gauss = _gauss_basis(dist, cfg)                       # [P,K,G]
    esrc = params["source_embedding"][z_full[idx]]        # [P,K,Ce]
    etgt = jnp.broadcast_to(params["target_embedding"][z][:, None, :],
                            esrc.shape)
    edge_scalar = _apply_linear_stack(
        params["edge_mlp"], jnp.concatenate([esrc, etgt, gauss], -1))
    env = (_envelope(dist, cfg) * nbr_mask)[..., None]    # [P,K,1]

    # ---- initial node features ---------------------------------------------
    x = jnp.zeros((P_loc, M, C), dt)
    x = x.at[:, 0, :].set(params["sphere_embedding"][z])
    # edge-degree embedding: edge scalars -> m=0 components per l in the
    # edge frame, rotated back and aggregated
    deg = _mole(params["edge_degree_proj"], alpha,
                edge_scalar).reshape(P_loc, cfg.max_neighbors,
                                     cfg.lmax + 1, C)
    if reduced:
        # m0 rows are the first lmax+1 rows of the reduced basis:
        # back-rotate the per-l m=0 components directly
        deg_back = jnp.einsum("...um,...uc->...mc",
                              D_sel[..., : cfg.lmax + 1, :], deg)
    else:
        m0, _, _ = _m_indices(cfg.lmax, cfg.mmax)
        deg_coeff = jnp.zeros((P_loc, cfg.max_neighbors, M, C), dt)
        deg_coeff = deg_coeff.at[..., m0, :].set(deg)
        deg_back = _block_diag_rotate(Dl, deg_coeff, transpose=True)
    x = x + jnp.sum(deg_back * env[..., None], axis=1) / cfg.avg_degree
    x = x * atom_mask[:, None, None]

    # ---- message-passing blocks --------------------------------------------
    def block_fn(x, blk):
        xn = _equi_rms_norm(x, blk["norm_1"], cfg)
        x_s = allg(xn)[idx]                               # [P_loc,K,M,C]

        def make_pair():
            x_t = jnp.broadcast_to(xn[:, None],
                                   (P_loc, cfg.max_neighbors, M, C))
            return jnp.concatenate([x_s, x_t], axis=-1)   # [P,K,M,2C]

        def edge_nonlin(m):
            if cfg.edge_act == "gate":
                return _gate_act(blk["gate"], alpha, m, cfg)
            return _s2_sep_act(m, cfg, reduced)

        if reduced and cfg.edge_kernel == "pallas-mega" \
                and cfg.edge_act == "s2" and axis_name is None:
            # v3: gather + rotation + chain + back-rotation + envelope +
            # K-sum all in ONE node-resident kernel (one-hot MXU gathers;
            # see escn_edge_kernel.py v3 header). XLA materializes NO
            # per-edge feature tensor at all.
            from .escn_edge_kernel import (fused_edge_mega, pack_d,
                                           _rot_nz)
            K = cfg.max_neighbors
            E_ = P_loc * K
            xn_t_local = jnp.transpose(xn, (1, 2, 0)) \
                .reshape(M * C, P_loc)
            es_t = edge_scalar.reshape(E_, cfg.edge_channels).T
            nnz = len(_rot_nz(cfg.lmax, cfg.mmax)[0])
            Dp_pk = pack_d(cfg, D_sel)                  # [P,K,NZ]
            Dpe_pk = Dp_pk * env
            Dp_t = jnp.transpose(Dp_pk, (2, 0, 1)).reshape(nnz, E_)
            Dpe_t = jnp.transpose(Dpe_pk, (2, 0, 1)).reshape(nnz, E_)
            weights = _pack_conv_weights(blk, alpha, cfg)
            tg_e, fg_e = _edge_grid_tables(cfg.lmax, cfg.mmax)
            msum_t = fused_edge_mega(
                cfg, xn_t_local, idx.reshape(E_).astype(jnp.float32),
                es_t, Dp_t, Dpe_t, weights,
                (jnp.asarray(tg_e, dt), jnp.asarray(fg_e, dt)))
            msg_sum = jnp.transpose(
                msum_t.astype(dt).reshape(M, C, P_loc), (2, 0, 1))
        elif reduced and cfg.edge_kernel in ("pallas-full", "pallas-mega") \
                and cfg.edge_act == "s2":
            # v2: rotation + chain + back-rotation + envelope fused in ONE
            # kernel (block-sparse VPU rotations); XLA only gathers source
            # features and K-sums the output
            from .escn_edge_kernel import (fused_edge_block, pack_d,
                                           _rot_nz)
            K = cfg.max_neighbors
            E_ = P_loc * K
            U = D_sel.shape[-2]
            xn_t_local = jnp.transpose(xn, (1, 2, 0)) \
                .reshape(M * C, P_loc)
            x_full_t = (xn_t_local if axis_name is None
                        else jnp.transpose(allg(xn), (1, 2, 0))
                        .reshape(M * C, -1))
            xs_t = jnp.take(x_full_t, idx.reshape(E_), axis=1)
            # target features per edge; jnp.repeat's backward IS the K-sum
            xt_t = jnp.repeat(xn_t_local, K, axis=1)
            es_t = edge_scalar.reshape(E_, cfg.edge_channels).T
            nnz = len(_rot_nz(cfg.lmax, cfg.mmax)[0])
            Dp_pk = pack_d(cfg, D_sel)                  # [P,K,NZ]
            Dpe_pk = Dp_pk * env
            Dp_t = jnp.transpose(Dp_pk, (2, 0, 1)).reshape(nnz, E_)
            Dpe_t = jnp.transpose(Dpe_pk, (2, 0, 1)).reshape(nnz, E_)
            weights = _pack_conv_weights(blk, alpha, cfg)
            tg_e, fg_e = _edge_grid_tables(cfg.lmax, cfg.mmax)
            out = fused_edge_block(
                cfg, xs_t, xt_t, es_t, Dp_t, Dpe_t, weights,
                (jnp.asarray(tg_e, dt), jnp.asarray(fg_e, dt)))
            msg_sum = jnp.transpose(
                out.astype(dt).reshape(M, C, P_loc, K).sum(-1),
                (2, 0, 1))
        elif reduced and cfg.edge_kernel == "pallas" \
                and cfg.edge_act == "s2":
            # fused VMEM chain: rotate (XLA, transposed-layout einsums) ->
            # [conv1 -> S2 act -> conv2] (Pallas) -> one contraction
            # folding rotate-back x envelope x K-sum
            from .escn_edge_kernel import fused_edge_chain, _bf
            bf = _bf()
            K = cfg.max_neighbors
            E_ = P_loc * K
            U = D_sel.shape[-2]
            D16 = D_sel.astype(bf)
            xs16 = x_s.astype(bf)
            xn16 = xn.astype(bf)
            # rotated pair rows, (u-major, channel-minor) x edges:
            # source channels then target channels along c
            rot_s = jnp.einsum("pkum,pkmc->ucpk", D16, xs16,
                               preferred_element_type=dt).astype(bf)
            rot_t = jnp.einsum("pkum,pmc->ucpk", D16, xn16,
                               preferred_element_type=dt).astype(bf)
            pr_t = jnp.concatenate([rot_s, rot_t], axis=1) \
                .reshape(U * 2 * C, E_)
            es_t = edge_scalar.reshape(E_, cfg.edge_channels).T
            weights = _pack_conv_weights(blk, alpha, cfg)
            tg_e, fg_e = _edge_grid_tables(cfg.lmax, cfg.mmax)
            out = fused_edge_chain(
                cfg, pr_t, es_t, weights,
                (jnp.asarray(tg_e, dt), jnp.asarray(fg_e, dt)))
            # rotate-back + envelope + K-sum in ONE contraction:
            # msg[p,m,c] = sum_{k,u} D[p,k,u,m] out[u,c,p,k] env[p,k]
            out4 = out.reshape(U, C, P_loc, K) \
                * env[..., 0].astype(bf)[None, None]
            msg_sum = jnp.einsum("pkum,ucpk->pmc", D16, out4,
                                 preferred_element_type=dt)
        elif reduced:
            pair_rot = jnp.einsum("...um,...mc->...uc", D_sel,
                                  make_pair())
            msg = _so2_apply_reduced(blk["so2_conv_1"], alpha, pair_rot,
                                     edge_scalar, cfg, 2 * C,
                                     cfg.hidden_channels)
            msg = edge_nonlin(msg)
            msg = _so2_apply_reduced(blk["so2_conv_2"], alpha, msg, None,
                                     cfg, cfg.hidden_channels, C)
            msg = jnp.einsum("...um,...uc->...mc", D_sel, msg) \
                * env[..., None]
            msg_sum = jnp.sum(msg, axis=1)
        else:
            pair_rot = _block_diag_rotate(Dl, make_pair())
            msg = _so2_apply(blk["so2_conv_1"], alpha, pair_rot,
                             edge_scalar, cfg, 2 * C, cfg.hidden_channels)
            msg = edge_nonlin(msg)
            msg = _so2_apply(blk["so2_conv_2"], alpha, msg, None,
                             cfg, cfg.hidden_channels, C)
            msg = _block_diag_rotate(Dl, msg, transpose=True) \
                * env[..., None]
            msg_sum = jnp.sum(msg, axis=1)
        x = x + msg_sum / cfg.avg_degree
        x = x * atom_mask[:, None, None]

        # point-wise S2 FFN on the sphere grid
        xn2 = _equi_rms_norm(x, blk["norm_2"], cfg)
        tg, fg = s2_grid_tables(cfg.lmax, *cfg.grid)
        tg = jnp.asarray(tg, dt)
        fg = jnp.asarray(fg, dt)
        if cfg.use_pallas_ffn:
            # fused VMEM chain (escn_ffn_kernel.py): the [P,G,H] grid
            # activations never touch HBM
            from .escn_ffn_kernel import fused_node_ffn
            W1, b1 = _merged_wb(blk["ffn"][0], alpha)
            W2, b2 = _merged_wb(blk["ffn"][1], alpha)
            x = x + fused_node_ffn(cfg, xn2, (W1, b1, W2, b2),
                                   (tg, fg)).astype(dt)
        else:
            grid = jnp.einsum("gm,pmc->pgc", tg, xn2)
            grid = _mole(blk["ffn"][0], alpha, grid)
            grid = jax.nn.silu(grid)
            grid = _mole(blk["ffn"][1], alpha, grid)
            x = x + jnp.einsum("mg,pgc->pmc", fg, grid)
        return x * atom_mask[:, None, None]

    run_block = jax.checkpoint(block_fn) if cfg.remat_blocks else block_fn
    for blk in params["blocks"]:
        x = run_block(x, blk)

    # ---- energy head --------------------------------------------------------
    xn = _equi_rms_norm(x, params["energy_norm"], cfg)
    s = xn[:, 0, :]
    e = _mole(params["energy_head"][0], alpha, s)
    e = jax.nn.silu(e)
    e_atom = _mole(params["energy_head"][1], alpha, e)[..., 0]
    e_ref = params["atom_ref"][z]
    # accumulate in the promoted dtype (f32 normally; f64 under the x64
    # parity-test policy) so energies are deterministic per precision mode
    return psum(jnp.sum((e_atom + e_ref) * atom_mask))


# registry of named eSCN configs; conversion fills these from checkpoint
# tensor shapes (convert.py), so these entries only size surrogate runs
ESCN_CONFIGS: Dict[str, ESCNConfig] = {
    "escn-s": ESCNConfig(),
    "escn-md": ESCNConfig(lmax=4, mmax=2, sphere_channels=128,
                          hidden_channels=128, edge_channels=64,
                          ffn_hidden=256, num_layers=4, num_experts=8),
    # gate-nonlinearity variants (TPU-fast mode; NOT checkpoint-loadable)
    "escn-md-gate": ESCNConfig(lmax=4, mmax=2, sphere_channels=128,
                               hidden_channels=128, edge_channels=64,
                               ffn_hidden=256, num_layers=4, num_experts=8,
                               edge_act="gate"),
    # UMA-small-shaped surrogate sizing. PROVISIONAL: Meta has published
    # no uma-s-1p1 architecture table in this offline image; these values
    # follow the UMA paper's small-model description (lmax=4/mmax=2
    # eSCN-MD-MoLE). A real checkpoint ignores this entry entirely —
    # convert.infer_config reads every hyperparameter from tensor shapes.
    "escn-uma-s": ESCNConfig(lmax=4, mmax=2, sphere_channels=128,
                             hidden_channels=256, edge_channels=128,
                             ffn_hidden=512, num_layers=8, num_experts=8,
                             max_neighbors=64),
    # minimal config for tests/CI (single-core CPU jit budget)
    "escn-test": ESCNConfig(lmax=2, mmax=1, sphere_channels=8,
                            hidden_channels=8, edge_channels=8,
                            ffn_hidden=16, num_layers=2, num_experts=2,
                            route_dim=4, num_gauss=8, max_neighbors=16),
    "escn-test-gate": ESCNConfig(lmax=2, mmax=1, sphere_channels=8,
                                 hidden_channels=8, edge_channels=8,
                                 ffn_hidden=16, num_layers=2,
                                 num_experts=2, route_dim=4, num_gauss=8,
                                 max_neighbors=16, edge_act="gate"),
}


_ESCN_FN_CACHE: Dict[ESCNConfig, Any] = {}


def ESCN_FN_FOR(cfg: ESCNConfig):
    """The cached Calculator-protocol energy closure for a config (no
    parameter initialization — use when weights come from a checkpoint)."""
    fn = _ESCN_FN_CACHE.get(cfg)
    if fn is None:
        def fn(coords, system, params):
            return escn_energy(coords, system, params, cfg)

        fn.takes_params = True
        _ESCN_FN_CACHE[cfg] = fn
    return fn


def make_escn_model(name_or_cfg, *, seed: int = 0, charge: int = 0,
                    spin: int = 1, task: int = 0):
    """(energy_fn, params, cfg) conforming to the Calculator protocol.
    The closure is cached per config (shared engine compile caches)."""
    cfg = (ESCN_CONFIGS[name_or_cfg] if isinstance(name_or_cfg, str)
           else name_or_cfg)
    params = init_escn_params(jax.random.PRNGKey(seed), cfg)
    params["charge"] = jnp.asarray(charge, jnp.float32)
    params["spin"] = jnp.asarray(spin, jnp.float32)
    params["task"] = jnp.asarray(task, jnp.float32)
    return ESCN_FN_FOR(cfg), params, cfg
