"""UMA-class equivariant MLIP in pure JAX over the dense neighbor layout.

Role: the TPU-native stand-in for fairchem's UMA predictor
(/root/reference/pdb2reaction/uma_pysis.py:170-419): given element numbers,
positions (Angstrom) and total charge/spin, produce the potential energy in
eV; forces come free via ``jax.grad`` through the calculator, Hessians via
forward-over-reverse.

Architecture — an E(3)-equivariant message-passing network of the
PaiNN/NequIP family (scalar + Cartesian-vector node features), re-shaped for
the TPU:

- **dense neighbor matrix** ``[P, K]`` instead of edge lists: gathers become
  ``x[idx]`` (XLA dynamic-gather over a static shape), scatter-adds become
  reductions over the K axis — no atomics, MXU-friendly batched matmuls of
  shape [P*K, C].
- static shapes everywhere: padded atoms P, capped neighbors K; masks fold
  padding out of every reduction.
- charge/spin conditioning: learned embeddings of total charge and spin
  multiplicity are added to the initial scalar features (UMA attaches both
  to the batch, uma_pysis.py:313-316).
- per-element reference energies ("atom refs") + learned readout.

Weight parity with the published UMA checkpoints requires the eSCN-MoE
backbone and its exact radius-graph semantics; that converter lands with
``convert.py`` (see its docstring for the mapping plan). Until then the
registry ships surrogate configs with deterministic seeded init — the full
framework (optimizers, GSM, Hessians, workflows) is architecture-agnostic:
it only sees ``energy_fn(coords, system, params)``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.structure import PaddedSystem
from ..core.neighbors import dense_neighbors_rows, neighbor_vectors
from .radial import bessel_basis, cosine_envelope


@dataclass(frozen=True)
class ModelConfig:
    hidden: int = 128           # scalar channel width
    n_layers: int = 4
    n_radial: int = 20
    cutoff: float = 6.0         # Angstrom (UMA default radius, uma_pysis.py:304)
    max_neighbors: int = 32
    max_z: int = 100
    charge_range: int = 8       # embeddings for charge in [-range, range]
    spin_range: int = 8         # multiplicity 1..range
    dtype: Any = jnp.float32
    # message-passing layout: "dense" contracts a [P,P,R] radial adjacency
    # with plain matmuls (zero gathers — the TPU/MXU-native formulation;
    # also exact: no max_neighbors truncation); "gather" is the [P,K]
    # neighbor-matrix variant for very large P where P^2 is prohibitive.
    mp_mode: str = "dense"
    # rematerialize each message layer in the backward pass: trades ~40%
    # throughput (244 -> 176 calls/s at batch 64 on v5e) for per-layer
    # activation memory; off by default since the A/d layout + f32 policy
    # already fit 64-image batches
    remat_layers: bool = False
    # MXU multiply precision for the radial-contraction dots. None = JAX
    # default, which on TPU is ONE bf16 pass per f32 matmul — measured on
    # v5e (scripts/tpu_matmul_precision.py, 2026-08-19) at the dense-path
    # shape: DEFAULT max rel err vs f64 = 2.4e-3 (identical to bf16
    # inputs), "high" (3 bf16 passes) = 1.4e-5, "highest" (6 passes) =
    # 1.5e-7. The default matches this framework's MLIP precision policy
    # (the eSCN Pallas kernels run bf16 multiplies with f32 accumulation
    # for the same reason: ~1e-3 relative is below UMA-class force-error
    # floors); set "highest" for strict-f32 parity work on TPU. CPU
    # backends always compute true f32 regardless.
    matmul_precision: Any = None


# Registry of named configs. "uma-s-1p1" is the flagship surrogate matching
# the reference's default model name (uma_pysis.py CALC_KW model field).
CONFIGS: Dict[str, ModelConfig] = {
    "uma-s-1p1": ModelConfig(hidden=256, n_layers=4, n_radial=24,
                             cutoff=6.0, max_neighbors=32),
    "uma-m-1p1": ModelConfig(hidden=512, n_layers=6, n_radial=32,
                             cutoff=6.0, max_neighbors=48),
    "small": ModelConfig(hidden=64, n_layers=2, n_radial=8,
                         cutoff=5.0, max_neighbors=16),
    # fast-inference variant: bfloat16 feature math (f32 accumulation via
    # preferred_element_type), ~1.7x throughput on v5e; forces carry ~1e-3
    # relative noise — fine for gau_loose pre-optimization and path
    # exploration, use the f32 config for tight refinement
    "uma-s-1p1-bf16": ModelConfig(hidden=256, n_layers=4, n_radial=24,
                                  cutoff=6.0, max_neighbors=32,
                                  dtype=jnp.bfloat16),
}


def _dense(key, n_in, n_out, dtype):
    k1, _ = jax.random.split(key)
    w = jax.random.normal(k1, (n_in, n_out), dtype) / np.sqrt(n_in)
    b = jnp.zeros((n_out,), dtype)
    return {"w": w, "b": b}


def _apply_dense(p, x):
    return x @ p["w"] + p["b"]


def _mlp(key, dims, dtype):
    keys = jax.random.split(key, len(dims) - 1)
    return [_dense(k, dims[i], dims[i + 1], dtype)
            for i, k in enumerate(keys)]


def _apply_mlp(layers, x):
    for i, p in enumerate(layers):
        x = _apply_dense(p, x)
        if i < len(layers) - 1:
            x = jax.nn.silu(x)
    return x


def init_params(key, cfg: ModelConfig) -> Dict[str, Any]:
    C, R = cfg.hidden, cfg.n_radial
    dt = cfg.dtype
    ks = jax.random.split(key, 8 + 4 * cfg.n_layers)
    params: Dict[str, Any] = {
        "embed_z": jax.random.normal(ks[0], (cfg.max_z + 1, C), dt) * 0.5,
        "embed_q": jax.random.normal(ks[1], (2 * cfg.charge_range + 1, C), dt) * 0.1,
        "embed_s": jax.random.normal(ks[2], (cfg.spin_range + 1, C), dt) * 0.1,
        "atom_ref": jnp.zeros((cfg.max_z + 1,), jnp.float32),
        "readout": _mlp(ks[3], (C, C // 2, 1), dt),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        k0, k1, k2, k3 = ks[4 + 4 * i: 8 + 4 * i]
        params["layers"].append({
            # message block
            "phi": _mlp(k0, (C, C, 3 * C), dt),          # from s_j
            "w_radial": _dense(k1, R, 3 * C, dt),        # radial filter
            # update block
            "upd_vu": jax.random.normal(k2, (C, C), dt) / np.sqrt(C),
            "upd_vv": jax.random.normal(jax.random.fold_in(k2, 1), (C, C), dt) / np.sqrt(C),
            "upd_mlp": _mlp(k3, (2 * C, C, 3 * C), dt),
        })
    return params


def _embed_z(z, params, cfg, atom_mask):
    """Initial scalar features for (already clipped) element rows ``z``."""
    s = params["embed_z"][z]
    q_idx = jnp.clip(params["charge"].astype(jnp.int32) + cfg.charge_range,
                     0, 2 * cfg.charge_range)
    m_idx = jnp.clip(params["spin"].astype(jnp.int32), 0, cfg.spin_range)
    s = s + params["embed_q"][q_idx] + params["embed_s"][m_idx]
    return s * atom_mask[:, None]


def _embed_nodes(system, params, cfg, atom_mask, row_slice=None):
    numbers = system.numbers
    if row_slice is not None:
        numbers = jax.lax.dynamic_slice_in_dim(numbers, row_slice[0],
                                               row_slice[1])
    z = jnp.clip(numbers, 0, cfg.max_z)
    return z, _embed_z(z, params, cfg, atom_mask)


def _update_block(lp, s, v, atom_mask):
    vu = v @ lp["upd_vu"]                           # [P,3,C]
    vv = v @ lp["upd_vv"]
    vv_norm = jnp.sqrt(jnp.sum(vv * vv, axis=1) + 1e-8)   # [P,C] invariant
    a = _apply_mlp(lp["upd_mlp"], jnp.concatenate([s, vv_norm], -1))
    a_ss, a_sv, a_vv = jnp.split(a, 3, axis=-1)
    dot_uv = jnp.sum(vu * vv, axis=1)               # [P,C]
    s = s + (a_ss + a_sv * dot_uv) * atom_mask[:, None]
    v = v + a_vv[:, None, :] * vu * atom_mask[:, None, None]
    return s, v


def _readout(params, s, z, atom_mask, coords_dtype):
    e_atom = _apply_mlp(params["readout"], s)[..., 0]   # [P]
    e_ref = params["atom_ref"][z]
    e = jnp.sum((e_atom.astype(jnp.float32) + e_ref)
                * atom_mask.astype(jnp.float32))
    return e.astype(jnp.float64) if coords_dtype == jnp.float64 else e


def gather_energy_core(coords_ang, system, params, cfg, *,
                       axis_name=None, n_shards: int = 1) -> jnp.ndarray:
    """[P,K] neighbor-matrix formulation, optionally atom-axis sharded.

    With ``axis_name=None`` this is the plain single-device gather variant.
    Inside a ``shard_map`` over ``axis_name`` (n_shards static) it becomes
    **spatial partitioning**: every shard owns a contiguous block of
    P/n_shards atom rows — its neighbor slab, message rows, and node-feature
    updates — while the full coordinate array (tiny, [P,3]) is replicated.
    The only cross-shard traffic is one tiled ``all_gather`` of the node
    features per layer (neighbor indices are global), which XLA rides over
    ICI; the energy is a ``psum`` of per-shard row sums. This is the
    single-big-structure scale-out replacing the reference's multi-node Ray
    fan-out (/root/reference/pdb2reaction/uma_pysis.py:234-242,
    docs/uma_pysis.md:30-155) — SURVEY §5.7's "spatial partitioning" axis.
    """
    dt = cfg.dtype
    P = coords_ang.shape[0]
    C = cfg.hidden
    if axis_name is None:
        P_loc, i0 = P, 0
        allg = lambda x: x                              # noqa: E731
        psum = lambda e: e                              # noqa: E731
    else:
        assert P % n_shards == 0, (P, n_shards)
        P_loc = P // n_shards
        i0 = jax.lax.axis_index(axis_name) * P_loc
        allg = lambda x: jax.lax.all_gather(            # noqa: E731
            x, axis_name, tiled=True)
        psum = lambda e: jax.lax.psum(e, axis_name)     # noqa: E731

    rows = jax.lax.dynamic_slice_in_dim(coords_ang, i0, P_loc)
    atom_mask = jax.lax.dynamic_slice_in_dim(
        system.atom_mask, i0, P_loc).astype(dt)
    z_rows = jnp.clip(
        jax.lax.dynamic_slice_in_dim(system.numbers, i0, P_loc),
        0, cfg.max_z)

    idx, nbr_mask = dense_neighbors_rows(coords_ang, system.atom_mask,
                                         cfg.cutoff, cfg.max_neighbors,
                                         i0, P_loc)
    idx = jax.lax.stop_gradient(idx)
    nbr_mask = jax.lax.stop_gradient(nbr_mask).astype(dt)
    vec, dist = neighbor_vectors(coords_ang, idx, nbr_mask, origin=rows)
    vec = vec.astype(dt)
    dist = dist.astype(dt)
    unit = vec / dist[..., None]                        # [P_loc,K,3]
    env = (cosine_envelope(dist, cfg.cutoff) * nbr_mask)  # [P_loc,K]
    # radial features with the envelope folded in; the trailing channel
    # carries the env itself so the filter bias is env-gated too
    rad = jnp.concatenate(
        [bessel_basis(dist, cfg.cutoff, cfg.n_radial) * env[..., None],
         env[..., None]], -1)                           # [P_loc,K,R+1]

    s = _embed_z(z_rows, params, cfg, atom_mask)
    v = jnp.zeros((P_loc, 3, C), dt)                    # vector features

    for lp in params["layers"]:
        W = jnp.concatenate([lp["w_radial"]["w"],
                             lp["w_radial"]["b"][None, :]], 0)  # [R+1,3C]
        phi = _apply_mlp(lp["phi"], s)                  # [P_loc,3C]
        phi_j = allg(phi)[idx]                          # [P_loc,K,3C] gather
        w = rad @ W                                     # [P_loc,K,3C]
        m = phi_j * w
        m_s, m_vv, m_vs = jnp.split(m, 3, axis=-1)      # [P_loc,K,C] each
        ds = jnp.sum(m_s, axis=1)                       # [P_loc,C]
        v_j = allg(v)[idx]                              # [P_loc,K,3,C]
        dv = jnp.sum(m_vv[:, :, None, :] * v_j, axis=1)
        dv = dv + jnp.sum(m_vs[:, :, None, :] * unit[..., None], axis=1)
        s = s + ds * atom_mask[:, None]
        v = v + dv * atom_mask[:, None, None]
        s, v = _update_block(lp, s, v, atom_mask)

    return psum(_readout(params, s, z_rows, atom_mask, coords_ang.dtype))


def energy_fn_gather(coords_ang, system, params, cfg) -> jnp.ndarray:
    """[P,K] neighbor-matrix variant (for very large P)."""
    return gather_energy_core(coords_ang, system, params, cfg)


def energy_fn_dense(coords_ang, system, params, cfg) -> jnp.ndarray:
    """Dense radial-adjacency formulation — the TPU-native hot path.

    Message passing becomes pure matmuls: with the radial adjacency
    A[i,j,r] = bessel_r(d_ij) * env(d_ij) (plus an env-only channel for
    the filter bias), the PaiNN message
        ds[i,c] = sum_j phi[j,c] * w[i,j,c],  w = A @ W
    contracts as ONE deep matmul over the JOINT (j, r) axis:
        ds[i,c] = sum_{(j,r)} A2[i,(j,r)] * (phi[j,c] W[r,c])
    i.e. A reshaped [P, P*(R+1)] against a broadcast-product right-hand
    side — the per-stream [P,R+1,C]/[P,R+1,3,C] intermediates of the
    earlier two-einsum form (and their backward copies) never exist, and
    all three streams sharing an adjacency ride one [P, P*(R+1)] x
    [P*(R+1), 4C] dot (round-4: the whole per-image force call is
    HBM-bound, not MXU-bound — see ModelConfig.matmul_precision). Exactly
    the same math: only the (j, r) summation is reassociated. No [P,K,3C]
    gather intermediates ever exist either (the gather variant OOMs at
    image-batch 64 on v5e: 32.5 GB of HLO temps), and the formulation is
    exact: every in-cutoff neighbor contributes (no max_neighbors
    truncation).
    """
    dt = cfg.dtype
    P = coords_ang.shape[0]
    C = cfg.hidden
    atom_mask = system.atom_mask.astype(dt)

    x = coords_ang.astype(dt)
    diff = x[:, None, :] - x[None, :, :]
    d2 = jnp.sum(diff * diff, -1)
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))
    eye = jnp.eye(P, dtype=bool)
    pair = (atom_mask[:, None] * atom_mask[None, :]
            * (1.0 - jnp.eye(P, dtype=dt)))
    within = (d <= cfg.cutoff) & (~eye)
    env = cosine_envelope(d, cfg.cutoff) * pair * within.astype(dt)  # [P,P]
    d_safe = jnp.where(within, d, 1.0)
    A = jnp.concatenate(
        [bessel_basis(d_safe, cfg.cutoff, cfg.n_radial) * env[..., None],
         env[..., None]], -1)                            # [P,P,R+1]
    # A/d for the edge-direction stream: with u = (x_i - x_j)/d,
    #   sum_j A u_k phi = x_ik * (Ad phi) - Ad (x_k phi),   Ad = A/d.
    # This keeps every adjacency at [P,P,R+1]; the earlier Au layout
    # ([P,P,3(R+1)]) held ~8 live backward copies and OOM'd the v5e at
    # 12-image batches (40.7 GB HLO temps).
    Ad = A / d_safe[..., None]

    z, s = _embed_nodes(system, params, cfg, atom_mask)
    v = jnp.zeros((P, 3, C), dt)

    R1 = cfg.n_radial + 1
    A2 = A.reshape(P, P * R1)                            # [i, (j,r)]
    Ad2 = Ad.reshape(P, P * R1)
    prec = cfg.matmul_precision

    def jr_dot(adj2, rhs):
        # sum over the joint (j, r) axis: [P, P*R1] x [P*R1, cols]
        return jax.lax.dot_general(adj2, rhs, (((1,), (0,)), ((), ())),
                                   precision=prec,
                                   preferred_element_type=dt)

    def layer(carry, lp):
        s, v = carry
        W = jnp.concatenate([lp["w_radial"]["w"],
                             lp["w_radial"]["b"][None, :]], 0)  # [R+1,3C]
        W_s, W_vv, W_vs = jnp.split(W, 3, axis=-1)       # [R+1,C]
        phi = _apply_mlp(lp["phi"], s)                   # [P,3C]
        phi_s, phi_vv, phi_vs = jnp.split(phi, 3, axis=-1)
        # fused double contraction, scalar + vector-1 streams (shared A):
        #   out[i, m] = sum_{j,r} A[i,j,r] rhs[j, m] W[r, m-block]
        phiv = (phi_vv[:, None, :] * v).reshape(P, 3 * C)
        rhsA = jnp.concatenate(
            [phi_s[:, None, :] * W_s[None],
             phiv[:, None, :] * jnp.tile(W_vv, (1, 3))[None]],
            axis=-1).reshape(P * R1, 4 * C)              # [(j,r), 4C]
        outA = jr_dot(A2, rhsA)                          # [P, 4C]
        ds = outA[:, :C]
        dv = outA[:, C:].reshape(P, 3, C)
        # vector stream 2 via the A/d split (no directional adjacency)
        featsB = jnp.concatenate(
            [x[:, k:k + 1] * phi_vs for k in range(3)] + [phi_vs], -1)
        rhsB = (featsB[:, None, :] * jnp.tile(W_vs, (1, 4))[None]) \
            .reshape(P * R1, 4 * C)
        outB = jr_dot(Ad2, rhsB)                         # [P, 4C]
        dv2 = outB[:, 3 * C:][:, None, :] * x[:, :, None] \
            - outB[:, :3 * C].reshape(P, 3, C)
        s = s + ds * atom_mask[:, None]
        v = v + (dv + dv2) * atom_mask[:, None, None]
        s, v = _update_block(lp, s, v, atom_mask)
        return (s, v)

    # optionally rematerialize each layer: backward recomputes layer temps
    # instead of keeping T/Q alive across all layers
    layer_fn = jax.checkpoint(layer) if cfg.remat_layers else layer
    for lp in params["layers"]:
        s, v = layer_fn((s, v), lp)

    return _readout(params, s, z, atom_mask, coords_ang.dtype)


def energy_fn_pallas(coords_ang, system, params, cfg, *,
                     axis_name=None, n_shards: int = 1) -> jnp.ndarray:
    """Fused-kernel formulation for large systems.

    Same math as ``energy_fn_dense`` but every radial contraction runs
    through the Pallas ``radial_contract`` kernel (pallas_ops.py): the
    [P,P,R] adjacency is built tile-wise in VMEM and contracted on the
    MXU without ever touching HBM — O(P) memory instead of O(P^2).
    The edge-direction stream uses the u = (x_i - x_j)/d split:
        sum_j A u_k phi = x_ik * (B phi) - B (x_k phi),   B = A/d.

    Inside a ``shard_map`` over ``axis_name`` the two large-system
    mechanisms COMPOSE (VERDICT r2 item 5): each shard owns P/n_shards
    atom ROWS and contracts them against the full column set through the
    RECTANGULAR kernel (radial_contract_rect) — O(P/n) memory per chip
    AND no O(P^2) adjacency anywhere. Per layer the only cross-shard
    traffic is one tiled all_gather of the feature streams; the energy is
    a psum of per-shard row sums.
    """
    from .pallas_ops import radial_contract, radial_contract_rect
    dt = jnp.float32
    P = coords_ang.shape[0]
    C = cfg.hidden
    x_full = coords_ang.astype(dt)
    mask_full = system.atom_mask.astype(dt)
    if axis_name is None:
        P_loc, i0 = P, 0
        allg = lambda v: v                              # noqa: E731
        psum = lambda e: e                              # noqa: E731

        def contract(feats_full, div_d=False):
            return radial_contract(x_full, mask_full, feats_full,
                                   cfg.cutoff, cfg.n_radial, div_d)
    else:
        assert P % n_shards == 0, (P, n_shards)
        P_loc = P // n_shards
        i0 = jax.lax.axis_index(axis_name) * P_loc
        allg = lambda v: jax.lax.all_gather(            # noqa: E731
            v, axis_name, tiled=True)
        psum = lambda e: jax.lax.psum(e, axis_name)     # noqa: E731
        rows_x = jax.lax.dynamic_slice_in_dim(x_full, i0, P_loc)
        rows_m = jax.lax.dynamic_slice_in_dim(mask_full, i0, P_loc)

        def contract(feats_full, div_d=False):
            return radial_contract_rect(
                rows_x, rows_m, i0, x_full, mask_full, feats_full,
                cfg.cutoff, cfg.n_radial, div_d)

    atom_mask = jax.lax.dynamic_slice_in_dim(mask_full, i0, P_loc)
    x = jax.lax.dynamic_slice_in_dim(x_full, i0, P_loc)

    z, s = _embed_nodes(system, params, cfg, atom_mask,
                        row_slice=(i0, P_loc))
    s = s.astype(dt)
    v = jnp.zeros((P_loc, 3, C), dt)

    for lp in params["layers"]:
        W = jnp.concatenate([lp["w_radial"]["w"],
                             lp["w_radial"]["b"][None, :]],
                            0).astype(dt)                 # [R+1,3C]
        W_s, W_vv, W_vs = jnp.split(W, 3, axis=-1)
        phi = _apply_mlp(lp["phi"], s)
        phi_s, phi_vv, phi_vs = jnp.split(phi, 3, axis=-1)
        # scalar + vector A-streams CONCATENATED into one kernel call:
        # each radial_contract call-site costs a separate Mosaic kernel
        # compile through the custom VJP (~5 s each on the axon relay)
        feats_v = (phi_vv[:, None, :] * v).reshape(P_loc, 3 * C)
        T_sv = contract(allg(jnp.concatenate([phi_s, feats_v], axis=1)))
        T_s = T_sv[..., :C]
        T_v = T_sv[..., C:].reshape(P_loc, -1, 3, C)
        ds = jnp.einsum("irc,rc->ic", T_s, W_s,
                        preferred_element_type=dt)
        dv = jnp.einsum("irkc,rc->ikc", T_v, W_vv,
                        preferred_element_type=dt)
        featsB = jnp.concatenate(
            [x[:, k:k + 1] * phi_vs for k in range(3)] + [phi_vs], -1)
        Q = contract(allg(featsB), div_d=True)            # [P_loc,R+1,4C]
        Q1 = Q[..., : 3 * C].reshape(P_loc, -1, 3, C)
        Q2 = Q[..., 3 * C:]
        # u = (x_i - x_j)/d convention (matches energy_fn_dense)
        dv2 = jnp.einsum("irc,rc->ic", Q2, W_vs,
                         preferred_element_type=dt)[:, None, :] \
            * x[:, :, None] \
            - jnp.einsum("irkc,rc->ikc", Q1, W_vs,
                         preferred_element_type=dt)
        s = s + ds * atom_mask[:, None]
        v = v + (dv + dv2) * atom_mask[:, None, None]
        s, v = _update_block(lp, s, v, atom_mask)

    return psum(_readout(params, s, z, atom_mask, coords_ang.dtype))


def energy_fn(coords_ang: jnp.ndarray, system: PaddedSystem,
              params: Dict[str, Any], cfg: ModelConfig) -> jnp.ndarray:
    """Total potential energy in eV. Pure; differentiable in coords."""
    if cfg.mp_mode == "pallas":
        return energy_fn_pallas(coords_ang, system, params, cfg)
    if cfg.mp_mode == "dense":
        return energy_fn_dense(coords_ang, system, params, cfg)
    return energy_fn_gather(coords_ang, system, params, cfg)


_FN_CACHE: Dict[Any, Any] = {}


def make_model(name_or_cfg, *, seed: int = 0, charge: int = 0, spin: int = 1):
    """Build (energy_fn, params) for the registry entry.

    Returns a closure matching the Calculator protocol
    ``fn(coords, system, params)`` plus an initial params pytree that
    includes the charge/spin conditioning scalars. The closure is CACHED
    per config: calculators built from the same config share one function
    identity, so every engine compile cache keyed on it is shared too.
    """
    cfg = (CONFIGS[name_or_cfg] if isinstance(name_or_cfg, str)
           else name_or_cfg)
    key = jax.random.PRNGKey(seed)
    weights = init_params(key, cfg)
    weights["charge"] = jnp.asarray(charge, jnp.float32)
    weights["spin"] = jnp.asarray(spin, jnp.float32)

    fn = _FN_CACHE.get(cfg)
    if fn is None:
        def fn(coords, system, params):
            return energy_fn(coords, system, params, cfg)

        fn.takes_params = True
        _FN_CACHE[cfg] = fn
    return fn, weights, cfg
