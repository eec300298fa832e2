"""Torch-CPU mirror of the eSCN-MoE backbone for weight-conversion parity.

This is the fairchem-free re-execution target: a torch ``nn.Module`` whose
``state_dict()`` uses fairchem-style hierarchical names
(``backbone.blocks.{i}.so2_conv_1.fc_m0.weight`` ...) and whose forward
computes the same architecture as ``pdb2reaction_tpu.mlip.escn`` in float64.
The parity test (test_escn_parity.py) initializes THIS module, exports its
state dict, converts it with ``mlip.convert.convert_state_dict`` and checks
JAX energies/forces against torch autograd to <= 1e-6 eV/atom — the
round-trip every real checkpoint takes.

Shared framework-neutral pieces: the Ivanic-Ruedenberg recursion coefficients
and the S2 grid tables come from ``mlip.so3`` (numpy); all tensor math here
is torch.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn

from pdb2reaction_tpu.mlip.so3 import (_ir_next, s2_grid_tables,
                                       s2_grid_tables_midpoint)
from pdb2reaction_tpu.mlip.escn import ESCNConfig, _m_indices, _used_indices


class _TorchXP:
    """Minimal array-namespace adapter so the shared IR recursion runs on
    torch tensors (axis= -> dim=)."""

    @staticmethod
    def stack(arrays, axis=0):
        return torch.stack(list(arrays), dim=axis)


def wigner_blocks_torch(rot: torch.Tensor, lmax: int):
    """Per-l real-SH rotation blocks, same convention as so3.wigner_blocks."""
    batch = rot.shape[:-2]
    blocks = [torch.ones(batch + (1, 1), dtype=rot.dtype)]
    if lmax == 0:
        return blocks
    perm = torch.tensor([[0.0, 1.0, 0.0],
                         [0.0, 0.0, 1.0],
                         [1.0, 0.0, 0.0]], dtype=rot.dtype)
    D1 = perm @ rot @ perm.T
    blocks.append(D1)
    Dprev = D1
    for l in range(2, lmax + 1):  # noqa: E741
        Dl = _ir_next(D1, Dprev, l, _TorchXP)
        blocks.append(Dl)
        Dprev = Dl
    return blocks


def edge_rot_mat_torch(vec: torch.Tensor) -> torch.Tensor:
    """Proper rotation with R @ d_hat = +z (same frame rule as so3)."""
    d = vec / vec.norm(dim=-1, keepdim=True)
    helper_idx = torch.argmin(d.abs(), dim=-1).detach()
    helper = torch.nn.functional.one_hot(helper_idx, 3).to(d.dtype)
    a = torch.cross(d, helper, dim=-1)
    a = a / a.norm(dim=-1, keepdim=True)
    return torch.stack([a, torch.cross(d, a, dim=-1), d], dim=-2)


def dense_neighbors_torch(coords: torch.Tensor, cutoff: float, k: int):
    """Nearest-K-within-cutoff neighbor matrix (core.neighbors semantics)."""
    P = coords.shape[0]
    d = torch.cdist(coords, coords)
    eye = torch.eye(P, dtype=torch.bool)
    within = (~eye) & (d <= cutoff)
    d_masked = torch.where(within, d, torch.full_like(d, math.inf))
    k = min(k, P)
    vals, idx = torch.topk(-d_masked, k, dim=-1)
    mask = torch.isfinite(vals).to(coords.dtype)
    idx = torch.where(mask > 0, idx, torch.zeros_like(idx))
    return idx, mask


class MoLELinear(nn.Module):
    """Stacked expert weights; weight [E, out, in] like a stacked nn.Linear."""

    def __init__(self, experts, n_in, n_out):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(experts, n_out, n_in)
                                   / math.sqrt(n_in))
        self.bias = nn.Parameter(torch.zeros(experts, n_out))

    def forward(self, alpha, x):
        W = torch.einsum("e,eoi->oi", alpha, self.weight)
        b = torch.einsum("e,eo->o", alpha, self.bias)
        return x @ W.T + b


class SO2Conv(nn.Module):
    def __init__(self, cfg: ESCNConfig, c_in, c_out, with_edge):
        super().__init__()
        nl0 = cfg.lmax + 1
        d_in0 = nl0 * c_in + (cfg.edge_channels if with_edge else 0)
        self.fc_m0 = MoLELinear(cfg.num_experts, d_in0, nl0 * c_out)
        for m in range(1, cfg.mmax + 1):
            nl = cfg.lmax + 1 - m
            setattr(self, f"fc_m{m}_r",
                    MoLELinear(cfg.num_experts, nl * c_in, nl * c_out))
            setattr(self, f"fc_m{m}_i",
                    MoLELinear(cfg.num_experts, nl * c_in, nl * c_out))
        self.cfg, self.c_in, self.c_out = cfg, c_in, c_out

    def forward(self, alpha, x_rot, edge_scalar):
        cfg, c_in, c_out = self.cfg, self.c_in, self.c_out
        m0, pos, neg = _m_indices(cfg.lmax, cfg.mmax)
        batch = x_rot.shape[:-2]
        nl0 = cfg.lmax + 1
        x0 = x_rot[..., m0, :].reshape(batch + (nl0 * c_in,))
        if edge_scalar is not None:
            x0 = torch.cat([x0, edge_scalar], dim=-1)
        y0 = self.fc_m0(alpha, x0).reshape(batch + (nl0, c_out))
        M = (cfg.lmax + 1) ** 2
        out = torch.zeros(batch + (M, c_out), dtype=x_rot.dtype)
        out[..., m0, :] = y0
        for m in range(1, cfg.mmax + 1):
            nl = cfg.lmax + 1 - m
            xp = x_rot[..., pos[m - 1], :].reshape(batch + (nl * c_in,))
            xn = x_rot[..., neg[m - 1], :].reshape(batch + (nl * c_in,))
            Wr = getattr(self, f"fc_m{m}_r")
            Wi = getattr(self, f"fc_m{m}_i")
            yp = Wr(alpha, xp) - Wi(alpha, xn)
            yn = Wi(alpha, xp) + Wr(alpha, xn)
            out[..., pos[m - 1], :] = yp.reshape(batch + (nl, c_out))
            out[..., neg[m - 1], :] = yn.reshape(batch + (nl, c_out))
        return out


class EquiRMSNorm(nn.Module):
    def __init__(self, cfg: ESCNConfig):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(cfg.lmax + 1,
                                              cfg.sphere_channels))
        self.lmax = cfg.lmax

    def forward(self, x, eps=1e-6):
        outs = []
        for l in range(self.lmax + 1):  # noqa: E741
            i0 = l * l
            blk = x[..., i0:i0 + 2 * l + 1, :]
            rms = torch.sqrt(blk.pow(2).mean(dim=(-2, -1), keepdim=True)
                             + eps)
            outs.append(blk / rms * self.weight[l])
        return torch.cat(outs, dim=-2)


class FFN(nn.Module):
    def __init__(self, cfg: ESCNConfig):
        super().__init__()
        self.w1 = MoLELinear(cfg.num_experts, cfg.sphere_channels,
                             cfg.ffn_hidden)
        self.w2 = MoLELinear(cfg.num_experts, cfg.ffn_hidden,
                             cfg.sphere_channels)


class Block(nn.Module):
    def __init__(self, cfg: ESCNConfig):
        super().__init__()
        C, h = cfg.sphere_channels, cfg.hidden_channels
        self.norm_1 = EquiRMSNorm(cfg)
        self.so2_conv_1 = SO2Conv(cfg, 2 * C, h, with_edge=True)
        if cfg.edge_act == "gate":
            self.gate = MoLELinear(cfg.num_experts, h, h)
        self.so2_conv_2 = SO2Conv(cfg, h, C, with_edge=False)
        self.norm_2 = EquiRMSNorm(cfg)
        self.ffn = FFN(cfg)


class Backbone(nn.Module):
    def __init__(self, cfg: ESCNConfig):
        super().__init__()
        C = cfg.sphere_channels
        E = cfg.num_experts
        self.sphere_embedding = nn.Embedding(cfg.max_z + 1, C)
        self.source_embedding = nn.Embedding(cfg.max_z + 1,
                                             cfg.edge_channels)
        self.target_embedding = nn.Embedding(cfg.max_z + 1,
                                             cfg.edge_channels)
        self.charge_embedding = nn.Embedding(2 * cfg.charge_range + 1,
                                             cfg.route_dim)
        self.spin_embedding = nn.Embedding(cfg.spin_range + 1, cfg.route_dim)
        self.task_embedding = nn.Embedding(cfg.num_tasks, cfg.route_dim)
        self.router = nn.ModuleList(
            [nn.Linear(3 * cfg.route_dim, cfg.route_dim), nn.Linear(cfg.route_dim, E)])
        self.edge_mlp = nn.ModuleList(
            [nn.Linear(2 * cfg.edge_channels + cfg.num_gauss,
                       cfg.edge_channels),
             nn.Linear(cfg.edge_channels, cfg.edge_channels)])
        self.edge_degree_proj = MoLELinear(E, cfg.edge_channels,
                                           (cfg.lmax + 1) * C)
        self.blocks = nn.ModuleList(Block(cfg) for _ in range(cfg.num_layers))
        self.energy_norm = EquiRMSNorm(cfg)
        self.energy_head = nn.ModuleList([MoLELinear(E, C, C),
                                          MoLELinear(E, C, 1)])
        self.atom_ref = nn.Parameter(torch.zeros(cfg.max_z + 1))
        self.cfg = cfg


class ESCNTorch(nn.Module):
    """uma-class predictor: energy in eV; forces via autograd."""

    def __init__(self, cfg: ESCNConfig, seed: int = 0):
        super().__init__()
        torch.manual_seed(seed)
        self.backbone = Backbone(cfg)
        self.cfg = cfg
        self.double()

    # -- helpers ------------------------------------------------------------
    def _rotate(self, blocks, x, transpose=False):
        outs = []
        for l, D in enumerate(blocks):  # noqa: E741
            i0 = l * l
            blk = x[..., i0:i0 + 2 * l + 1, :]
            Dl = D.transpose(-1, -2) if transpose else D
            outs.append(torch.einsum("...mn,...nc->...mc", Dl, blk))
        return torch.cat(outs, dim=-2)

    def _gate(self, p, alpha, x):
        s = x[..., 0, :]
        gates = torch.sigmoid(p(alpha, s))
        out = x * gates[..., None, :]
        out = out.clone()
        out[..., 0, :] = torch.nn.functional.silu(s)
        return out

    def _s2_act(self, x):
        """Separable S2 activation on the |m| <= mmax subspace (fairchem
        SeparableS2Activation with SO3_Grid(lmax, mmax) resolution)."""
        cfg = self.cfg
        tg, fg = s2_grid_tables_midpoint(cfg.lmax, 2 * (cfg.lmax + 1),
                                         2 * cfg.mmax + 1)
        used = _used_indices(cfg.lmax, cfg.mmax)
        tg = torch.as_tensor(tg[:, used], dtype=x.dtype)
        fg = torch.as_tensor(fg[used, :], dtype=x.dtype)
        x_u = x[..., used, :]
        s = x_u[..., 0, :]
        grid = torch.einsum("gu,...uc->...gc", tg, x_u)
        grid = torch.nn.functional.silu(grid)
        back = torch.einsum("ug,...gc->...uc", fg, grid)
        back = back.clone()
        back[..., 0, :] = torch.nn.functional.silu(s)
        out = torch.zeros_like(x)
        out[..., used, :] = back
        return out

    def forward(self, numbers, coords, charge=0, spin=1, task=0):
        cfg = self.cfg
        bb = self.backbone
        P = coords.shape[0]
        C = cfg.sphere_channels
        M = (cfg.lmax + 1) ** 2
        z = numbers.clamp(0, cfg.max_z)

        q_idx = int(np.clip(charge + cfg.charge_range,
                            0, 2 * cfg.charge_range))
        s_idx = int(np.clip(spin, 0, cfg.spin_range))
        t_idx = int(np.clip(task, 0, cfg.num_tasks - 1))
        route_in = torch.cat([
            bb.task_embedding.weight[t_idx],
            bb.charge_embedding.weight[q_idx],
            bb.spin_embedding.weight[s_idx]], dim=-1)
        h = bb.router[0](route_in)
        alpha = torch.softmax(bb.router[1](torch.nn.functional.silu(h)),
                              dim=-1)

        idx, nbr_mask = dense_neighbors_torch(coords, cfg.cutoff,
                                              cfg.max_neighbors)
        vec = coords[idx] - coords[:, None, :]
        dist = torch.sqrt(torch.clamp((vec * vec).sum(-1), min=1e-24))
        dist = torch.where(nbr_mask > 0, dist, torch.ones_like(dist))

        K = idx.shape[1]
        rot = edge_rot_mat_torch(vec + (1.0 - nbr_mask[..., None]))
        Dl = wigner_blocks_torch(rot, cfg.lmax)

        offsets = torch.linspace(0.0, cfg.cutoff, cfg.num_gauss,
                                 dtype=coords.dtype)
        width = cfg.cutoff / (cfg.num_gauss - 1)
        gauss = torch.exp(-0.5 * ((dist[..., None] - offsets) / width) ** 2)
        esrc = bb.source_embedding(z[idx])
        etgt = bb.target_embedding(z)[:, None, :].expand_as(esrc)
        es = torch.cat([esrc, etgt, gauss], dim=-1)
        es = torch.nn.functional.silu(bb.edge_mlp[0](es))
        edge_scalar = bb.edge_mlp[1](es)
        u = torch.clamp(dist / cfg.cutoff, 0.0, 1.0)
        env = ((1.0 - 10.0 * u ** 3 + 15.0 * u ** 4 - 6.0 * u ** 5)
               * nbr_mask)[..., None]

        x = torch.zeros(P, M, C, dtype=coords.dtype)
        x[:, 0, :] = bb.sphere_embedding(z)
        deg = bb.edge_degree_proj(alpha, edge_scalar).reshape(
            P, K, cfg.lmax + 1, C)
        m0, _, _ = _m_indices(cfg.lmax, cfg.mmax)
        deg_coeff = torch.zeros(P, K, M, C, dtype=coords.dtype)
        deg_coeff[..., m0, :] = deg
        deg_back = self._rotate(Dl, deg_coeff, transpose=True)
        x = x + (deg_back * env[..., None]).sum(dim=1) / cfg.avg_degree

        for blk in bb.blocks:
            xn = blk.norm_1(x)
            x_t = xn[:, None].expand(P, K, M, C)
            x_s = xn[idx]
            pair = torch.cat([x_s, x_t], dim=-1)
            pair_rot = self._rotate(Dl, pair)
            msg = blk.so2_conv_1(alpha, pair_rot, edge_scalar)
            if cfg.edge_act == "gate":
                msg = self._gate(blk.gate, alpha, msg)
            else:
                msg = self._s2_act(msg)
            msg = blk.so2_conv_2(alpha, msg, None)
            msg = self._rotate(Dl, msg, transpose=True) * env[..., None]
            x = x + msg.sum(dim=1) / cfg.avg_degree

            xn2 = blk.norm_2(x)
            tg, fg = s2_grid_tables(cfg.lmax, *cfg.grid)
            tg = torch.as_tensor(tg, dtype=coords.dtype)
            fg = torch.as_tensor(fg, dtype=coords.dtype)
            grid = torch.einsum("gm,pmc->pgc", tg, xn2)
            grid = blk.ffn.w1(alpha, grid)
            grid = torch.nn.functional.silu(grid)
            grid = blk.ffn.w2(alpha, grid)
            x = x + torch.einsum("mg,pgc->pmc", fg, grid)

        xn = bb.energy_norm(x)
        s = xn[:, 0, :]
        e = torch.nn.functional.silu(bb.energy_head[0](alpha, s))
        e_atom = bb.energy_head[1](alpha, e)[..., 0]
        return (e_atom + bb.atom_ref[z]).sum()

    def energy_forces(self, numbers, coords_ang, charge=0, spin=1, task=0):
        coords = coords_ang.clone().requires_grad_(True)
        e = self.forward(numbers, coords, charge, spin, task)
        (g,) = torch.autograd.grad(e, coords)
        return e.detach(), -g
