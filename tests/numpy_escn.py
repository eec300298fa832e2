"""Independent numpy re-execution of the eSCN-MoE forward pass.

This is the INDEPENDENT golden-fixture generator demanded by the round-2
verdict: it never imports ``pdb2reaction_tpu.mlip`` (or torch_escn.py) and
re-derives every hard numeric ingredient by a DIFFERENT algorithm:

- real spherical harmonics from scipy's complex ``sph_harm_y`` via the
  standard real combination (so3.py builds them from explicit Cartesian
  polynomials / recursions);
- Wigner rotation matrices by LEAST-SQUARES FITTING ``Y(R r) = D Y(r)``
  over random sample directions (so3.py uses the Ivanic-Ruedenberg
  recursion);
- S2 grid tables from the same published grid definitions (midpoint
  Driscoll-Healy for the edge activation, Gauss-Legendre for the node
  FFN) but computed here from scipy/np.polynomial primitives.

It consumes a fairchem-style NAMED state dict directly (the converter's
input format), so a golden produced here pins both the architecture
semantics and the name map. Forces come from central finite differences of
this energy (float64, eps 1e-4 A) — no autodiff framework involved.

Architecture spec being executed (same spec as mlip/escn.py, fairchem
UMA-class): see docs/fairchem_name_map.md for the audit of the state-dict
naming against fairchem's published UMA module source.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from scipy.special import sph_harm_y


# ---------------------------------------------------------------------------
# real spherical harmonics (scipy complex -> standard real combination)
# ---------------------------------------------------------------------------

def real_sph_harm_np(lmax: int, xyz: np.ndarray) -> np.ndarray:
    """[N, (lmax+1)^2] real SH at unit vectors, flat index l(l+1)+m.

    Convention: m=0: Y_l^0; m>0: sqrt(2) (-1)^m Re Y_l^m;
    m<0: sqrt(2) (-1)^m Im Y_l^|m| (the standard real form)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    theta = np.arccos(np.clip(z, -1.0, 1.0))
    phi = np.arctan2(y, x)
    out = np.zeros(xyz.shape[:-1] + ((lmax + 1) ** 2,))
    for l in range(lmax + 1):  # noqa: E741
        for m in range(0, l + 1):
            Y = sph_harm_y(l, m, theta, phi)          # complex Y_l^m
            if m == 0:
                out[..., l * (l + 1)] = Y.real
            else:
                s = math.sqrt(2.0) * (-1.0) ** m
                out[..., l * (l + 1) + m] = s * Y.real
                out[..., l * (l + 1) - m] = s * Y.imag
    return out


def wigner_fit(R: np.ndarray, lmax: int, rng=None) -> np.ndarray:
    """Real-SH rotation matrix D with Y(R r) = D Y(r), by least squares.

    Completely independent of the Ivanic-Ruedenberg recursion: sample
    enough random directions, evaluate both sides, solve. Exact to
    lstsq/float64 precision (~1e-12)."""
    if rng is None:
        rng = np.random.default_rng(1234)
    M = (lmax + 1) ** 2
    n = 4 * M
    r = rng.normal(size=(n, 3))
    r /= np.linalg.norm(r, axis=1, keepdims=True)
    Y = real_sph_harm_np(lmax, r)                      # [n, M]
    Yr = real_sph_harm_np(lmax, r @ R.T)               # [n, M]
    # solve Y D^T = Yr; keep only the exactly-block-diagonal part (the
    # off-blocks are lstsq noise at ~1e-14)
    D_T, *_ = np.linalg.lstsq(Y, Yr, rcond=None)
    D = D_T.T
    Dc = np.zeros_like(D)
    for l in range(lmax + 1):  # noqa: E741
        i0, i1 = l * l, (l + 1) ** 2
        Dc[i0:i1, i0:i1] = D[i0:i1, i0:i1]
    return Dc


# ---------------------------------------------------------------------------
# S2 grids
# ---------------------------------------------------------------------------

def grid_tables_gauss(lmax: int, n_theta: int, n_phi: int):
    ct, wt = np.polynomial.legendre.leggauss(n_theta)
    theta = np.arccos(ct)
    return _tables(lmax, theta, np.repeat(wt, n_phi), n_phi)


def grid_tables_midpoint(lmax: int, n_theta: int, n_phi: int):
    j = np.arange(n_theta)
    theta = np.pi * (2 * j + 1) / (2.0 * n_theta)
    b = n_theta // 2
    k = np.arange(b)
    w = np.array([(2.0 / b) * np.sin(t)
                  * np.sum(np.sin((2 * k + 1) * t) / (2 * k + 1))
                  for t in theta])
    return _tables(lmax, theta, np.repeat(w, n_phi), n_phi)


def _tables(lmax, theta, w_rep, n_phi):
    phi = np.arange(n_phi) * (2.0 * np.pi / n_phi)
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    xyz = np.stack([np.sin(tt) * np.cos(pp),
                    np.sin(tt) * np.sin(pp),
                    np.cos(tt)], axis=-1).reshape(-1, 3)
    Y = real_sph_harm_np(lmax, xyz)
    wq = w_rep * (2.0 * np.pi / n_phi)
    return Y, (Y * wq[:, None]).T


# ---------------------------------------------------------------------------
# the forward pass
# ---------------------------------------------------------------------------

@dataclass
class NpConfig:
    lmax: int
    mmax: int
    sphere_channels: int
    hidden_channels: int
    edge_channels: int
    ffn_hidden: int
    num_layers: int
    num_experts: int
    route_dim: int
    num_gauss: int
    cutoff: float
    max_neighbors: int
    max_z: int
    charge_range: int
    spin_range: int
    num_tasks: int
    avg_degree: float
    grid_ntheta: int = 0
    grid_nphi: int = 0

    @property
    def grid(self):
        nt = self.grid_ntheta or 4 * (self.lmax + 1)
        np_ = self.grid_nphi or 4 * self.lmax + 7
        return nt, np_


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _m_idx(lmax, mmax):
    m0 = np.array([l * (l + 1) for l in range(lmax + 1)])
    pos = [np.array([l * (l + 1) + m for l in range(m, lmax + 1)])
           for m in range(1, mmax + 1)]
    neg = [np.array([l * (l + 1) - m for l in range(m, lmax + 1)])
           for m in range(1, mmax + 1)]
    return m0, pos, neg


def _used(lmax, mmax):
    m0, pos, neg = _m_idx(lmax, mmax)
    parts = [m0]
    for m in range(1, mmax + 1):
        parts += [pos[m - 1], neg[m - 1]]
    return np.concatenate(parts)


class NpESCN:
    """Forward pass straight off a fairchem-style named state dict."""

    def __init__(self, sd: dict, cfg: NpConfig):
        self.sd = {k: np.asarray(v, np.float64) for k, v in sd.items()}
        self.cfg = cfg

    # -- parameter access (the NAME MAP under test) -------------------------
    def _w(self, key):
        return self.sd[f"backbone.{key}"]

    def _mole(self, key, alpha, x):
        W = np.einsum("e,eoi->oi", alpha, self._w(f"{key}.weight"))
        b = np.einsum("e,eo->o", alpha, self._w(f"{key}.bias"))
        return x @ W.T + b

    def _lin(self, key, x):
        return x @ self._w(f"{key}.weight").T + self._w(f"{key}.bias")

    def _so2(self, key, alpha, x_rot, edge_scalar, c_in, c_out):
        cfg = self.cfg
        m0, pos, neg = _m_idx(cfg.lmax, cfg.mmax)
        batch = x_rot.shape[:-2]
        nl0 = cfg.lmax + 1
        x0 = x_rot[..., m0, :].reshape(batch + (nl0 * c_in,))
        if edge_scalar is not None:
            x0 = np.concatenate([x0, edge_scalar], axis=-1)
        y0 = self._mole(f"{key}.fc_m0", alpha, x0).reshape(
            batch + (nl0, c_out))
        M = (cfg.lmax + 1) ** 2
        out = np.zeros(batch + (M, c_out))
        out[..., m0, :] = y0
        for m in range(1, cfg.mmax + 1):
            nl = cfg.lmax + 1 - m
            xp = x_rot[..., pos[m - 1], :].reshape(batch + (nl * c_in,))
            xn = x_rot[..., neg[m - 1], :].reshape(batch + (nl * c_in,))
            yp = self._mole(f"{key}.fc_m{m}_r", alpha, xp) \
                - self._mole(f"{key}.fc_m{m}_i", alpha, xn)
            yn = self._mole(f"{key}.fc_m{m}_i", alpha, xp) \
                + self._mole(f"{key}.fc_m{m}_r", alpha, xn)
            out[..., pos[m - 1], :] = yp.reshape(batch + (nl, c_out))
            out[..., neg[m - 1], :] = yn.reshape(batch + (nl, c_out))
        return out

    def _norm(self, key, x, eps=1e-6):
        g = self._w(f"{key}.weight")
        outs = []
        for l in range(self.cfg.lmax + 1):  # noqa: E741
            i0 = l * l
            blk = x[..., i0:i0 + 2 * l + 1, :]
            rms = np.sqrt((blk ** 2).mean(axis=(-2, -1), keepdims=True)
                          + eps)
            outs.append(blk / rms * g[l])
        return np.concatenate(outs, axis=-2)

    def _s2_act(self, x):
        cfg = self.cfg
        tg, fg = grid_tables_midpoint(cfg.lmax, 2 * (cfg.lmax + 1),
                                      2 * cfg.mmax + 1)
        used = _used(cfg.lmax, cfg.mmax)
        tg = tg[:, used]
        fg = fg[used, :]
        x_u = x[..., used, :]
        s = x_u[..., 0, :]
        grid = np.einsum("gu,...uc->...gc", tg, x_u)
        back = np.einsum("ug,...gc->...uc", fg, _silu(grid))
        back[..., 0, :] = _silu(s)
        out = np.zeros_like(x)
        out[..., used, :] = back
        return out

    # -- forward ------------------------------------------------------------
    def energy(self, numbers, coords_ang, charge=0, spin=1, task=0):
        cfg = self.cfg
        P = len(numbers)
        C = cfg.sphere_channels
        M = (cfg.lmax + 1) ** 2
        z = np.clip(numbers, 0, cfg.max_z)

        q_idx = int(np.clip(charge + cfg.charge_range, 0,
                            2 * cfg.charge_range))
        s_idx = int(np.clip(spin, 0, cfg.spin_range))
        t_idx = int(np.clip(task, 0, cfg.num_tasks - 1))
        route_in = np.concatenate([
            self._w("task_embedding.weight")[t_idx],
            self._w("charge_embedding.weight")[q_idx],
            self._w("spin_embedding.weight")[s_idx]])
        h = _silu(self._lin("router.0", route_in))
        logits = self._lin("router.1", h)
        alpha = np.exp(logits - logits.max())
        alpha /= alpha.sum()

        # nearest-K within cutoff
        d = np.linalg.norm(coords_ang[:, None] - coords_ang[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        d = np.where(d <= cfg.cutoff, d, np.inf)
        K = min(cfg.max_neighbors, P)
        idx = np.argsort(d, axis=1)[:, :K]
        dist = np.take_along_axis(d, idx, axis=1)
        mask = np.isfinite(dist).astype(float)
        idx = np.where(mask > 0, idx, 0)
        dist = np.where(mask > 0, dist, 1.0)

        vec = coords_ang[idx] - coords_ang[:, None]
        vec = vec + (1.0 - mask[..., None])
        dhat = vec / np.linalg.norm(vec, axis=-1, keepdims=True)
        # edge frame: helper = one-hot(argmin |d|), a = cross(d, helper)
        helper = np.eye(3)[np.argmin(np.abs(dhat), axis=-1)]
        a = np.cross(dhat, helper)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        R = np.stack([a, np.cross(dhat, a), dhat], axis=-2)  # [P,K,3,3]

        D = np.zeros((P, K, M, M))
        for i in range(P):
            for k in range(K):
                D[i, k] = wigner_fit(R[i, k], cfg.lmax)

        offsets = np.linspace(0.0, cfg.cutoff, cfg.num_gauss)
        width = cfg.cutoff / (cfg.num_gauss - 1)
        gauss = np.exp(-0.5 * ((dist[..., None] - offsets) / width) ** 2)
        esrc = self._w("source_embedding.weight")[z[idx]]
        etgt = np.broadcast_to(self._w("target_embedding.weight")[z][:, None, :],
                               esrc.shape)
        es = _silu(self._lin("edge_mlp.0",
                             np.concatenate([esrc, etgt, gauss], -1)))
        edge_scalar = self._lin("edge_mlp.1", es)
        u = np.clip(dist / cfg.cutoff, 0.0, 1.0)
        env = ((1.0 - 10.0 * u**3 + 15.0 * u**4 - 6.0 * u**5)
               * mask)[..., None]

        x = np.zeros((P, M, C))
        x[:, 0, :] = self._w("sphere_embedding.weight")[z]
        deg = self._mole("edge_degree_proj", alpha, edge_scalar).reshape(
            P, K, cfg.lmax + 1, C)
        m0, _, _ = _m_idx(cfg.lmax, cfg.mmax)
        deg_coeff = np.zeros((P, K, M, C))
        deg_coeff[..., m0, :] = deg
        deg_back = np.einsum("pknm,pknc->pkmc", D, deg_coeff)
        x = x + (deg_back * env[..., None]).sum(axis=1) / cfg.avg_degree

        for i in range(cfg.num_layers):
            b = f"blocks.{i}"
            xn = self._norm(f"{b}.norm_1", x)
            x_t = np.broadcast_to(xn[:, None], (P, K, M, C))
            x_s = xn[idx]
            pair = np.concatenate([x_s, x_t], axis=-1)
            pair_rot = np.einsum("pkmn,pknc->pkmc", D, pair)
            msg = self._so2(f"{b}.so2_conv_1", alpha, pair_rot,
                            edge_scalar, 2 * C, cfg.hidden_channels)
            msg = self._s2_act(msg)
            msg = self._so2(f"{b}.so2_conv_2", alpha, msg, None,
                            cfg.hidden_channels, C)
            msg = np.einsum("pknm,pknc->pkmc", D, msg) * env[..., None]
            x = x + msg.sum(axis=1) / cfg.avg_degree

            xn2 = self._norm(f"{b}.norm_2", x)
            tg, fg = grid_tables_gauss(cfg.lmax, *cfg.grid)
            grid = np.einsum("gm,pmc->pgc", tg, xn2)
            grid = self._mole(f"{b}.ffn.w1", alpha, grid)
            grid = _silu(grid)
            grid = self._mole(f"{b}.ffn.w2", alpha, grid)
            x = x + np.einsum("mg,pgc->pmc", fg, grid)

        xn = self._norm("energy_norm", x)
        s = xn[:, 0, :]
        e = _silu(self._mole("energy_head.0", alpha, s))
        e_atom = self._mole("energy_head.1", alpha, e)[..., 0]
        return float((e_atom + self._w("atom_ref")[z]).sum())

    def forces_fd(self, numbers, coords_ang, eps=1e-4, **kw):
        """Central finite differences — no autodiff framework anywhere."""
        n = len(numbers)
        f = np.zeros((n, 3))
        for i in range(n):
            for c in range(3):
                cp = coords_ang.copy()
                cp[i, c] += eps
                ep = self.energy(numbers, cp, **kw)
                cp[i, c] -= 2 * eps
                em = self.energy(numbers, cp, **kw)
                f[i, c] = -(ep - em) / (2 * eps)
        return f
