"""Column-packed MXU particle<->grid transfer (the fast P2G/G2P path).

Motivation (measured on TPU v5e): XLA's scatter-add executes row-serially
(~60 ns/row), so the naive 27-tap P2G of 100k particles costs ~150 ms —
35x the whole substep budget.  This module reformulates both transfers as
dense batched matmuls on the MXU:

1. Particles are binned by their (x, y) base-cell COLUMN and packed into a
   (G*G, K) slot table (sorted once, built with gathers — no scatter).
2. The z-axis becomes the 128-wide TPU lane dimension: for every packed
   particle three z-basis rows are built over all Gz cells —
   Z0 = w(z), Z1 = (z offset - fz) * w(z), Z2 = w'(z) — so any per-tap
   contribution becomes  coeff(shift) . Z_basis(z).
3. P2G  = einsum("gmz,gmn->gzn") over m = K*3 slots-x-basis and
   n = 9 shifts x 4 channels, followed by 9 static shifted adds.
   G2P  = the transposed batched matmul against the shifted grid.

Everything is static-shape, scatter-free and differentiable.  Capacity K
bounds particles per column; overflow particles (slot >= K) are dropped
with a debug count (raise K for denser scenes).

Matches core.stepping.p2g / g2p semantics exactly (same B-spline,
APIC/RPIC, force terms); verified by tests/test_column_transfer.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.types import MPMModel, MPMState, MPMStaticConfig


class ColumnBins(NamedTuple):
    pid: jnp.ndarray       # (G2, K) particle index (sentinel = P)
    valid: jnp.ndarray     # (G2, K) bool
    col_of_p: jnp.ndarray  # (P,) column of each particle
    rank_of_p: jnp.ndarray  # (P,) slot of each particle (may be >= K)
    overflow: jnp.ndarray  # () int32: particles dropped


def build_bins(x: jnp.ndarray, cfg: MPMStaticConfig, K: int) -> ColumnBins:
    """Sort-and-pack particles by (x, y) base-cell column."""
    G = cfg.n_grid
    P = x.shape[0]
    base = jnp.floor(x * cfg.inv_dx - 0.5).astype(jnp.int32)
    col = jnp.clip(base[:, 0], 0, G - 1) * G + jnp.clip(base[:, 1], 0,
                                                        G - 1)
    perm = jnp.argsort(col)
    sorted_col = col[perm]
    # first sorted position of each column
    start = jnp.searchsorted(sorted_col, jnp.arange(G * G))
    rank_sorted = jnp.arange(P) - start[sorted_col]
    # counts via start differences (scatter-free)
    start_ext = jnp.concatenate([start, jnp.asarray([P])])
    count = (start_ext[1:] - start_ext[:-1]).astype(jnp.int32)

    slots = jnp.arange(K)
    idx = start[:, None] + slots[None, :]
    valid = slots[None, :] < jnp.minimum(count, K)[:, None]
    pid = jnp.where(valid, perm[jnp.clip(idx, 0, P - 1)], P)

    rank_of_p = jnp.zeros((P,), jnp.int32).at[perm].set(rank_sorted)
    overflow = jnp.sum((rank_of_p >= K).astype(jnp.int32))
    return ColumnBins(pid=pid, valid=valid, col_of_p=col,
                      rank_of_p=rank_of_p, overflow=overflow)


def _packed_gather(arr, pid, fill=0.0):
    """Gather per-particle array into (G2, K, ...) with sentinel fill."""
    padded = jnp.concatenate(
        [arr, jnp.full((1,) + arr.shape[1:], fill, arr.dtype)], 0)
    return padded[pid]


def _z_bases(px_z, base_z, cfg, Gz):
    """Three z-basis tensors (G2, K, 3, Gz).

    Z0[.., z] = wz(z), Z1 = dpos_z_unitless(z) * wz(z), Z2 = dwz(z)*inv_dx
    where dpos_z_unitless = (z - base_z) - fz (g2p convention; p2g's dx
    factor is applied by the caller)."""
    inv_dx = cfg.inv_dx
    gz = px_z * inv_dx
    fz = gz - base_z.astype(px_z.dtype)
    wa = 1.5 - fz
    wb = fz - 1.0
    wc = fz - 0.5
    wz = jnp.stack([0.5 * wa * wa, 0.75 - wb * wb, 0.5 * wc * wc], -1)
    dwz = jnp.stack([fz - 1.5, -2.0 * (fz - 1.0), fz - 0.5], -1) * inv_dx

    zline = jnp.arange(Gz, dtype=jnp.int32)
    z0 = jnp.zeros(px_z.shape + (Gz,), px_z.dtype)
    z1 = jnp.zeros_like(z0)
    z2 = jnp.zeros_like(z0)
    for o in range(3):
        hit = (zline[None, None, :] == (base_z + o)[..., None])
        hitf = hit.astype(px_z.dtype)
        z0 = z0 + hitf * wz[..., o, None]
        z1 = z1 + hitf * ((float(o) - fz) * wz[..., o])[..., None]
        z2 = z2 + hitf * dwz[..., o, None]
    return jnp.stack([z0, z1, z2], axis=-2)  # (G2, K, 3, Gz)


_SHIFTS = [(i, j) for i in range(3) for j in range(3)]


def _xy_weights(px_xy, base_xy, cfg):
    """Per-shift in-plane weights and derivative weights.

    Returns (wxy (G2,K,9), dwx_wy (G2,K,9), wx_dwy (G2,K,9),
    dpos_x (G2,K,9), dpos_y (G2,K,9)) — dpos unitless (offset - fx)."""
    inv_dx = cfg.inv_dx
    g = px_xy * inv_dx
    f = g - base_xy.astype(px_xy.dtype)
    wa = 1.5 - f
    wb = f - 1.0
    wc = f - 0.5
    w = jnp.stack([0.5 * wa * wa, 0.75 - wb * wb, 0.5 * wc * wc], -1)
    dw = jnp.stack([f - 1.5, -2.0 * (f - 1.0), f - 0.5], -1) * inv_dx

    outs = []
    for (i, j) in _SHIFTS:
        wxy = w[..., 0, i] * w[..., 1, j]
        dxwy = dw[..., 0, i] * w[..., 1, j]
        wxdy = w[..., 0, i] * dw[..., 1, j]
        dpx = float(i) - f[..., 0]
        dpy = float(j) - f[..., 1]
        outs.append((wxy, dxwy, wxdy, dpx, dpy))
    stack = lambda n: jnp.stack([o[n] for o in outs], -1)
    return stack(0), stack(1), stack(2), stack(3), stack(4)


@partial(jax.jit, static_argnums=(0, 4))
def p2g_columns(cfg: MPMStaticConfig, state: MPMState, stress, vertex_force,
                K: int, bins: ColumnBins = None, c_eff=None):
    """Column-packed P2G; exact replacement for stepping.p2g.

    ``stress`` and ``vertex_force`` must be pre-scaled by dt*selection;
    ``c_eff`` is the RPIC-damped affine field (defaults to state.C).
    Returns (grid_v_in (G^3, 3), grid_m (G^3,))."""
    E, T, V = cfg.n_elements, cfg.n_traditional, cfg.n_vertices
    P = cfg.n_particles
    G = cfg.n_grid
    dx = cfg.dx
    dtype = state.x.dtype
    if bins is None:
        bins = build_bins(state.x, cfg, K)
    pid, valid = bins.pid, bins.valid

    # per-particle effective quantities (same as stepping.p2g)
    stress_eff = jnp.zeros((P, 3, 3), dtype)
    if E > 0:
        stress_eff = stress_eff.at[:E].set(stress[:E])
    if T > 0:
        stress_eff = stress_eff.at[E:E + T].set(
            state.vol[E:E + T, None, None] * stress[E:E + T])
    vforce = jnp.zeros((P, 3), dtype)
    if V > 0:
        vforce = vforce.at[E + T:].set(vertex_force)
    is_vertex = jnp.zeros((P,), dtype).at[E + T:].set(1.0)

    sel = (state.selection == 0).astype(dtype)
    mass = state.mass * sel

    # pack
    px = _packed_gather(state.x, pid)              # (G2, K, 3)
    pv = _packed_gather(state.v, pid)
    pC = _packed_gather(state.C if c_eff is None else c_eff, pid)
    pmass = _packed_gather(mass, pid) * valid
    psel = _packed_gather(sel, pid) * valid
    pstress = _packed_gather(stress_eff, pid)
    pvf = _packed_gather(vforce, pid)
    pisv = _packed_gather(is_vertex, pid)

    base = jnp.floor(px * cfg.inv_dx - 0.5).astype(jnp.int32)
    zb = _z_bases(px[..., 2], base[..., 2], cfg, G)      # (G2,K,3,Gz)
    wxy, dxwy, wxdy, dpx, dpy = _xy_weights(px[..., :2], base[..., :2], cfg)

    # coefficients: for shift s, channel c (3 momentum + 1 mass):
    #   alpha (Z0): wxy * [ m v_c + m (C_cx dpx + C_cy dpy) dx
    #                       + dt_force_xy-part ]  (dt folded by caller)
    # assembled below without dt (forces carry dt at call site)
    # NOTE: stepping.p2g scatters  mass_w * momentum + dt * force;
    # we take dt as an argument via the stress/vforce pre-scaling done in
    # p2g2p_fast, so here force terms are already dt-scaled.
    mC = pmass[..., None, None] * pC                     # (G2,K,3,3)
    mv = pmass[..., None] * pv                           # (G2,K,3)

    S = 9
    # alpha: (G2,K,S,4)
    apic_xy = (mC[..., :, 0, None] * dpx[..., None, :]
               + mC[..., :, 1, None] * dpy[..., None, :]) * dx  # (G2,K,3,S)
    mom_alpha = (mv[..., :, None] + apic_xy) * wxy[..., None, :]
    # force: vertex -> w * vf (pure Z0); stress -> -(sigma @ dweight):
    # the sigma_x / sigma_y parts multiply Z0, the sigma_z part Z2.
    f_vert = (pisv[..., None, None] * pvf[..., :, None]
              * wxy[..., None, :])
    not_v = (1.0 - pisv)
    f_alpha = f_vert - (pstress[..., :, 0, None] * dxwy[..., None, :]
                        + pstress[..., :, 1, None] * wxdy[..., None, :]) \
        * not_v[..., None, None]
    alpha_mom = mom_alpha + f_alpha                      # (G2,K,3,S)
    alpha_mass = pmass[..., None] * wxy                  # (G2,K,S)
    alpha = jnp.concatenate([alpha_mom,
                             alpha_mass[..., None, :]], axis=-2)  # (..,4,S)

    # beta (Z1): APIC z-term  m*C_cz * dpos_z_unitless * dx * w
    beta_mom = mC[..., :, 2, None] * dx * wxy[..., None, :]
    beta = jnp.concatenate([beta_mom,
                            jnp.zeros_like(alpha_mass)[..., None, :]],
                           axis=-2)

    # gamma (Z2): stress z-derivative term  -sigma_cz * wx*wy * dwz
    gamma_mom = -pstress[..., :, 2, None] * wxy[..., None, :] \
        * not_v[..., None, None]
    gamma = jnp.concatenate([gamma_mom,
                             jnp.zeros_like(alpha_mass)[..., None, :]],
                            axis=-2)

    # selection masking (stress/force already include sel via mass? no:
    # forces must vanish for masked particles too)
    m3 = (psel)[..., None, None]
    alpha = alpha * m3
    beta = beta * m3
    gamma = gamma * m3

    # coeff (G2, K, 3basis, 4, S) -> (G2, K*3, 4*S)
    coeff = jnp.stack([alpha, beta, gamma], axis=2)
    G2 = G * G
    coeff = coeff.transpose(0, 1, 2, 3, 4).reshape(G2, K * 3, 4 * S)
    zmat = zb.reshape(G2, K * 3, G)

    out = jnp.einsum("gmz,gmn->gzn", zmat, coeff)        # (G2, Gz, 36)
    out = out.reshape(G, G, G, 4, S)

    # 9 static shifted adds: shift (i, j) targets (x + i, y + j) from
    # base-relative tap, with base offset 0..2 -> pad and slice
    acc = jnp.zeros((G + 2, G + 2, G, 4), dtype)
    for s, (i, j) in enumerate(_SHIFTS):
        acc = acc.at[i:i + G, j:j + G].add(out[..., s])
    full = acc[:G, :G]          # taps beyond G-1 dropped (mode-drop parity)

    grid_v_in = full[..., :3].reshape(-1, 3)
    grid_m = full[..., 3].reshape(-1)
    return grid_v_in, grid_m


@partial(jax.jit, static_argnums=(0, 3))
def g2p_columns(cfg: MPMStaticConfig, state: MPMState, grid_v_out, K: int,
                bins: ColumnBins = None):
    """Column-packed G2P gather; exact replacement for the gather stage of
    stepping.g2p.  Returns per-particle (new_v (P,3), new_C (P,3,3),
    grad_v (P,3,3)) in ORIGINAL particle order."""
    G = cfg.n_grid
    P = cfg.n_particles
    dtype = state.x.dtype
    if bins is None:
        bins = build_bins(state.x, cfg, K)
    pid, valid = bins.pid, bins.valid

    px = _packed_gather(state.x, pid)
    base = jnp.floor(px * cfg.inv_dx - 0.5).astype(jnp.int32)
    zb = _z_bases(px[..., 2], base[..., 2], cfg, G)      # (G2,K,3,Gz)
    wxy, dxwy, wxdy, dpx, dpy = _xy_weights(px[..., :2], base[..., :2], cfg)

    grid = grid_v_out.reshape(G, G, G, 3)
    pad = jnp.pad(grid, ((0, 2), (0, 2), (0, 0), (0, 0)))
    G2 = G * G
    zmat = zb.reshape(G2, K * 3, G)

    v_acc = jnp.zeros(px.shape, dtype)                   # (G2,K,3)
    c_acc = jnp.zeros(px.shape[:2] + (3, 3), dtype)
    gv_acc = jnp.zeros(px.shape[:2] + (3, 3), dtype)
    inv_dx = cfg.inv_dx

    for s, (i, j) in enumerate(_SHIFTS):
        g_s = pad[i:i + G, j:j + G].reshape(G2, G, 3)    # (G2, Gz, 3)
        # (G2, K*3, 3) = zmat @ g_s
        acc = jnp.einsum("gmz,gzc->gmc", zmat, g_s)
        acc = acc.reshape(G2, -1, 3, 3)                   # (G2,K,basis,3)
        v0 = acc[..., 0, :]   # sum_z w(z) * g
        v1 = acc[..., 1, :]   # sum_z dposz*w(z) * g
        v2 = acc[..., 2, :]   # sum_z dw(z) * g

        wxy_s = wxy[..., s, None]
        v_acc = v_acc + wxy_s * v0
        # C += 4*inv_dx * w * outer(g, dpos);  dpos = (dpx, dpy, dposz)
        dxy = jnp.stack([dpx[..., s], dpy[..., s]], -1)  # (G2,K,2)
        c_xy = wxy_s[..., None] * v0[..., :, None] * dxy[..., None, :]
        c_z = wxy_s[..., None] * v1[..., :, None]
        c_acc = c_acc + 4.0 * inv_dx * jnp.concatenate([c_xy, c_z], -1)

        # grad_v += outer(g, dweight): dweight = (dwx*wy*wz, wx*dwy*wz,
        #                                         wx*wy*dwz)
        gx = dxwy[..., s, None] * v0
        gy = wxdy[..., s, None] * v0
        gz = wxy_s * v2
        gv_acc = gv_acc + jnp.stack([gx, gy, gz], -1)

    # unpack to original particle order
    col = bins.col_of_p
    rank = jnp.clip(bins.rank_of_p, 0, K - 1)
    in_table = (bins.rank_of_p < K)

    def unpack(packed):
        vals = packed[col, rank]
        return jnp.where(in_table.reshape((P,) + (1,) * (vals.ndim - 1)),
                         vals, 0.0)

    return unpack(v_acc), unpack(c_acc), unpack(gv_acc)


@partial(jax.jit, static_argnums=(0, 3))
def splat_columns(cfg: MPMStaticConfig, points, values, K: int,
                  bounds_check: bool = True):
    """Generic w-weighted splat: scatter-free replacement for
    core.stepping.rasterize_to_grid (used by the mesh collider and the
    particle mover).  Returns (grid_vals (G^3, C), grid_w (G^3,)).

    Applies the reference's bounds check base in [0, G-3)
    (mpm_solver.py:692,858)."""
    G = cfg.n_grid
    C = values.shape[-1]
    bins = build_bins(points, cfg, K)
    pid, valid = bins.pid, bins.valid

    pp = _packed_gather(points, pid)
    pvals = _packed_gather(values, pid)
    base = jnp.floor(pp * cfg.inv_dx - 0.5).astype(jnp.int32)
    ok = valid.astype(pp.dtype)
    if bounds_check:
        inb = jnp.all((base >= 0) & (base < G - 3), axis=-1)
        ok = ok * inb.astype(pp.dtype)

    zb = _z_bases(pp[..., 2], base[..., 2], cfg, G)   # (G2,K,3,Gz)
    z0 = zb[..., 0, :]                                # (G2,K,Gz)
    wxy, _, _, _, _ = _xy_weights(pp[..., :2], base[..., :2], cfg)

    # coeff (G2, K, S, C+1): per shift, value channels + unit weight
    vals1 = jnp.concatenate(
        [pvals, jnp.ones(pvals.shape[:-1] + (1,), pvals.dtype)], -1)
    coeff = (wxy * ok[..., None])[..., :, None] * vals1[..., None, :]
    G2 = G * G
    S = 9
    coeff = coeff.reshape(G2, -1, S * (C + 1))
    out = jnp.einsum("gmz,gmn->gzn", z0.reshape(G2, -1, G), coeff)
    out = out.reshape(G, G, G, S, C + 1)

    acc = jnp.zeros((G + 2, G + 2, G, C + 1), points.dtype)
    for s, (i, j) in enumerate(_SHIFTS):
        acc = acc.at[i:i + G, j:j + G].add(out[..., s, :])
    full = acc[:G, :G]
    return full[..., :C].reshape(-1, C), full[..., C].reshape(-1)


def build_vertex_incidence(faces, n_vertices: int):
    """Host-side (V, R) table of incident (element*3 + corner) slots per
    vertex; sentinel = 3*E (maps to a zero row).  Replaces the vertex-force
    scatter in compute_stress with a bounded gather."""
    import numpy as np
    faces = np.asarray(faces)
    lists = [[] for _ in range(n_vertices)]
    for e in range(len(faces)):
        a, b, c = faces[e]
        lists[a].append(3 * e + 0)
        lists[b].append(3 * e + 1)
        lists[c].append(3 * e + 2)
    r = max((len(l) for l in lists), default=1)
    out = np.full((n_vertices, r), 3 * len(faces), np.int32)
    for v, l in enumerate(lists):
        out[v, :len(l)] = l
    return out
