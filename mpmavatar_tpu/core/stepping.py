"""The MPM substep as one pure, jit-able, differentiable function.

TPU-native rewrite of ``MPMWARP.p2g2p`` (/root/reference/warp_mpm/
mpm_solver.py:229-536) and its kernels (/root/reference/warp_mpm/
mpm_utils.py): per-thread atomic scatter/gather becomes batched
27-stencil scatter-add / gather over a flattened dense grid; per-particle
branches become masked vector arithmetic.  Everything is static-shape, so
the full substep fuses into a single XLA program and differentiates with
``jax.grad`` (superseding both the reference's finite-difference loop and
its dormant Warp tape).

Substep phase order preserved exactly:
  stress -> P2G -> grid normalize+gravity(+damping) -> mesh colliders ->
  particle mover -> grid BCs -> G2P(vertices/traditional) -> G2P(elements).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from . import constitutive
from .colliders import (STICKY, SLIP, CUT, BoundingBoxCollider, ColliderSet,
                        CuboidCollider, GridMaskCollider, MeshCollider,
                        SurfaceCollider)
from .types import MPMModel, MPMState, MPMStaticConfig

_I3 = jnp.eye(3, dtype=jnp.float32)

# 27-stencil offsets, fixed ordering (i, j, k) row-major like the
# reference's triple loop (mpm_utils.py:516-518).
_OFFSETS = jnp.asarray(
    [[i, j, k] for i in range(3) for j in range(3) for k in range(3)],
    dtype=jnp.float32,
)
_OFFSETS_I = _OFFSETS.astype(jnp.int32)


def bspline(x: jnp.ndarray, inv_dx: float):
    """Quadratic B-spline stencil data for positions ``x`` (N, 3).

    Returns (base (N,3) int32, fx (N,3), w (N,3,3), dw (N,3,3)) where
    w[:, o, a] is the offset-``o`` weight along axis ``a``
    (mpm_utils.py:499-514).
    """
    grid_pos = x * inv_dx
    base = jnp.floor(grid_pos - 0.5).astype(jnp.int32)
    fx = grid_pos - base.astype(x.dtype)
    wa = 1.5 - fx
    wb = fx - 1.0
    wc = fx - 0.5
    w = jnp.stack([0.5 * wa * wa, 0.75 - wb * wb, 0.5 * wc * wc], axis=-2)
    dw = jnp.stack([fx - 1.5, -2.0 * (fx - 1.0), fx - 0.5], axis=-2)
    return base, fx, w, dw


def _stencil_products(w: jnp.ndarray) -> jnp.ndarray:
    """weight(i,j,k) = w[:,i,0] * w[:,j,1] * w[:,k,2] flattened to (N, 27)."""
    wx = w[:, :, 0]
    wy = w[:, :, 1]
    wz = w[:, :, 2]
    return (wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]
            ).reshape(w.shape[0], 27)


def _dweight27(w: jnp.ndarray, dw: jnp.ndarray, inv_dx: float) -> jnp.ndarray:
    """Gradient-of-weight vectors (N, 27, 3) (mpm_utils.py:420-429)."""
    wx, wy, wz = w[:, :, 0], w[:, :, 1], w[:, :, 2]
    dwx, dwy, dwz = dw[:, :, 0], dw[:, :, 1], dw[:, :, 2]
    gx = dwx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]
    gy = wx[:, :, None, None] * dwy[:, None, :, None] * wz[:, None, None, :]
    gz = wx[:, :, None, None] * wy[:, None, :, None] * dwz[:, None, None, :]
    n = w.shape[0]
    return jnp.stack([gx.reshape(n, 27), gy.reshape(n, 27), gz.reshape(n, 27)],
                     axis=-1) * inv_dx


def _flat_indices(base: jnp.ndarray, n_grid: int) -> jnp.ndarray:
    """(N,3) int32 base -> (N,27) flattened grid indices."""
    idx = base[:, None, :] + _OFFSETS_I[None, :, :]
    return (idx[..., 0] * n_grid + idx[..., 1]) * n_grid + idx[..., 2]


def _scatter_grid(vel_src, wt_src, gidx, n_cells):
    """Scatter-add (N,27,C) value rows and (N,27) weight-like values.

    One (C+1)-channel scatter instead of two: XLA scatter cost is
    row-serial, so halving the passes halves the cost."""
    flat = gidx.reshape(-1)
    c = vel_src.shape[-1]
    src = jnp.concatenate([vel_src, wt_src[..., None]], -1)
    grid = jnp.zeros((n_cells, c + 1), vel_src.dtype).at[flat].add(
        src.reshape(-1, c + 1), mode="drop")
    return grid[:, :c], grid[:, c]


def compute_stress(cfg: MPMStaticConfig, state: MPMState, model: MPMModel,
                   dt, vf_incidence=None, pallas: bool = False):
    """Return-map + stress for all non-vertex particles.

    Port of compute_stress_from_F_trial (mpm_utils.py:1017-1105).  Returns
    (new_d (E,3,3), new_F (T,3,3), new_yield_stress (P,),
    stress (E+T,3,3), vertex_force (V,3)).

    ``pallas=True`` runs the element block through the fused plane-form
    kernel (ops.pallas_stress) — same math, one HBM pass."""
    E, T, V = cfg.n_elements, cfg.n_traditional, cfg.n_vertices
    dtype = state.x.dtype
    new_ys = state.yield_stress

    # --- element (garment) particles ----------------------------------
    if E > 0 and pallas:
        from ..ops.pallas_stress import cloth_stress_fused
        sel_e = (state.selection[:E] == 0)
        new_d, stress_e, f1, f2, f3 = cloth_stress_fused(
            state.d, state.R_inv, state.vol[:E],
            sel_e.astype(dtype), model.mu[:E], model.lam[:E],
            model.gamma[:E], model.kappa[:E], model.friction_coeff)
    elif E > 0:
        from . import linalg as _la
        sel_e = (state.selection[:E] == 0)
        # ONE QR serves both the return map and the stress: the map only
        # rewrites column 3, which leaves Q and R columns 1-2 unchanged.
        q_e, r_e = _la.qr3_pos(state.d)
        col3_m, d3_m = constitutive.map_r_col3(
            q_e, r_e, model.gamma[:E], model.kappa[:E],
            model.friction_coeff)
        col3_0 = jnp.stack([r_e[..., 0, 2], r_e[..., 1, 2],
                            r_e[..., 2, 2]], axis=-1)
        col3 = jnp.where(sel_e[:, None], col3_m, col3_0)
        d3 = jnp.where(sel_e[:, None], d3_m, state.d[..., :, 2])
        new_d = state.d.at[..., :, 2].set(d3)
        r_new = r_e.at[..., 0, 2].set(col3[..., 0])                    .at[..., 1, 2].set(col3[..., 1])                    .at[..., 2, 2].set(col3[..., 2])
        stress_e, f1, f2, f3 = constitutive.anisotropic_stress_qr(
            state.R_inv, q_e, r_new, d3, state.vol[:E],
            model.mu[:E], model.lam[:E], model.gamma[:E], model.kappa[:E])
        m_e = sel_e[:, None]
        stress_e = jnp.where(m_e[..., None], stress_e, 0.0)
        f1 = jnp.where(m_e, f1, 0.0)
        f2 = jnp.where(m_e, f2, 0.0)
        f3 = jnp.where(m_e, f3, 0.0)
    else:
        new_d = state.d
        stress_e = jnp.zeros((0, 3, 3), dtype)
        f1 = f2 = f3 = None

    if E > 0:
        if vf_incidence is not None:
            # scatter-free: per-vertex incident (element, corner) lists
            # (TPU scatter is row-serialized; see ops.column_transfer)
            f_corners = jnp.stack([f1, f2, f3], axis=1).reshape(-1, 3)
            f_corners = jnp.concatenate(
                [f_corners, jnp.zeros((1, 3), dtype)], 0)
            vertex_force = jnp.sum(f_corners[vf_incidence], axis=1)
        else:
            vertex_force = jnp.zeros((V, 3), dtype)
            vertex_force = vertex_force.at[state.faces[:, 0]].add(f1)
            vertex_force = vertex_force.at[state.faces[:, 1]].add(f2)
            vertex_force = vertex_force.at[state.faces[:, 2]].add(f3)
    else:
        vertex_force = jnp.zeros((V, 3), dtype)

    # --- traditional particles ----------------------------------------
    if T > 0 and pallas and cfg.material == 2:
        # sand: fused plane-form kernel (svd + DP return map + stress in
        # one VMEM pass; the (T,3,3) layout pays a >40x trailing-dim
        # padding tax per materialized intermediate — 29 ms -> ~1 ms for
        # 100k particles)
        from ..ops.pallas_stress import sand_stress_fused
        sl = slice(E, E + T)
        sel_t = (state.selection[sl] == 0)
        f_new, stress_t = sand_stress_fused(
            state.F_trial, state.F, sel_t.astype(dtype),
            model.mu[sl], model.lam[sl], model.alpha)
    elif T > 0:
        sl = slice(E, E + T)
        mu, lam = model.mu[sl], model.lam[sl]
        ys = state.yield_stress[sl]
        f_trial = state.F_trial
        mat = cfg.material
        if mat == 1:  # metal
            f_new, ys_new = constitutive.von_mises_return_mapping(
                f_trial, mu, lam, ys, model.xi, cfg.hardening)
        elif mat == 2:  # sand
            f_new = constitutive.sand_return_mapping(f_trial, mu, lam, model.alpha)
            ys_new = ys
        elif mat == 3:  # foam / viscoplastic
            f_new = constitutive.viscoplasticity_return_mapping_stvk(
                f_trial, mu, ys, model.plastic_viscosity, dt)
            ys_new = ys
        elif mat == 5:  # plasticine (von Mises + damage)
            mu = jnp.where(ys > 0, mu, 0.0)
            lam = jnp.where(ys > 0, lam, 0.0)
            f_new, ys_new, mu, lam = constitutive.von_mises_return_mapping_with_damage(
                f_trial, mu, lam, ys, model.softening, model.xi, cfg.hardening)
        else:  # elastic
            f_new = f_trial
            ys_new = ys

        sel_t = (state.selection[sl] == 0)
        f_new = jnp.where(sel_t[:, None, None], f_new, state.F)
        new_ys = new_ys.at[sl].set(jnp.where(sel_t, ys_new, ys))

        j = jnp.linalg.det(f_new)
        u, sig, v = linalg_svd(f_new)
        if mat in (0, 5):
            st = constitutive.kirchoff_stress_fcr(f_new, u, v, j, mu, lam)
        elif mat == 1:
            st = constitutive.kirchoff_stress_stvk(f_new, u, v, sig, mu, lam)
        elif mat == 2:
            st = constitutive.kirchoff_stress_drucker_prager(f_new, u, v, sig, mu, lam)
        elif mat == 3:
            st = constitutive.kirchoff_stress_stvk(f_new, u, v, sig, mu, lam)
        elif mat == 6:
            st = constitutive.kirchoff_stress_neo_hookean(f_new, u, v, j, sig, mu, lam)
        else:
            st = constitutive.kirchoff_stress_fcr(f_new, u, v, j, mu, lam)
        st = 0.5 * (st + jnp.swapaxes(st, -1, -2))
        stress_t = jnp.where(sel_t[:, None, None], st, 0.0)
    else:
        f_new = state.F
        stress_t = jnp.zeros((0, 3, 3), dtype)

    stress = jnp.concatenate([stress_e, stress_t], axis=0)
    return new_d, f_new, new_ys, stress, vertex_force


def linalg_svd(f):
    from . import linalg
    return linalg.svd3(f)


def p2g(cfg: MPMStaticConfig, state: MPMState, model: MPMModel,
        stress, vertex_force, dt):
    """APIC particle-to-grid scatter (p2g_apic_with_stress,
    mpm_utils.py:485-557).  Returns (grid_v_in (G^3,3), grid_m (G^3,))."""
    E, T, V = cfg.n_elements, cfg.n_traditional, cfg.n_vertices
    P = cfg.n_particles
    inv_dx, dx, G = cfg.inv_dx, cfg.dx, cfg.n_grid

    base, fx, w, dw = bspline(state.x, inv_dx)
    w27 = _stencil_products(w)                       # (P, 27)
    dweight = _dweight27(w, dw, inv_dx)              # (P, 27, 3)
    gidx = _flat_indices(base, G)                    # (P, 27)
    dpos = (_OFFSETS[None] - fx[:, None, :]) * dx    # (P, 27, 3)

    # RPIC damping mix (mpm_utils.py:528-542).
    c = state.C
    rd = model.rpic_damping
    c_eff = (1.0 - rd) * c + rd / 2.0 * (c - jnp.swapaxes(c, -1, -2))
    c_eff = jnp.where(rd < -0.001, 0.0, c_eff)

    # Effective stress: elements use raw stress, traditional scale by vol.
    stress_eff = jnp.zeros((P, 3, 3), state.x.dtype)
    if E > 0:
        stress_eff = stress_eff.at[:E].set(stress[:E])
    if T > 0:
        stress_eff = stress_eff.at[E:E + T].set(
            state.vol[E:E + T, None, None] * stress[E:E + T])

    vforce = jnp.zeros((P, 3), state.x.dtype)
    if V > 0:
        vforce = vforce.at[E + T:].set(vertex_force)

    is_vertex = jnp.zeros((P,), bool).at[E + T:].set(True)

    # force contribution per stencil node
    force_stress = -jnp.einsum("pab,pnb->pna", stress_eff, dweight)
    force_vertex = w27[..., None] * vforce[:, None, :]
    force = jnp.where(is_vertex[:, None, None], force_vertex, force_stress)

    momentum = state.v[:, None, :] + jnp.einsum("pab,pnb->pna", c_eff, dpos)
    sel = (state.selection == 0).astype(state.x.dtype)
    mass_w = w27 * (state.mass * sel)[:, None]
    v_in_add = mass_w[..., None] * momentum + (dt * sel[:, None, None]) * force

    return _scatter_grid(v_in_add, mass_w, gidx, G * G * G)


def grid_update(cfg: MPMStaticConfig, model: MPMModel, grid_v_in, grid_m, dt):
    """Momentum -> velocity, gravity, damping (mpm_utils.py:561-572,
    1162-1174)."""
    active = grid_m > 1e-15
    v_out = jnp.where(active[:, None],
                      grid_v_in / jnp.maximum(grid_m, 1e-15)[:, None]
                      + dt * model.gravity[None, :],
                      0.0)
    scale = model.grid_v_damping_scale
    v_out = jnp.where(scale < 1.0, v_out * scale, v_out)
    return v_out


def rasterize_to_grid(cfg: MPMStaticConfig, points, values, G3):
    """Scatter point ``values`` with B-spline weights; returns
    (grid_val (G^3,3), grid_w (G^3,)).  Applies the reference's bounds
    check base in [0, G-3) (mpm_solver.py:692,730,767,858)."""
    G = cfg.n_grid
    base, fx, w, _ = bspline(points, cfg.inv_dx)
    w27 = _stencil_products(w)
    gidx = _flat_indices(base, G)
    inb = jnp.all((base >= 0) & (base < G - 3), axis=-1)
    w27 = w27 * inb[:, None].astype(w27.dtype)
    return _scatter_grid(w27[..., None] * values[:, None, :], w27, gidx, G3)


def mesh_collider_fields(cfg: MPMStaticConfig, col: MeshCollider,
                         mesh_x, mesh_v, column_k: int = 0,
                         c_cap=None, use_pallas: bool = False,
                         halo=None, z_win=None):
    """Rasterize face-centroid velocity + normal to the grid — the splat
    half of apply_mesh_collider.  Returns (acc (G^3, 6), grid_w (G^3,),
    overflow ()); with ``halo`` the fields are packed (H*Gz, .) and
    contributions outside the halo columns are dropped (no particle
    reads them)."""
    G3 = cfg.n_grid ** 3
    p0 = mesh_x[col.faces[:, 0]]
    p1 = mesh_x[col.faces[:, 1]]
    p2 = mesh_x[col.faces[:, 2]]
    centroid = (p0 + p1 + p2) / 3.0
    fvel = (mesh_v[col.faces[:, 0]] + mesh_v[col.faces[:, 1]]
            + mesh_v[col.faces[:, 2]]) / 3.0
    fnorm = jnp.cross(p1 - p0, p2 - p0)
    from .linalg import safe_norm
    fnorm = fnorm / jnp.maximum(safe_norm(fnorm, axis=-1, keepdims=True),
                                1e-12)

    vals = jnp.concatenate([fvel, fnorm], axis=-1)  # scatter both at once
    G = cfg.n_grid
    if column_k > 0 and use_pallas:
        from ..ops import pallas_transfer as _pt
        # splat_columns_fused is forward-only (no custom VJP): mesh_x/
        # mesh_v are rollout INPUTS in every shipped driver, so nothing
        # differentiates through the collider splat.  stop_gradient makes
        # that contract explicit — a future loss through collider motion
        # would otherwise fail at trace time inside the jitted rollout.
        acc, grid_w, overflow = _pt.splat_columns_fused(
            cfg, jax.lax.stop_gradient(centroid),
            jax.lax.stop_gradient(vals), column_k, c_cap=c_cap,
            halo=halo, z_win=z_win)
    elif column_k > 0:
        from ..ops import column_transfer as _ct
        assert z_win is None, "z-window needs the Pallas column path"
        acc, grid_w, overflow = _ct.splat_columns(cfg, centroid, vals,
                                                  column_k, c_cap=c_cap,
                                                  halo=halo)
    else:
        assert halo is None, (
            "the packed halo grid needs the column splat path "
            "(mesh_column_k > 0)")
        overflow = jnp.zeros((), jnp.int32)
        base, fx, w, _ = bspline(centroid, cfg.inv_dx)
        w27 = _stencil_products(w)
        gidx = _flat_indices(base, G)
        inb = jnp.all((base >= 0) & (base < G - 3), axis=-1)
        w27 = w27 * inb[:, None].astype(w27.dtype)
        flat = gidx.reshape(-1)
        acc = jnp.zeros((G3, 6), mesh_x.dtype).at[flat].add(
            (w27[..., None] * vals[:, None, :]).reshape(-1, 6), mode="drop")
        grid_w = jnp.zeros((G3,), mesh_x.dtype).at[flat].add(
            w27.reshape(-1), mode="drop")
    return acc, grid_w, overflow


def apply_mesh_collider(cfg: MPMStaticConfig, col: MeshCollider,
                        mesh_x, mesh_v, grid_v_out, column_k: int = 0,
                        c_cap=None, halo=None):
    """Grid-level body-mesh collision (mpm_solver.py:819-918): rasterize
    face centroid velocity + normal to the grid, then project out inward
    relative normal velocity with Coulomb friction.

    Returns (grid_v (G^3, 3), overflow ()) — overflow counts collider
    faces dropped by the column splat caps (0 on the scatter path)."""
    from .linalg import safe_norm
    acc, grid_w, overflow = mesh_collider_fields(cfg, col, mesh_x,
                                                 mesh_v, column_k,
                                                 c_cap=c_cap, halo=halo)
    covered = grid_w > 1e-15
    mesh_vel = acc[:, :3] / jnp.maximum(grid_w, 1e-15)[:, None]
    n = acc[:, 3:]
    n = n / jnp.maximum(safe_norm(n, axis=-1, keepdims=True), 1e-12)

    v_rel = grid_v_out - mesh_vel
    normal_comp = jnp.sum(v_rel * n, axis=-1)
    v_proj = v_rel - jnp.minimum(normal_comp, 0.0)[:, None] * n
    v_proj_len = safe_norm(v_proj, axis=-1)
    fric_len = jnp.maximum(0.0, v_proj_len + normal_comp * col.friction)
    fric_active = (normal_comp < 0.0) & (v_proj_len > 1e-20)
    len_safe = jnp.where(fric_active, v_proj_len, 1.0)  # NaN-safe VJP
    v_fric = jnp.where(
        fric_active[:, None],
        (fric_len / len_safe)[:, None] * v_proj,
        v_proj)
    return jnp.where(covered[:, None], v_fric + mesh_vel,
                     grid_v_out), overflow


def joint_particle_fields(cfg: MPMStaticConfig, state: MPMState,
                          joint_verts_v=None, joint_faces_v=None,
                          joint_traditional_v=None):
    """Per-particle (jvel (P,3), jw (P,)) mover fields for the FUSED
    P2G+mover kernel: joint particles carry their prescribed velocity
    and weight 1 (masked by the rasterize bounds check); everyone else
    zero."""
    E, T = cfg.n_elements, cfg.n_traditional
    P = cfg.n_particles
    dtype = state.x.dtype
    jvel = jnp.zeros((P, 3), dtype)
    jw = jnp.zeros((P,), dtype)
    if joint_traditional_v is not None and cfg.num_joint_t > 0:
        start = E + T - cfg.num_joint_t
        jvel = jvel.at[start:E + T].set(joint_traditional_v)
        jw = jw.at[start:E + T].set(1.0)
    if joint_verts_v is not None and cfg.num_joint_v > 0:
        start = E + T
        jvel = jvel.at[start:start + cfg.num_joint_v].set(joint_verts_v)
        jw = jw.at[start:start + cfg.num_joint_v].set(1.0)
    if joint_faces_v is not None and cfg.num_joint_f > 0:
        jvel = jvel.at[:cfg.num_joint_f].set(joint_faces_v)
        jw = jw.at[:cfg.num_joint_f].set(1.0)
    base = jnp.floor(state.x * cfg.inv_dx - 0.5).astype(jnp.int32)
    inb = jnp.all((base >= 0) & (base < cfg.n_grid - 3), axis=-1)
    return jvel, jw * inb.astype(dtype)


def mover_fields(cfg: MPMStaticConfig, state: MPMState,
                 joint_verts_v=None, joint_faces_v=None,
                 joint_traditional_v=None, halo=None,
                 use_pallas: bool = False, z_win=None):
    """Prescribed joint-velocity splat — the scatter half of
    apply_particle_mover.  Returns (grid_vel (G^3, 3), grid_w (G^3,));
    with ``halo`` both are packed (H*Gz, .) via the column splat (the
    joint particles are a subset of the binned particles, so their
    columns are always inside the halo set)."""
    E, T = cfg.n_elements, cfg.n_traditional
    G3 = cfg.n_grid ** 3
    dtype = state.x.dtype

    # ONE fused splat for all joint classes (each extra rasterize pass
    # materialized + added two more (G^3) tensors: 3.6 -> ~1 ms)
    pts, vels = [], []
    if joint_traditional_v is not None and cfg.num_joint_t > 0:
        # joint traditional particles sit at the END of the traditional block
        # (mpm_solver.py:446: offset = n_particles - n_vertices - joint_num)
        start = E + T - cfg.num_joint_t
        pts.append(state.x[start:E + T])
        vels.append(joint_traditional_v)
    if joint_verts_v is not None and cfg.num_joint_v > 0:
        start = E + T
        pts.append(state.x[start:start + cfg.num_joint_v])
        vels.append(joint_verts_v)
    if joint_faces_v is not None and cfg.num_joint_f > 0:
        pts.append(state.x[:cfg.num_joint_f])
        vels.append(joint_faces_v)
    if not pts:
        if halo is not None:
            g_z = z_win[1] if z_win is not None else cfg.n_grid
            n = halo.hcols.shape[0] * g_z
            return (jnp.zeros((n, 3), dtype), jnp.zeros((n,), dtype))
        return (jnp.zeros((G3, 3), dtype), jnp.zeros((G3,), dtype))
    pts = jnp.concatenate(pts, 0)
    vels = jnp.concatenate(vels, 0)
    if halo is not None:
        # exact static caps: at most one pack row per joint point
        n_pts = pts.shape[0]
        c_cap = -(-n_pts // 8) * 8
        if use_pallas:
            from ..ops.pallas_transfer import splat_columns_fused
            gv, gw, _ = splat_columns_fused(cfg, pts, vels, 8,
                                            c_cap=c_cap, halo=halo,
                                            z_win=z_win)
        else:
            from ..ops.column_transfer import splat_columns
            assert z_win is None, "z-window needs the Pallas column path"
            gv, gw, _ = splat_columns(cfg, pts, vels, 8, c_cap=c_cap,
                                      halo=halo)
        return gv, gw
    return rasterize_to_grid(cfg, pts, vels, G3)


def apply_particle_mover(cfg: MPMStaticConfig, state: MPMState, grid_v_out,
                         joint_verts_v=None, joint_faces_v=None,
                         joint_traditional_v=None, halo=None,
                         use_pallas: bool = False, z_win=None):
    """Joint-band Dirichlet velocities (mpm_solver.py:661-802): scatter the
    prescribed joint velocities from the joint particles' positions, then
    overwrite grid velocity where the weight field is nonzero."""
    grid_vel, grid_w = mover_fields(cfg, state, joint_verts_v,
                                    joint_faces_v, joint_traditional_v,
                                    halo=halo, use_pallas=use_pallas,
                                    z_win=z_win)
    covered = grid_w > 1e-15
    v = grid_vel / jnp.maximum(grid_w, 1e-15)[:, None]
    return jnp.where(covered[:, None], v, grid_v_out)


def _grid_coords(cfg: MPMStaticConfig, dtype):
    g = cfg.n_grid
    ar = jnp.arange(g)
    ii, jj, kk = jnp.meshgrid(ar, ar, ar, indexing="ij")
    idx = jnp.stack([ii, jj, kk], axis=-1).reshape(-1, 3)
    return idx, idx.astype(dtype) * cfg.dx


def slab_coords(cfg: MPMStaticConfig, start, n: int, dtype):
    """(idx (n,3) int32, pos (n,3)) for flat grid cells
    [start, start+n) — the per-device slab variant of _grid_coords
    (grid layout is x-major: flat = (x*G + y)*G + z)."""
    g = cfg.n_grid
    f = start + jnp.arange(n)
    idx = jnp.stack([f // (g * g), (f // g) % g, f % g], -1).astype(
        jnp.int32)
    return idx, idx.astype(dtype) * cfg.dx


def apply_grid_bc(cfg: MPMStaticConfig, col, grid_v_out, time, dt,
                  coords=None, cell_start=None, cell_ids=None):
    """Dispatch one grid-level BC by (static) collider type.

    ``coords``/``cell_start`` support running on a grid SLAB under
    shard_map (parallel.sharded): pass slab_coords(...) and the slab's
    first flat cell index; default = the full replicated grid.
    ``coords``/``cell_ids`` likewise support the PACKED halo grid
    (ops.column_transfer.halo_coords / halo_cell_ids)."""
    if coords is not None:
        idx, pos = coords
    else:
        idx, pos = _grid_coords(cfg, grid_v_out.dtype)
    if isinstance(col, SurfaceCollider):
        active = (time >= col.start_time) & (time < col.end_time)
        offset = pos - col.point[None, :]
        dotp = jnp.sum(offset * col.normal[None, :], axis=-1)
        inside = dotp < 0.0
        if col.surface_type == STICKY:
            new_v = jnp.zeros_like(grid_v_out)
        elif col.surface_type == CUT:
            # (mpm_solver.py:623-635)
            z = pos[:, 2]
            band = (z >= 0.4) & (z <= 0.53)
            damped = grid_v_out.at[:, 1].set(0.0) * 0.3
            new_v = jnp.where(band[:, None], damped, 0.0)
        else:
            v = grid_v_out
            nc = jnp.sum(v * col.normal[None, :], axis=-1)
            if col.surface_type == SLIP:
                v2 = v - nc[:, None] * col.normal[None, :]
            else:
                v2 = v - jnp.minimum(nc, 0.0)[:, None] * col.normal[None, :]
            from ..core.linalg import safe_norm as _sn
            vlen = _sn(v2, axis=-1)
            fric = jnp.maximum(0.0, vlen + nc * col.friction)
            f_act = (nc < 0.0) & (vlen > 1e-20)
            vlen_safe = jnp.where(f_act, vlen, 1.0)  # NaN-safe VJP
            v3 = jnp.where(f_act[:, None],
                           (fric / vlen_safe)[:, None] * v2,
                           v2)
            # NOTE: the reference kernel dead-stores this result and writes
            # zero (mpm_solver.py:653-655) — we keep the physically
            # intended projection; no shipped driver exercises this branch.
            new_v = v3
        return jnp.where((active & inside)[:, None], new_v, grid_v_out)

    if isinstance(col, CuboidCollider):
        active = (time >= col.start_time) & (time < col.end_time)
        # functional version of the host-side `modify` callback
        # (mpm_solver.py:975-981)
        t_active = jnp.clip(time, col.start_time, col.end_time) - col.start_time
        point = col.point + t_active * col.velocity
        offset = jnp.abs(pos - point[None, :])
        inside = jnp.all(offset < col.size[None, :], axis=-1)
        out = jnp.where((active & inside)[:, None],
                        jnp.broadcast_to(col.velocity, grid_v_out.shape),
                        grid_v_out)
        if col.reset == 1:
            resetting = (~active) & (time < col.end_time + 15.0 * dt)
            out = jnp.where(resetting, jnp.zeros_like(out), out)
        return out

    if isinstance(col, BoundingBoxCollider):
        active = (time >= col.start_time) & (time < col.end_time)
        pad = col.padding
        g = cfg.n_grid
        v = grid_v_out
        for a in range(3):
            low = (idx[:, a] < pad) & (v[:, a] < 0)
            high = (idx[:, a] >= g - pad) & (v[:, a] > 0)
            v = v.at[:, a].set(jnp.where(active & (low | high), 0.0, v[:, a]))
        return v

    if isinstance(col, GridMaskCollider):
        mask_flat = col.mask.reshape(-1)
        if cell_ids is not None:      # packed halo grid: gather by id
            mask_flat = mask_flat[jnp.clip(cell_ids, 0,
                                           mask_flat.shape[0] - 1)]
        elif cell_start is not None:
            mask_flat = jax.lax.dynamic_slice_in_dim(
                mask_flat, cell_start, grid_v_out.shape[0])
        masked = mask_flat >= 1
        return jnp.where(masked[:, None], 0.0, grid_v_out)

    raise TypeError(f"unknown grid BC {type(col)}")


def gather_quantities(cfg: MPMStaticConfig, state: MPMState, grid_v_out):
    """27-stencil gather: per-particle velocity, APIC C and velocity
    gradient (the read half of g2p_v/g2p_e)."""
    G, inv_dx = cfg.n_grid, cfg.inv_dx
    base, fx, w, dw = bspline(state.x, inv_dx)
    w27 = _stencil_products(w)
    dweight = _dweight27(w, dw, inv_dx)
    gidx = jnp.clip(_flat_indices(base, G), 0, G * G * G - 1)
    gv = grid_v_out[gidx]                               # (P, 27, 3)

    new_v = jnp.sum(w27[..., None] * gv, axis=1)
    dpos = _OFFSETS[None] - fx[:, None, :]              # unitless (g2p: no dx)
    new_c = jnp.sum((w27 * inv_dx * 4.0)[..., None, None]
                    * gv[..., :, None] * dpos[..., None, :], axis=1)
    grad_v = jnp.sum(gv[..., :, None] * dweight[..., None, :], axis=1)
    return new_v, new_c, grad_v


def g2p(cfg: MPMStaticConfig, state: MPMState, model: MPMModel,
        grid_v_out, dt, gathered=None):
    """Grid-to-particle gather + advection (g2p_v / g2p_e,
    mpm_utils.py:716-857).  Preserves the reference's intra-step ordering:
    vertex/traditional particles update first, then element particles read
    the *updated* vertex positions/velocities."""
    E, T, V = cfg.n_elements, cfg.n_traditional, cfg.n_vertices
    P = cfg.n_particles
    G, inv_dx, dx = cfg.n_grid, cfg.inv_dx, cfg.dx

    if gathered is None:
        gathered = gather_quantities(cfg, state, grid_v_out)
    new_v, new_c, grad_v = gathered

    sel = (state.selection == 0)
    a_min, a_max = dx * 2.0, cfg.grid_lim - dx * 2.0
    new_x = jnp.clip(state.x + dt * new_v, a_min, a_max)

    # vertex + traditional blocks.  One packed (P, 15) select instead of
    # three narrow ones: (P, 3)-wide elementwise ops pad their 3 lanes
    # to 128 on TPU (~42x waste); the concat runs the same select at 15
    # lanes (A/B at the 250^3 demo shape: 1.44 -> 1.18 ms).
    nonelem = jnp.zeros((P,), bool).at[E:].set(True)
    upd = (sel & nonelem)[:, None]
    old_pack = jnp.concatenate([state.x, state.v,
                                state.C.reshape(P, 9)], -1)
    new_pack = jnp.concatenate([new_x, new_v, new_c.reshape(P, 9)], -1)
    out_pack = jnp.where(upd, new_pack, old_pack)
    x1 = out_pack[:, 0:3]
    v1 = out_pack[:, 3:6]
    c1 = out_pack[:, 6:15].reshape(P, 3, 3)

    if T > 0:
        # F_trial = (I + dt ∇v) F in channel-major (9, T): XLA lowers the
        # (T, 3, 3) batched matmul with 3-wide lanes (3.2 ms for 2.7
        # MFLOP at 100k sand); as 27 lane-full multiply-adds over (T,)
        # vectors it is 1.2 ms (A/B on chip).
        gv9 = grad_v[E:E + T].reshape(T, 9).T          # (9, T)
        f9 = state.F.reshape(T, 9).T
        rows = []
        for a in range(3):
            for b in range(3):
                acc = f9[3 * a + b]
                for c in range(3):
                    acc = acc + dt * gv9[3 * a + c] * f9[3 * c + b]
                rows.append(acc)
        f_new = jnp.stack(rows, 0)                     # (9, T)
        f_new = jnp.where(sel[None, E:E + T], f_new,
                          state.F_trial.reshape(T, 9).T)
        f_trial = f_new.T.reshape(T, 3, 3)
    else:
        f_trial = state.F_trial

    # element particles from updated vertices (mpm_utils.py:838-857)
    if E > 0:
        voff = E + T
        fi = state.faces + voff
        # three full-row gathers of the packed (P, 15) rows instead of
        # six 3-wide gathers from x1/v1 (1.40 vs 1.74 ms at E~67k).
        # NOTE: gather-then-slice ("fullrow" in scripts/ab_g2p_tail.py);
        # a sliced gather (`pack[fi, :6]`, the script's "packgat")
        # lowers to a pathological strided gather (195 ms).
        pa = out_pack[fi[:, 0]]
        pb = out_pack[fi[:, 1]]
        pc = out_pack[fi[:, 2]]
        avg = (pa + pb + pc) / 3.0
        ex, ev = avg[:, 0:3], avg[:, 3:6]
        d1 = (pb - pa)[:, 0:3]
        d2 = (pc - pa)[:, 0:3]
        d3_old = state.d[..., :, 2]
        # d3 += dt * grad_v @ d3 as 9 lane-full FMAs over (E,) vectors:
        # the (E,3,3)@(E,3) batched matvec lowers to 3-wide-lane ops
        # (and standalone compiles to a pathological loop at E~67k —
        # 545 vs 5.6 ms, scripts/ab_g2p_tail.py)
        gvE = grad_v[:E].reshape(E, 9).T               # (9, E)
        d3o = d3_old.T                                 # (3, E)
        d3 = jnp.stack(
            [d3o[a] + dt * (gvE[3 * a + 0] * d3o[0]
                            + gvE[3 * a + 1] * d3o[1]
                            + gvE[3 * a + 2] * d3o[2])
             for a in range(3)], 0).T
        new_d = jnp.stack([d1, d2, d3], axis=-1)

        sel_e = sel[:E]
        x1 = x1.at[:E].set(jnp.where(sel_e[:, None], ex, state.x[:E]))
        v1 = v1.at[:E].set(jnp.where(sel_e[:, None], ev, state.v[:E]))
        c1 = c1.at[:E].set(jnp.where(sel_e[:, None, None], new_c[:E],
                                     state.C[:E]))
        d_out = jnp.where(sel_e[:, None, None], new_d, state.d)
    else:
        d_out = state.d

    return x1, v1, c1, f_trial, d_out


@partial(jax.jit, static_argnums=(0,),
         static_argnames=("column_k", "mesh_column_k", "column_c_cap",
                          "mesh_c_cap", "column_ztile",
                          "column_radius", "column_bf16", "column_pallas",
                          "fused_grid", "fused_stress", "halo_cap",
                          "z_window", "return_overflow"))
def p2g2p(cfg: MPMStaticConfig,
          colliders: ColliderSet,
          state: MPMState,
          model: MPMModel,
          dt,
          time,
          mesh_x: Optional[jnp.ndarray] = None,
          mesh_v: Optional[jnp.ndarray] = None,
          joint_verts_v: Optional[jnp.ndarray] = None,
          joint_faces_v: Optional[jnp.ndarray] = None,
          joint_traditional_v: Optional[jnp.ndarray] = None,
          column_k: int = 0,
          mesh_column_k: int = 0,
          mesh_c_cap: Optional[int] = None,
          column_c_cap: Optional[int] = None,
          column_ztile: bool = False,
          column_radius: int = 1,
          column_bf16: bool = False,
          column_pallas: bool = False,
          fused_grid: Optional[bool] = None,
          fused_stress: Optional[bool] = None,
          halo_cap: Optional[int] = None,
          z_window: Optional[int] = None,
          column_bins=None,
          column_halo=None,
          vf_incidence: Optional[jnp.ndarray] = None,
          return_overflow: bool = False) -> MPMState:
    """One full MPM substep (MPMWARP.p2g2p, mpm_solver.py:229-536).

    ``column_k > 0`` switches the particle<->grid transfers to the
    scatter-free column-packed MXU path (ops.column_transfer) with K =
    column_k slots per (x, y) column; ``mesh_column_k`` likewise for the
    body-mesh rasterization.

    ``halo_cap > 0`` additionally switches the GRID to the packed
    halo-column ("sparse") layout: all grid fields live as (H, Gz, ch)
    rows over the dilated active-column set, so every grid pass and
    splat fold scales with the occupied columns instead of G^2 — the
    dense grid never materializes (the reference allocates the full
    G^3, mpm_data_structure.py:136; its 200^3/250^3 production configs
    leave >95% of it untouched by the garment).  Requires column_k and
    mesh_column_k when a mesh collider is registered; exact parity with
    the dense path by construction (dropped contributions land only in
    cells no particle reads).

    ``return_overflow=True`` additionally returns an int32 scalar
    counting particles/collider faces silently dropped by the static
    column caps this substep (including halo columns beyond halo_cap) —
    an overflowing scene loses mass, so drivers check it at frame
    boundaries (MPMSolver.frame)."""
    import dataclasses as _dc

    # pre-P2G particle operations
    v = state.v
    for imp in colliders.impulses:
        active = (time >= imp.start_time) & (time < imp.end_time)
        if imp.scale_by_mass:
            delta = imp.force[None, :] / state.mass[:, None] * dt
        else:
            delta = jnp.broadcast_to(imp.force[None, :] * dt, v.shape)
        v = jnp.where((active & (imp.mask >= 1))[:, None], v + delta, v)
    for mod in colliders.velocity_modifiers:
        from .colliders import RotationVelocityModifier
        active = (time >= mod.start_time) & (time < mod.end_time)
        if isinstance(mod, RotationVelocityModifier):
            # cylinder rotation field (mpm_solver.py:1213-1257)
            offset = state.x - mod.point[None, :]
            axial = jnp.sum(offset * mod.normal[None, :], -1)
            radial = offset - axial[:, None] * mod.normal[None, :]
            hd = jnp.sqrt(jnp.sum(radial * radial, -1) + 1e-20)
            cosine = jnp.sum(offset * mod.horizontal_axis_1[None, :],
                             -1) / hd
            theta = jnp.arccos(jnp.clip(cosine, -1.0, 1.0))
            theta = jnp.where(
                jnp.sum(offset * mod.horizontal_axis_2[None, :], -1) > 0,
                theta, -theta)
            v_rot = (-hd * jnp.sin(theta) * mod.rotation_scale)[:, None] \
                * mod.horizontal_axis_1[None, :] \
                + (hd * jnp.cos(theta) * mod.rotation_scale)[:, None] \
                * mod.horizontal_axis_2[None, :] \
                + mod.translation_scale * mod.normal[None, :]
            v = jnp.where((active & (mod.mask == 1))[:, None], v_rot, v)
        else:
            v = jnp.where((active & (mod.mask == 1))[:, None],
                          jnp.broadcast_to(mod.velocity, v.shape), v)
    state = _dc.replace(state, v=v)

    if fused_grid is None:
        fused_grid = column_pallas
    if fused_stress is None:
        fused_stress = column_pallas
    new_d, new_f, new_ys, stress, vertex_force = compute_stress(
        cfg, state, model, dt, vf_incidence=vf_incidence,
        pallas=fused_stress)
    state = _dc.replace(state, d=new_d, F=new_f, yield_stress=new_ys)

    # z-tiled bins ((x, y, z-tile) keys, _ZW-lane windows): measured
    # SLOWER than full-Gz columns on v5e at both 128^3 and 200^3 (the
    # einsum's MXU pass count doesn't shrink below one 128-lane tile,
    # and the dense fine grid G^2*T ~= 1.07*G^3 makes its scatter/fold
    # cost rival the plain layout) — kept as an opt-in experiment knob.
    ztile = (column_ztile and column_k > 0 and column_radius == 1
             and not column_pallas and column_bins is None)
    sparse = halo_cap is not None and halo_cap > 0 and column_k > 0
    assert not (sparse and ztile), "halo grid and z-tiles are exclusive"

    # global z-window: restrict the grid's z extent to ``z_window``
    # cells starting at the per-substep occupancy minimum.  All z-lane
    # work (transfer bases, halo grid fields, splats) shrinks from G to
    # Zw; the window origin is computed ON DEVICE (no host round trip)
    # and particles whose 3-cell splat reach would exceed the window
    # count into the overflow telemetry (exactness guard, like the
    # column caps).  Out-of-window collider/mover writes drop exactly:
    # no particle reads those cells.
    z_win = None
    z_overflow = jnp.zeros((), jnp.int32)
    G_ = cfg.n_grid
    from ..ops import pallas_grid_pipeline as _pgp
    _pipeline_ok = (fused_grid
                    and len(colliders.mesh_colliders) <= 1
                    and _pgp.supported_bcs(colliders.grid_post))
    if (z_window is not None and 0 < z_window < G_ and sparse
            and column_pallas and _pipeline_ok):
        zb = jnp.clip(jnp.floor(state.x[:, 2] * cfg.inv_dx
                                - 0.5).astype(jnp.int32), 0, G_ - 1)
        z_lo = jnp.clip(jnp.min(zb) - 1, 0, G_ - z_window)
        z_overflow = jnp.maximum(jnp.max(zb) + 3 - (z_lo + z_window), 0)
        z_shift = jax.lax.stop_gradient(
            z_lo.astype(state.x.dtype) * cfg.dx)
        z_win = (z_shift, z_window)
    else:
        z_lo = jnp.zeros((), jnp.int32)

    halo = None
    if column_k > 0:
        from ..ops import column_transfer as _ct
        bins = (column_bins if column_bins is not None else
                _ct.build_bins(state.x, cfg, column_k,
                               c_cap=column_c_cap, ztile=ztile))
        if sparse:
            halo = (column_halo if column_halo is not None else
                    _ct.build_halo(bins, cfg, column_radius, halo_cap))
        sel = (state.selection == 0).astype(state.x.dtype)
        rd = model.rpic_damping
        c = state.C
        c_eff = (1.0 - rd) * c + rd / 2.0 * (c - jnp.swapaxes(c, -1, -2))
        c_eff = jnp.where(rd < -0.001, 0.0, c_eff)
        nnv = cfg.n_no_vertices
        if column_pallas:
            from ..ops import pallas_transfer as _pt
            geom = None
            # opt-in: fuse the mover splat into the P2G kernel as 4
            # extra Z0 channels.  The matmul is free (4S=36 and 8S=72
            # rows pad to the same 128-lane MXU tile) but A/B on v5e
            # measured it NET SLOWER (57.1 vs 58.9 substeps/s): the
            # kernel's HBM output and its fold/transpose double, which
            # outweighs the ~0.4 ms separate mover splat it replaces.
            # Kept for scenes with large joint sets.
            import os as _os
            fuse_mover = (colliders.use_particle_mover
                          and bool(_os.environ.get("MPM_FUSE_MOVER"))
                          and (joint_verts_v is not None
                               or joint_faces_v is not None
                               or joint_traditional_v is not None))
            mover = None
            if fuse_mover:
                mover = joint_particle_fields(
                    cfg, state, joint_verts_v, joint_faces_v,
                    joint_traditional_v)
            outs = _pt.p2g_columns_fused(
                cfg, state, dt * sel[:nnv, None, None] * stress,
                dt * vertex_force, column_k, bins=bins, c_eff=c_eff,
                radius=column_radius, bf16=column_bf16, return_px=True,
                halo=halo, mover=mover, z_win=z_win)
            if fuse_mover:
                grid_v_in, grid_m, fused_mv, fused_mw, px_t = outs
            else:
                grid_v_in, grid_m, px_t = outs
                fused_mv = fused_mw = None
        else:
            geom = _ct.pack_geometry(
                cfg, state.x, bins, radius=column_radius,
                zb_dtype=(jnp.bfloat16 if column_bf16 else None),
                ztile=ztile)
            grid_v_in, grid_m = _ct.p2g_columns(
                cfg, state, dt * sel[:nnv, None, None] * stress,
                dt * vertex_force, column_k, bins=bins, c_eff=c_eff,
                radius=column_radius, geom=geom, bf16=column_bf16,
                ztile=ztile, halo=halo)
    else:
        bins = geom = None
        grid_v_in, grid_m = p2g(cfg, state, model, stress, vertex_force, dt)

    if not (column_k > 0 and column_pallas):
        fused_mv = fused_mw = None
    overflow = bins.overflow if bins is not None else jnp.zeros((),
                                                                jnp.int32)
    if halo is not None:
        overflow = overflow + halo.overflow + z_overflow
    has_mover = colliders.use_particle_mover and (
        joint_verts_v is not None or joint_faces_v is not None
        or joint_traditional_v is not None)

    from ..ops import pallas_grid_pipeline as _pgp
    use_pipeline = (fused_grid
                    and len(colliders.mesh_colliders) <= 1
                    and _pgp.supported_bcs(colliders.grid_post))
    if use_pipeline:
        # fused single-pass grid pipeline: normalize+gravity -> mesh
        # projection -> mover override -> BCs in one HBM read/write
        has_mesh = len(colliders.mesh_colliders) == 1
        if has_mesh:
            acc, gw, mesh_of = mesh_collider_fields(
                cfg, colliders.mesh_colliders[0], mesh_x, mesh_v,
                column_k=mesh_column_k, c_cap=mesh_c_cap,
                use_pallas=column_pallas, halo=halo, z_win=z_win)
            overflow = overflow + mesh_of
            mesh_fric = colliders.mesh_colliders[0].friction
        else:
            acc = gw = None
            mesh_fric = jnp.float32(0.0)
        if has_mover and fused_mv is not None:
            mv_, mw_ = fused_mv, fused_mw
        elif has_mover:
            mv_, mw_ = mover_fields(cfg, state, joint_verts_v,
                                    joint_faces_v, joint_traditional_v,
                                    halo=halo, use_pallas=column_pallas,
                                    z_win=z_win)
        else:
            mv_ = mw_ = None
        if halo is not None:
            from ..ops.column_transfer import halo_cell_ids
            g_z = z_win[1] if z_win is not None else cfg.n_grid
            n_cells = halo.hcols.shape[0] * g_z
            pipeline = _pgp.make_grid_pipeline(
                cfg, colliders.grid_post, has_mesh=has_mesh,
                has_mover=has_mover, n_cells=n_cells)
            grid_v_out = pipeline(
                grid_v_in, grid_m, acc, gw, mv_, mw_, model.gravity,
                model.grid_v_damping_scale, mesh_fric, time, dt,
                _pgp.pack_surface_params(colliders.grid_post),
                cell_ids=halo_cell_ids(halo, cfg.n_grid, z_lo, g_z))
        else:
            pipeline = _pgp.make_grid_pipeline(
                cfg, colliders.grid_post, has_mesh=has_mesh,
                has_mover=has_mover)
            grid_v_out = pipeline(
                grid_v_in, grid_m, acc, gw, mv_, mw_, model.gravity,
                model.grid_v_damping_scale, mesh_fric, time, dt,
                _pgp.pack_surface_params(colliders.grid_post))
    else:
        assert z_win is None, (
            "z-window supports the fused grid pipeline path only")
        grid_v_out = grid_update(cfg, model, grid_v_in, grid_m, dt)
        for mc in colliders.mesh_colliders:
            grid_v_out, mesh_of = apply_mesh_collider(
                cfg, mc, mesh_x, mesh_v, grid_v_out,
                column_k=mesh_column_k, c_cap=mesh_c_cap, halo=halo)
            overflow = overflow + mesh_of

        if has_mover and fused_mv is not None:
            mcov = fused_mw > 1e-15
            grid_v_out = jnp.where(
                mcov[:, None],
                fused_mv / jnp.maximum(fused_mw, 1e-15)[:, None],
                grid_v_out)
        elif has_mover:
            grid_v_out = apply_particle_mover(
                cfg, state, grid_v_out, joint_verts_v, joint_faces_v,
                joint_traditional_v, halo=halo,
                use_pallas=column_pallas)

        if halo is not None:
            from ..ops.column_transfer import halo_coords, halo_cell_ids
            hco = halo_coords(halo, cfg, grid_v_out.dtype)
            hids = halo_cell_ids(halo, cfg.n_grid)
            for col in colliders.grid_post:
                grid_v_out = apply_grid_bc(cfg, col, grid_v_out, time,
                                           dt, coords=hco,
                                           cell_ids=hids)
        else:
            for col in colliders.grid_post:
                grid_v_out = apply_grid_bc(cfg, col, grid_v_out, time,
                                           dt)

    if column_k > 0 and column_pallas:
        from ..ops import pallas_transfer as _pt
        gathered = _pt.g2p_columns_fused(cfg, state, grid_v_out,
                                         column_k, bins=bins,
                                         radius=column_radius,
                                         bf16=column_bf16, px_t=px_t,
                                         halo=halo, z_win=z_win)
    elif column_k > 0:
        from ..ops import column_transfer as _ct
        gathered = _ct.g2p_columns(cfg, state, grid_v_out, column_k,
                                   bins=bins, radius=column_radius,
                                   bf16=column_bf16,
                                   geom=geom, ztile=ztile, halo=halo)
    else:
        gathered = None
    x1, v1, c1, f_trial, d1 = g2p(cfg, state, model, grid_v_out, dt,
                                  gathered=gathered)
    state = _dc.replace(state, x=x1, v=v1, C=c1, F_trial=f_trial, d=d1)
    if return_overflow:
        return state, overflow
    return state
