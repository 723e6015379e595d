"""Fused Pallas grid pipeline: one pass over the dense grid per substep.

The grid half of the substep — normalize+gravity+damping, the
body-mesh-collider projection, the joint-pin override and the grid BCs —
is pure elementwise work, but as separate XLA ops each pass re-reads and
re-writes the (G^3, 3) velocity field from HBM (measured ~12 ms of the
46 ms bench substep).  This kernel runs the whole chain in VMEM in a
single HBM read/write of each field.

Layout: fields are reshaped to (rows, C, 128) — 128 cells per lane row,
channels on the sublane axis — the 3-D leading-row layout the fused
transfer kernels use (XLA:TPU stack-allocates small-leading-dim 2-D
pallas results in the 16 MB scoped-vmem space and OOMs; leading-row 3-D
results land in HBM).  Cell coordinates are rebuilt in-kernel from the
flat id.  Covers SurfaceCollider (sticky/slip/frictional) and
BoundingBoxCollider BCs — scenes with other grid BCs keep the XLA path
(stepping.p2g2p falls back automatically).

Differentiable via custom_vjp (backward re-traces the jnp math), like
ops.pallas_transfer.

Replaces grid_normalization_and_gravity + collide + particle-mover +
surface-BC kernels of the reference
(/root/reference/warp_mpm/mpm_utils.py:561-572,663-905,
mpm_solver.py:575-658) as one fused TPU pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.colliders import (STICKY, SLIP, BoundingBoxCollider,
                              SurfaceCollider)
from ..core.types import MPMStaticConfig

_EPS = 1e-15
_LANES = 128


def supported_bcs(grid_post) -> bool:
    """True when every grid BC is kernel-supported (surface non-CUT or
    bounding box)."""
    from ..core.colliders import CUT
    for col in grid_post:
        if isinstance(col, SurfaceCollider):
            if col.surface_type == CUT:
                return False
        elif not isinstance(col, BoundingBoxCollider):
            return False
    return True


def _make_math(G, surfaces, has_bbox, bbox_pad, has_mesh, has_mover,
               cell_size):
    """Bind the static scene structure.  ``math`` consumes 2-D planes of
    any common shape plus a matching int32 cell-id plane and the packed
    scalar vector (SCALAR indexing only, so SMEM refs work too)."""

    def math(gv, gm, macc, mvv, mvw, cell, scal):
        # gv: [3 planes], gm: plane, macc: [7 planes: vel3+normal3+w],
        # mvv: [3 planes], mvw: plane
        f32 = gv[0].dtype
        ix = (cell // (G * G)).astype(f32)
        iy = ((cell // G) % G).astype(f32)
        iz = (cell % G).astype(f32)

        g_vec = (scal[0], scal[1], scal[2])
        damping = scal[3]
        mesh_fric = scal[4]
        time = scal[5]
        dt = scal[6]

        active = gm > _EPS
        m_safe = jnp.where(active, gm, 1.0)
        v = [jnp.where(active, gv[c] / m_safe + dt * g_vec[c], 0.0)
             for c in range(3)]
        v = [jnp.where(damping < 1.0, vc * damping, vc) for vc in v]

        if has_mesh:
            mgw = macc[6]
            covered = mgw > _EPS
            w_safe = jnp.where(covered, mgw, 1.0)
            mvel = [macc[c] / w_safe for c in range(3)]
            nx, ny, nz = macc[3], macc[4], macc[5]
            nl = jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-12)
            nx, ny, nz = nx / nl, ny / nl, nz / nl
            rx, ry, rz = (v[0] - mvel[0], v[1] - mvel[1], v[2] - mvel[2])
            nc = rx * nx + ry * ny + rz * nz
            ncm = jnp.minimum(nc, 0.0)
            px_, py_, pz_ = rx - ncm * nx, ry - ncm * ny, rz - ncm * nz
            vpl = jnp.sqrt(px_ ** 2 + py_ ** 2 + pz_ ** 2 + 1e-40)
            fric = jnp.maximum(0.0, vpl + nc * mesh_fric)
            f_act = (nc < 0.0) & (vpl > 1e-20)
            rat = jnp.where(f_act, fric / jnp.where(f_act, vpl, 1.0), 1.0)
            out = [rat * px_ + mvel[0], rat * py_ + mvel[1],
                   rat * pz_ + mvel[2]]
            v = [jnp.where(covered, out[c], v[c]) for c in range(3)]

        if has_mover:
            movered = mvw > _EPS
            mw_safe = jnp.where(movered, mvw, 1.0)
            v = [jnp.where(movered, mvv[c] / mw_safe, v[c])
                 for c in range(3)]

        for si, stype in enumerate(surfaces):
            base = 7 + si * 9
            p0 = (scal[base], scal[base + 1], scal[base + 2])
            nrm = (scal[base + 3], scal[base + 4], scal[base + 5])
            fricc = scal[base + 6]
            t0, t1 = scal[base + 7], scal[base + 8]
            dotp = ((ix * cell_size - p0[0]) * nrm[0]
                    + (iy * cell_size - p0[1]) * nrm[1]
                    + (iz * cell_size - p0[2]) * nrm[2])
            act = (time >= t0) & (time < t1)
            inside = act & (dotp < 0.0)
            if stype == STICKY:
                v = [jnp.where(inside, 0.0, vc) for vc in v]
            else:
                nc = v[0] * nrm[0] + v[1] * nrm[1] + v[2] * nrm[2]
                if stype == SLIP:
                    v2 = [v[c] - nc * nrm[c] for c in range(3)]
                else:
                    ncm = jnp.minimum(nc, 0.0)
                    v2 = [v[c] - ncm * nrm[c] for c in range(3)]
                vlen = jnp.sqrt(v2[0] ** 2 + v2[1] ** 2 + v2[2] ** 2
                                + 1e-40)
                fr = jnp.maximum(0.0, vlen + nc * fricc)
                fa = (nc < 0.0) & (vlen > 1e-20)
                rat = jnp.where(fa, fr / jnp.where(fa, vlen, 1.0), 1.0)
                v = [jnp.where(inside, rat * v2[c], v[c])
                     for c in range(3)]

        if has_bbox:
            for a in range(3):
                ia = (ix, iy, iz)[a]
                low = (ia < bbox_pad) & (v[a] < 0)
                high = (ia >= G - bbox_pad) & (v[a] > 0)
                v[a] = jnp.where(low | high, 0.0, v[a])
        return v

    return math


def _grid_pipeline_pallas(math, gvr, gmr, maccr, mvvr, mvwr, scal,
                          row0, block_rows, interpret, cellsr=None):
    """gvr (R,3,128), gmr (R,1,128), maccr (R,7,128), mvvr (R,3,128),
    mvwr (R,1,128) -> (R,3,128).  ``row0``: global row offset of this
    slab (cell ids must stay absolute for the coordinate-based BCs).
    ``cellsr`` (R,1,128) int32 overrides the iota-derived cell ids —
    the PACKED halo-grid mode, where cell identity is data."""
    rows = gvr.shape[0]
    br = block_rows
    packed = cellsr is not None

    def kernel(*refs):
        if packed:
            (gv_ref, gm_ref, macc_ref, mvv_ref, mvw_ref, cell_ref,
             scal_ref, row0_ref, out_ref) = refs
            cell = cell_ref[:, 0, :]
        else:
            (gv_ref, gm_ref, macc_ref, mvv_ref, mvw_ref, scal_ref,
             row0_ref, out_ref) = refs
            i = pl.program_id(0)
            cell = ((row0_ref[0] + i * br
                     + jax.lax.broadcasted_iota(jnp.int32,
                                                (br, _LANES), 0))
                    * _LANES
                    + jax.lax.broadcasted_iota(jnp.int32, (br, _LANES),
                                               1))
        gv = [gv_ref[:, c, :] for c in range(3)]
        gm = gm_ref[:, 0, :]
        macc = [macc_ref[:, c, :] for c in range(7)]
        mvv = [mvv_ref[:, c, :] for c in range(3)]
        mvw = mvw_ref[:, 0, :]
        v = math(gv, gm, macc, mvv, mvw, cell, scal_ref)
        for c in range(3):
            out_ref[c * br:(c + 1) * br, :] = v[c]

    bspec = lambda c: pl.BlockSpec((br, c, _LANES),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
    in_specs = [bspec(3), bspec(1), bspec(7), bspec(3), bspec(1)]
    operands = [gvr, gmr, maccr, mvvr, mvwr]
    if packed:
        in_specs.append(bspec(1))
        operands.append(cellsr)
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM),
                 pl.BlockSpec(memory_space=pltpu.SMEM)]
    operands += [scal, row0]
    # output as clean 2-D (3*rows, 128) channel blocks per grid step —
    # (R, 3, 128) results get stack-allocated in scoped vmem (S(1))
    # and OOM once several slab results coexist
    out = pl.pallas_call(
        kernel,
        grid=(rows // br,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3 * br, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * rows, _LANES), jnp.float32),
        interpret=interpret,
    )(*operands)
    # [slab-block: vx(br), vy(br), vz(br)] -> (rows, 3, 128)
    return out.reshape(rows // br, 3, br, _LANES).transpose(
        0, 2, 1, 3).reshape(rows, 3, _LANES)


def make_grid_pipeline(cfg: MPMStaticConfig, grid_post,
                       has_mesh: bool, has_mover: bool,
                       block_rows: int = 128, interpret=None,
                       n_cells: int = None):
    """Build the fused pipeline fn(grid_v_in (N,3), grid_m (N,), mesh
    fields (N,6)/(N,), mover fields (N,3)/(N,), gravity, damping,
    mesh_friction, time, dt, surf_params[, cell_ids]) -> grid_v_out
    (N,3).

    The collider STRUCTURE (types/order) is static; their parameters are
    packed into the scalar vector at call time, so time-varying BCs and
    trained parameters trace correctly.

    ``n_cells`` switches to the PACKED halo-grid mode: N = n_cells
    (H * Gz) instead of G^3 and the caller passes explicit dense cell
    ids per packed cell (ops.column_transfer.halo_cell_ids) — cell
    identity becomes data instead of the row iota."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    packed = n_cells is not None
    surfaces = []
    has_bbox = False
    bbox_pad = 3
    for col in grid_post:
        if isinstance(col, SurfaceCollider):
            surfaces.append(int(col.surface_type))
        elif isinstance(col, BoundingBoxCollider):
            has_bbox = True
            bbox_pad = int(getattr(col, "padding", 3))
    surfaces = tuple(surfaces)
    math = _make_math(cfg.n_grid, surfaces, has_bbox, bbox_pad,
                      has_mesh, has_mover, float(cfg.dx))
    n = n_cells if packed else cfg.n_grid ** 3
    # pad the flat cell axis so every slab is a whole number of
    # sublane-aligned (128-row, 128-lane) blocks: G need not be
    # lane-divisible (200^3 rows = 62500, 250^3 isn't even a multiple
    # of 128).  Padding cells have zero mass -> v = 0, sliced off at
    # the end.
    rows = -(-n // _LANES)
    rows = -(-rows // 128) * 128
    n_pad = rows * _LANES
    br = min(block_rows, rows)
    while rows % br:
        br //= 2
    assert br % 8 == 0 or br == rows, (rows, br)

    @jax.custom_vjp
    def run(gvr, gmr, maccr, mvvr, mvwr, scal, row0, cellsr):
        return _grid_pipeline_pallas(math, gvr, gmr, maccr, mvvr, mvwr,
                                     scal, row0, br, interpret,
                                     cellsr=cellsr if packed else None)

    def _math_full(gvr, gmr, maccr, mvvr, mvwr, scal, row0, cellsr):
        r = gvr.shape[0]
        if packed:
            cell = cellsr[:, 0, :]
        else:
            cell = ((row0[0]
                     + jax.lax.broadcasted_iota(jnp.int32, (r, _LANES),
                                                0))
                    * _LANES
                    + jax.lax.broadcasted_iota(jnp.int32, (r, _LANES),
                                               1))
        v = math([gvr[:, c, :] for c in range(3)], gmr[:, 0, :],
                 [maccr[:, c, :] for c in range(7)],
                 [mvvr[:, c, :] for c in range(3)], mvwr[:, 0, :],
                 cell, scal)
        return jnp.stack(v, axis=1)

    def fwd(gvr, gmr, maccr, mvvr, mvwr, scal, row0, cellsr):
        return run(gvr, gmr, maccr, mvvr, mvwr, scal, row0, cellsr), (
            gvr, gmr, maccr, mvvr, mvwr, scal, row0, cellsr)

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda gvr, gmr, maccr, mvvr, mvwr, scal: _math_full(
                gvr, gmr, maccr, mvvr, mvwr, scal, res[6], res[7]),
            *res[:6])
        return vjp(g) + (None, None)

    run.defvjp(fwd, bwd)

    def to_rows(arr, c):
        # (N, c) -> (rows, c, 128), zero-padding the cell axis to n_pad
        if n_pad != n:
            arr = jnp.concatenate(
                [arr, jnp.zeros((n_pad - n, c), arr.dtype)], axis=0)
        return arr.reshape(rows, _LANES, c).transpose(0, 2, 1)

    def to_rows1(arr):
        # (N,) -> (rows, 1, 128)
        if n_pad != n:
            arr = jnp.concatenate(
                [arr, jnp.zeros((n_pad - n,), arr.dtype)], axis=0)
        return arr.reshape(rows, 1, _LANES)

    def pipeline(grid_v_in, grid_m, mesh_acc, mesh_gw, mover_v, mover_w,
                 gravity, damping, mesh_friction, time, dt, surf_params,
                 cell_ids=None):
        gvr = to_rows(grid_v_in, 3)
        gmr = to_rows1(grid_m)
        if mesh_acc is not None:
            maccr = jnp.concatenate(
                [to_rows(mesh_acc, 6), to_rows1(mesh_gw)], axis=1)
        else:
            maccr = jnp.zeros((rows, 7, _LANES), jnp.float32)
        mvvr = (to_rows(mover_v, 3) if mover_v is not None
                else jnp.zeros((rows, 3, _LANES), jnp.float32))
        mvwr = (to_rows1(mover_w) if mover_w is not None
                else jnp.zeros((rows, 1, _LANES), jnp.float32))
        if packed:
            assert cell_ids is not None
            cellsr = to_rows1(cell_ids)        # pad cells: id 0, mass 0
        else:
            cellsr = jnp.zeros((1, 1, _LANES), jnp.int32)
        scal = jnp.concatenate(
            [jnp.asarray(gravity, jnp.float32).reshape(3),
             jnp.asarray(damping, jnp.float32).reshape(1),
             jnp.asarray(mesh_friction, jnp.float32).reshape(1),
             jnp.asarray(time, jnp.float32).reshape(1),
             jnp.asarray(dt, jnp.float32).reshape(1)]
            + [jnp.asarray(p, jnp.float32).reshape(-1)
               for p in surf_params])
        # one pallas call's operand copies + result all live in the
        # 16 MB scoped-vmem stack -> slab over rows so each call's
        # ~60 B/cell footprint stays well under the cap
        slab = 1024
        if rows <= slab:
            out = run(gvr, gmr, maccr, mvvr, mvwr, scal,
                      jnp.zeros((1,), jnp.int32), cellsr)
        else:
            outs = [run(gvr[s:s + slab], gmr[s:s + slab],
                        maccr[s:s + slab], mvvr[s:s + slab],
                        mvwr[s:s + slab], scal,
                        jnp.full((1,), s, jnp.int32),
                        cellsr[s:s + slab] if packed else cellsr)
                    for s in range(0, rows, slab)]
            out = jnp.concatenate(outs, axis=0)        # (rows, 3, 128)
        return out.transpose(0, 2, 1).reshape(n_pad, 3)[:n]

    return pipeline


def pack_surface_params(grid_post):
    """Per-surface (point3, normal3, friction, t0, t1) rows in the
    static order the pipeline kernel expects."""
    rows = []
    for col in grid_post:
        if isinstance(col, SurfaceCollider):
            rows.append(jnp.concatenate(
                [col.point, col.normal,
                 jnp.reshape(col.friction, (1,)),
                 jnp.reshape(col.start_time, (1,)),
                 jnp.reshape(col.end_time, (1,))]))
    return rows
