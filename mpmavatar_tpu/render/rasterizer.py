"""Differentiable tile-based 3D Gaussian Splatting rasterizer (pure JAX).

TPU-native replacement for the ``diff_gauss`` CUDA extension used by the
reference (/root/reference/gaussian_renderer/__init__.py:14,95; slothfulxtx
fork of graphdeco diff-gaussian-rasterization).  Same math as the CUDA
forward: EWA projection of 3D covariances (Zwicker), 0.3-pixel low-pass
dilation, 3-sigma tile binning, depth-sorted front-to-back alpha
compositing; returns the rendered image, the accumulated alpha ("mask"
output the reference drivers depend on) and per-gaussian screen radii.

XLA-static design: dynamic per-tile gaussian lists become a fixed-capacity
(T, K) index table built by a two-pass stable sort; compositing is a
``lax.scan`` over K in chunks with a running transmittance carry, with
within-chunk ordering handled by an exclusive cumulative product — fully
differentiable, no atomics, no dynamic shapes.  A Pallas kernel can later
replace ``_composite`` without touching the public API.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import pytree_dataclass

TILE = 16
ALPHA_MIN = 1.0 / 255.0


@pytree_dataclass
class CameraArrays:
    """Device-side camera tensors (see render.cameras.Camera)."""
    world_view: jnp.ndarray       # (4,4) transposed (row-vector)
    full_proj: jnp.ndarray        # (4,4) transposed
    cam_center: jnp.ndarray       # (3,)
    tanfovx: jnp.ndarray          # scalar
    tanfovy: jnp.ndarray          # scalar


def camera_arrays(cam) -> CameraArrays:
    return CameraArrays(
        world_view=jnp.asarray(cam.world_view_transform),
        full_proj=jnp.asarray(cam.full_proj_transform),
        cam_center=jnp.asarray(cam.camera_center),
        tanfovx=jnp.float32(cam.tanfovx),
        tanfovy=jnp.float32(cam.tanfovy))


def project_gaussians(means3d, cov3d, cam: CameraArrays, width: int,
                      height: int):
    """World-space gaussians -> screen space (CUDA forward preprocess).

    Returns (means2d (N,2) px, depth (N,), conic (N,3), radius (N,),
    in_frustum (N,) bool).
    """
    n = means3d.shape[0]
    ones = jnp.ones((n, 1), means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=1)

    p_view = hom @ cam.world_view                       # (N,4) row-vector
    depth = p_view[:, 2]
    p_proj = hom @ cam.full_proj
    p_w = 1.0 / (p_proj[:, 3] + 1e-7)
    ndc = p_proj[:, :3] * p_w[:, None]
    means2d = jnp.stack([((ndc[:, 0] + 1.0) * width - 1.0) * 0.5,
                         ((ndc[:, 1] + 1.0) * height - 1.0) * 0.5], axis=-1)

    focal_x = width / (2.0 * cam.tanfovx)
    focal_y = height / (2.0 * cam.tanfovy)

    # EWA: clamp view-space x/z, y/z like the CUDA kernel
    tz = jnp.maximum(depth, 1e-4)
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    txtz = jnp.clip(p_view[:, 0] / tz, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    zeros = jnp.zeros_like(tz)
    j = jnp.stack([
        jnp.stack([focal_x / tz, zeros, -(focal_x * tx) / (tz * tz)], -1),
        jnp.stack([zeros, focal_y / tz, -(focal_y * ty) / (tz * tz)], -1),
        jnp.stack([zeros, zeros, zeros], -1),
    ], axis=-2)                                          # (N,3,3)
    w_rot = cam.world_view[:3, :3].T                     # w2c rotation
    t_mat = jnp.einsum("ab,nbc->nac", w_rot.T, j.swapaxes(-1, -2))
    # cov2d = J W cov3d W^T J^T; t_mat = (J W)^T
    cov2d_full = jnp.einsum("nba,nbc,ncd->nad", t_mat, cov3d, t_mat)
    c_xx = cov2d_full[:, 0, 0] + 0.3
    c_yy = cov2d_full[:, 1, 1] + 0.3
    c_xy = cov2d_full[:, 0, 1]

    det = c_xx * c_yy - c_xy * c_xy
    det_inv = 1.0 / jnp.maximum(det, 1e-12)
    conic = jnp.stack([c_yy * det_inv, -c_xy * det_inv, c_xx * det_inv], -1)

    mid = 0.5 * (c_xx + c_yy)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    in_frustum = (depth > 0.2) & (det > 0)
    radius = jnp.where(in_frustum, radius, 0.0)
    return means2d, depth, conic, radius, in_frustum


def _sorted_instances(means2d, depth, radius, valid, width, height,
                      max_tiles_per_gauss: int,
                      mid_capacity=None, big_capacity=None, tiers=None):
    """(tile, depth)-sorted gaussian instances (no dense table).

    Returns (tile_sorted (I,), gauss_sorted (I,), edges (T+2,),
    big_overflow) where instances of tile t occupy
    gauss_sorted[edges[t]:edges[t+1]] in front-to-back depth order —
    the layout both compositors consume.  Replaces the 64-bit
    (tile | depth) radix-sort key build of the reference CUDA rasterizer
    (diff-gaussian-rasterization duplicateWithKeys/SortPairs) with one
    multi-operand ``lax.sort``; when (T+1)*(N+1) fits int32 the key
    packs (tile, depth-rank) into a single operand — measurably cheaper
    than the 2-key lexicographic sort at multi-million instance counts.

    ``tiers``: optional ascending ((side, capacity), ...) overriding the
    default footprint tiers — the sort size is the sum of side² x
    capacity slots, so matching tier sides/capacities to the measured
    footprint distribution (see scripts/profile_render.py) shrinks the
    dominant cost for heavy-splat populations.  ``capacity=None`` means
    all N gaussians.  The first tier admits everyone; tier i>0 admits
    (up to capacity) the gaussians whose rect exceeds tier i-1's side.
    Stragglers degrade to the previous tier's coverage; rects wider
    than the last side lose outer tiles; both count into big_overflow.
    """
    n = means2d.shape[0]
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    num_tiles = tiles_x * tiles_y
    side = int(np.ceil(np.sqrt(max_tiles_per_gauss)))

    rect_min_x = jnp.clip(((means2d[:, 0] - radius) / TILE).astype(jnp.int32),
                          0, tiles_x)
    rect_min_y = jnp.clip(((means2d[:, 1] - radius) / TILE).astype(jnp.int32),
                          0, tiles_y)
    rect_max_x = jnp.clip(((means2d[:, 0] + radius + TILE - 1) / TILE
                           ).astype(jnp.int32), 0, tiles_x)
    rect_max_y = jnp.clip(((means2d[:, 1] + radius + TILE - 1) / TILE
                           ).astype(jnp.int32), 0, tiles_y)

    # instance tiers by footprint: most gaussians span <= 2x2 tiles, so
    # giving every gaussian the worst-case side^2 slots makes the
    # (tile, depth) sort ~9x larger than needed.  Default tiers:
    # <= 2x2 -> 4 slots (everyone), <= 4x4 -> the mid pool (16 slots),
    # larger -> the big pool (side^2 slots, split 8/side when side > 8).
    # Pool stragglers degrade to the previous tier's coverage instead of
    # vanishing; big_overflow counts them.
    ok_g = valid & (radius > 0)
    w_t = rect_max_x - rect_min_x
    h_t = rect_max_y - rect_min_y

    packed_key = (num_tiles + 1) * (n + 1) < 2 ** 31
    if packed_key:
        # depth rank (a dense permutation): replaces the f32 depth sort
        # operand and makes the order deterministic under depth ties
        d_order = jnp.argsort(depth)
        rank = jnp.zeros((n,), jnp.int32).at[d_order].set(
            jnp.arange(n, dtype=jnp.int32))

    def pool(idx_g, side_p, emit):
        """Per-pool instance emission.  All per-gaussian values are
        gathered at N scale and broadcast to slots — nothing is gathered
        at instance scale (instance-sized gathers are the dominant cost
        at multi-million instance counts)."""
        offs = jnp.stack(
            jnp.meshgrid(jnp.arange(side_p), jnp.arange(side_p),
                         indexing="ij"), -1).reshape(-1, 2)
        ty = rect_min_y[idx_g][:, None] + offs[None, :, 0]
        tx = rect_min_x[idx_g][:, None] + offs[None, :, 1]
        v = emit[idx_g][:, None] & (ty < rect_max_y[idx_g][:, None]) \
            & (tx < rect_max_x[idx_g][:, None])
        tid = jnp.where(v, ty * tiles_x + tx, num_tiles)
        gid = jnp.broadcast_to(idx_g[:, None], tid.shape)
        if packed_key:
            key = tid * (n + 1) + rank[idx_g][:, None]
            return key.reshape(-1), gid.reshape(-1)
        dep = jnp.where(v, depth[idx_g][:, None], jnp.inf)
        return (tid.reshape(-1), dep.reshape(-1)), gid.reshape(-1)

    def top_pool(flag, capacity):
        order = jnp.argsort(jnp.where(flag, 0, 1), stable=True)
        idx = order[:capacity]
        member = jnp.zeros((n,), bool).at[idx].set(flag[idx])
        return idx, member, jnp.sum(flag) - jnp.sum(member)

    # Pool capacities are STATIC slots: unused slots still enter the
    # (tile, depth) sort as sentinels, so capacities must track the
    # expected footprint distribution, not worst case.  Defaults assume
    # a mostly-small population (trained avatar splats); stragglers
    # degrade to the previous tier's coverage and big_overflow counts
    # them — callers raise the capacities when it is nonzero.
    if tiers is None:
        mid_capacity = min(n, max(256, n // 4) if mid_capacity is None
                           else mid_capacity)
        big_capacity = min(n, max(256, n // 16) if big_capacity is None
                           else big_capacity)
        tiers = ((2, None), (4, mid_capacity))
        if side > 8:
            # giant-footprint tail tier: most >4x4 rects still fit 8x8,
            # so giving every big-pool member the worst-case side^2
            # slots would double the sort; only the (rect > 8) tail
            # pays side^2
            tiers += ((8, big_capacity),
                      (side, min(n, max(256, n // 32))))
        else:
            tiers += ((side, big_capacity),)
    sides = [int(s) for s, _ in tiers]
    assert sides == sorted(sides), "tiers must be ascending by side"
    top_side = sides[-1]

    # tier membership, highest first: a gaussian whose rect exceeds
    # tier i-1's side belongs to tier i (capacity permitting); members
    # of a higher tier never emit in a lower one
    members = [None] * len(tiers)
    idxs = [jnp.arange(n)] + [None] * (len(tiers) - 1)
    in_higher = jnp.zeros((n,), bool)
    over_total = jnp.zeros((), jnp.int32)
    for i in range(len(tiers) - 1, 0, -1):
        cap_i = tiers[i][1]
        cap_i = n if cap_i is None else min(n, max(8, int(cap_i)))
        flag = (ok_g & ~in_higher
                & ((w_t > sides[i - 1]) | (h_t > sides[i - 1])))
        idx_i, in_i, over_i = top_pool(flag, cap_i)
        idxs[i] = idx_i
        members[i] = in_i & ~in_higher
        in_higher = in_higher | in_i
        over_total = over_total + over_i
    members[0] = ok_g & ~in_higher
    pools = [(idxs[i], sides[i], members[i]) for i in range(len(tiers))]
    # rects larger than the top tier's side x side window lose their
    # outer tiles — count them so callers can size the last tier
    # tightly without silent coverage loss
    clipped = ok_g & ((w_t > top_side) | (h_t > top_side))
    big_overflow = over_total + jnp.sum(clipped)

    emitted = [pool(*p) for p in pools]
    gauss_id = jnp.concatenate([g for _, g in emitted])

    if packed_key:
        key = jnp.concatenate([k for k, _ in emitted])
        key_sorted, gauss_sorted = jax.lax.sort((key, gauss_id),
                                                num_keys=1)
        tile_sorted = key_sorted // (n + 1)
    else:
        tile_id = jnp.concatenate([k[0] for k, _ in emitted])
        inst_depth = jnp.concatenate([k[1] for k, _ in emitted])
        tile_sorted, _, gauss_sorted = jax.lax.sort(
            (tile_id, inst_depth, gauss_id), num_keys=2)

    # scatter-free tile ranges: tile_sorted is sorted, so per-tile
    # starts/counts come from searchsorted instead of a row-serial
    # scatter-add over every instance
    edges = jnp.searchsorted(tile_sorted,
                             jnp.arange(num_tiles + 2)).astype(jnp.int32)
    return tile_sorted, gauss_sorted, edges, big_overflow


def _build_tile_table(tile_sorted, gauss_sorted, edges, n: int,
                      num_tiles: int, tile_capacity: int):
    """Dense fixed-capacity (T, K) table from the sorted instances."""
    starts = edges[:-1]
    pos_in_tile = jnp.arange(tile_sorted.shape[0]) - starts[tile_sorted]

    table = jnp.full((num_tiles, tile_capacity), n, jnp.int32)
    ok = (tile_sorted < num_tiles) & (pos_in_tile < tile_capacity)
    flat_idx = jnp.where(ok, tile_sorted * tile_capacity + pos_in_tile,
                         num_tiles * tile_capacity)
    table = table.reshape(-1).at[flat_idx].set(gauss_sorted, mode="drop")
    return table.reshape(num_tiles, tile_capacity)


def _composite(table, means2d, conic, colors, opacities, width, height,
               bg, chunk: int = 32, cap_lo: int = 0, hot_tiles: int = 0):
    """Front-to-back alpha compositing over the tile table.

    With ``0 < cap_lo < cap``: every tile composites only its first
    ``cap_lo`` table entries; the ``hot_tiles`` fullest tiles continue
    (carrying transmittance, so ordering is preserved) through the rest.
    Cuts per-frame work from T*cap to T*cap_lo + H*(cap-cap_lo) — the
    dense-tile tail is rare (reference CUDA rasterizer handles this with
    per-tile dynamic ranges + early termination, diff_gauss forward).

    Returns (image (3,H,W), alpha (1,H,W))."""
    num_tiles, cap = table.shape
    tiles_x = (width + TILE - 1) // TILE
    n = means2d.shape[0]
    nc = colors.shape[-1]

    # pad gaussian attributes with a sentinel (id == n -> zero alpha)
    means2d_p = jnp.concatenate([means2d, jnp.full((1, 2), -1e6,
                                                   means2d.dtype)])
    conic_p = jnp.concatenate([conic, jnp.zeros((1, 3), conic.dtype)])
    colors_p = jnp.concatenate([colors, jnp.zeros((1, nc), colors.dtype)])
    opac_p = jnp.concatenate([opacities.reshape(-1),
                              jnp.zeros((1,), opacities.dtype)])

    # per-tile pixel coordinates (T, TILE*TILE, 2)
    t_idx = jnp.arange(num_tiles)
    tile_x0 = (t_idx % tiles_x) * TILE
    tile_y0 = (t_idx // tiles_x) * TILE
    py, px = jnp.meshgrid(jnp.arange(TILE), jnp.arange(TILE), indexing="ij")
    pix_x = tile_x0[:, None] + px.reshape(-1)[None, :]
    pix_y = tile_y0[:, None] + py.reshape(-1)[None, :]
    pix_all = jnp.stack([pix_x, pix_y], -1).astype(means2d.dtype)  # (T,P,2)

    # NOTE: the scan body must be created per pixel-set — lax.scan caches
    # the traced body by function identity, so a closure whose free
    # variable is rebound between two scans would silently reuse the
    # first trace.
    def make_chunk_step(pix):
      def chunk_step(carry, idx_chunk):
        accum, trans = carry                      # (T,P,nc), (T,P)
        ids = idx_chunk                           # (T,C)
        m = means2d_p[ids]                        # (T,C,2)
        co = conic_p[ids]                         # (T,C,3)
        col = colors_p[ids]                       # (T,C,nc)
        op = opac_p[ids]                          # (T,C)

        d = pix[:, :, None, :] - m[:, None, :, :]          # (T,P,C,2)
        power = -0.5 * (co[:, None, :, 0] * d[..., 0] ** 2
                        + co[:, None, :, 2] * d[..., 1] ** 2) \
            - co[:, None, :, 1] * d[..., 0] * d[..., 1]
        alpha = jnp.minimum(0.99, op[:, None, :] * jnp.exp(
            jnp.minimum(power, 0.0)))
        alpha = jnp.where(power > 0.0, 0.0, alpha)
        alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)   # (T,P,C)

        # exclusive prod_{c'<c}(1-alpha) via log -> strict-lower-tri
        # matmul -> exp: one MXU pass instead of a multi-pass cumprod
        # scan (alpha <= 0.99 keeps log well-conditioned).
        log1m = jnp.log1p(-alpha)
        c_n = alpha.shape[-1]
        tri = jnp.triu(jnp.ones((c_n, c_n), alpha.dtype), 1)  # c' < c
        excl_log = jnp.einsum("tpc,cd->tpd", log1m, tri)
        excl = jnp.exp(excl_log)
        w = alpha * excl * trans[..., None]                # (T,P,C)
        accum = accum + jnp.einsum("tpc,tcn->tpn", w, col)
        trans = trans * jnp.exp(excl_log[..., -1] + log1m[..., -1])
        return (accum, trans), None
      return chunk_step

    p = TILE * TILE
    accum0 = jnp.zeros((num_tiles, p, nc), means2d.dtype)
    trans0 = jnp.ones((num_tiles, p), means2d.dtype)
    # small images can have fewer tiles than the requested hot set
    hot_tiles = min(hot_tiles, num_tiles)
    two_tier = 0 < cap_lo < cap and hot_tiles > 0
    cap1 = cap_lo if two_tier else cap
    chunks = table[:, :cap1].reshape(num_tiles, cap1 // chunk,
                                     chunk).swapaxes(0, 1)
    (accum, trans), _ = jax.lax.scan(make_chunk_step(pix_all),
                                     (accum0, trans0), chunks)
    if two_tier:
        counts_lo = jnp.sum(table[:, :cap] < n, axis=1)
        hot = jnp.argsort(-counts_lo)[:hot_tiles]          # fullest tiles
        table_h = table[hot, cap_lo:]
        pad = (-table_h.shape[1]) % chunk
        if pad:
            table_h = jnp.concatenate(
                [table_h, jnp.full((hot_tiles, pad), n, table.dtype)], 1)
        chunks_h = table_h.reshape(hot_tiles, -1, chunk).swapaxes(0, 1)
        (acc_h, tr_h), _ = jax.lax.scan(make_chunk_step(pix_all[hot]),
                                        (accum[hot], trans[hot]), chunks_h)
        accum = accum.at[hot].set(acc_h)
        trans = trans.at[hot].set(tr_h)

    img = accum + trans[..., None] * bg[None, None, :nc]
    # (T, P, nc) -> (nc, H, W) — crop tile padding
    tiles_y = num_tiles // tiles_x
    img = img.reshape(tiles_y, tiles_x, TILE, TILE, nc)
    img = img.transpose(4, 0, 2, 1, 3).reshape(nc, tiles_y * TILE,
                                               tiles_x * TILE)
    alpha_map = 1.0 - trans
    alpha_map = alpha_map.reshape(tiles_y, tiles_x, TILE, TILE)
    alpha_map = alpha_map.transpose(0, 2, 1, 3).reshape(
        1, tiles_y * TILE, tiles_x * TILE)
    return img[:, :height, :width], alpha_map[:, :height, :width]


def _chunk_windows(pp, item_start, chunk: int):
    """Chunk-wide windows of a chunk-row-blocked stream at arbitrary
    offsets.  ``pp`` is (R, ..., chunk) — the stream split into R rows
    of ``chunk`` consecutive entries on the LAST axis.  A (W, chunk)
    element-gather costs ~7 ns/element on v5e (~30 ms at 4M instances);
    instead gather two chunk-wide ROWS per item (row gathers are ~30x
    cheaper per byte) and align the window with log2(chunk) static
    lane-rotates selected by the bits of the per-item offset."""
    row = jnp.clip(item_start // chunk, 0, pp.shape[0] - 2)
    off = item_start % chunk
    win = jnp.concatenate([pp[row], pp[row + 1]], axis=-1)
    shape1 = (-1,) + (1,) * (win.ndim - 2)                # bcast off
    k = 1
    while k < chunk:
        win = jnp.where(((off & k) != 0).reshape(shape1 + (1,)),
                        jnp.roll(win, -k, axis=-1), win)
        k *= 2
    return win[..., :chunk]


def _composite_worklist(gauss_sorted, edges, means2d, conic, colors,
                        opacities, width, height, bg, chunk: int = 32,
                        work_cap: int = 16384, tile_capacity: int = 512,
                        stop_eps: float = 0.0, instance_cap: int = 0):
    """Front-to-back compositing over a compacted (tile, chunk) worklist.

    Two phases.  Phase 1 composites the first ``chunk`` instances of
    EVERY tile — a dense (T, chunk) batch with no worklist indexing.
    Phase 2 builds a compacted worklist over only the tiles that still
    have instances left, composites one (tile, chunk) item per row and
    combines same-tile segments in depth order with the associative
    rule (c, t) o (c', t') = (c + t*c', t*t') via a segmented
    Hillis-Steele doubling scan, then folds into phase 1's segments.
    Work therefore scales with the number of REAL instances (sum of
    per-tile ceil(count/chunk)); phase-2 items beyond ``work_cap`` are
    dropped (telemetry: third return value).

    ``stop_eps > 0`` skips a tile's phase-2 chunks once ALL its pixels'
    transmittance fell below the threshold after phase 1 — the tile-
    granular version of the reference CUDA rasterizer's per-pixel early
    termination (renderCUDA stops a pixel at T < 1e-4), dropping only
    contributions weighted below ``stop_eps``.  0 disables (exact).

    Consumes the sorted instance layout directly (instances of a tile
    are contiguous in ``gauss_sorted``) — no dense (T, K) table exists
    on this path.  (A pre-gathered packed-parameter stream with
    window reads was measured SLOWER on v5e: rotating (W, D, 2*chunk)
    windows into alignment costs 3x the per-item row gathers it
    replaces — gathers here are ~2.4 ns/row.)
    """
    del instance_cap                                       # retired knob
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    num_tiles = tiles_x * tiles_y
    n = means2d.shape[0]
    nc = colors.shape[-1]
    cap = tile_capacity
    max_items = max(cap // chunk, 1)

    starts = edges[:num_tiles]
    counts = jnp.minimum(edges[1:num_tiles + 1] - starts, cap)

    pad_i = (-gauss_sorted.shape[0]) % chunk + chunk
    gs2 = jnp.concatenate(
        [gauss_sorted,
         jnp.full((pad_i,), n, gauss_sorted.dtype)]).reshape(-1, chunk)
    # ONE packed id-gather per phase (gathers are row-latency-bound:
    # four separate per-array gathers quadruple the dominant cost)
    # feeding the Pallas segment kernel, whose intermediates live in
    # VMEM — an XLA formulation materialized (W, 256, chunk) tensors in
    # HBM and made large work caps uncompilable.  Sentinel id n hits
    # the pad row (opacity 0 -> alpha 0).
    pad = jnp.zeros((1, 6 + nc), means2d.dtype).at[0, 0:2].set(-1e6)
    packed = jnp.concatenate(
        [jnp.concatenate([means2d, conic, colors,
                          opacities.reshape(-1, 1)], -1), pad], 0)
    t_idx = jnp.arange(num_tiles)
    tile_x0 = (t_idx % tiles_x) * TILE
    tile_y0 = (t_idx // tiles_x) * TILE
    pix0_all = jnp.stack([tile_x0, tile_y0], -1).astype(means2d.dtype)

    from .pallas_composite import pick_block, segment_composite
    interp = jax.default_backend() != "tpu"

    # ---- phase 1: first chunk of every tile --------------------------
    ids1 = _chunk_windows(gs2, starts, chunk)              # (T, chunk)
    ids1 = jnp.where(jnp.arange(chunk)[None, :] < counts[:, None],
                     ids1, n)
    tp = (-num_tiles) % 8                                  # kernel block
    pgT1 = packed[ids1].transpose(0, 2, 1)                 # (T, D, chunk)
    if tp:
        pgT1 = jnp.concatenate(
            [pgT1, jnp.broadcast_to(packed[n][None, :, None],
                                    (tp,) + pgT1.shape[1:])], 0)
        pix1 = jnp.concatenate([pix0_all,
                                jnp.zeros((tp, 2), pix0_all.dtype)], 0)
    else:
        pix1 = pix0_all
    seg1 = segment_composite(pgT1, pix1, nc,
                             pick_block(num_tiles + tp), interp)
    c1 = seg1[:num_tiles, :nc]                             # (T, nc, P)
    t1 = seg1[:num_tiles, nc]                              # (T, P)

    # ---- phase 2: remaining chunks, compacted worklist ---------------
    rem = jnp.maximum((counts + chunk - 1) // chunk - 1, 0)
    if stop_eps > 0.0:
        alive = jnp.max(t1, axis=-1) >= stop_eps
        rem = jnp.where(alive, rem, 0)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(rem).astype(jnp.int32)])
    n_items = offs[-1]
    overflow = jnp.maximum(n_items - work_cap, 0)

    w_ids = jnp.arange(work_cap)
    item_tile = jnp.clip(
        jnp.searchsorted(offs, w_ids, side="right") - 1, 0, num_tiles - 1)
    valid_item = w_ids < n_items
    ordinal = jnp.clip(w_ids - offs[item_tile], 0,
                       max(max_items - 2, 0)) + 1          # chunks 1..
    pos = ordinal[:, None] * chunk + jnp.arange(chunk)[None, :]
    in_tile = valid_item[:, None] & (pos < counts[item_tile][:, None])
    item_start = starts[item_tile] + ordinal * chunk       # (W,)
    ids = jnp.where(in_tile, _chunk_windows(gs2, item_start, chunk), n)

    pgT = packed[ids].transpose(0, 2, 1)                   # (W, D, chunk)
    pix0 = pix0_all[item_tile]                             # (W, 2)
    seg = segment_composite(pgT, pix0, nc, pick_block(work_cap), interp)
    seg_c = seg[:, :nc]                                    # (W, nc, P)
    seg_t = seg[:, nc]                                     # (W, P)

    # Segmented inclusive scan along W (items of one tile are
    # consecutive and depth-ordered; invalid tail items are the identity
    # (0, 1) so merging them is harmless).  After ceil(log2(max chunks-1))
    # doubling steps, item i holds the ordered combination of its tile's
    # items [segment_start..i].
    s = 1
    while s < max_items - 1:
        same = jnp.concatenate(
            [jnp.zeros((s,), bool), item_tile[s:] == item_tile[:-s]])
        c_l = jnp.concatenate(
            [jnp.zeros((s,) + seg_c.shape[1:], seg_c.dtype), seg_c[:-s]])
        t_l = jnp.concatenate(
            [jnp.ones((s,) + seg_t.shape[1:], seg_t.dtype), seg_t[:-s]])
        seg_c = jnp.where(same[:, None, None],
                          c_l + t_l[:, None, :] * seg_c, seg_c)
        seg_t = jnp.where(same[:, None], t_l * seg_t, seg_t)
        s *= 2

    # per-tile phase-2 result at its LAST in-cap item; tiles truncated
    # by work_cap keep the in-cap prefix (overflow is reported above)
    tile_end = jnp.minimum(offs[1:num_tiles + 1], work_cap)
    has = offs[:num_tiles] < tile_end
    last = jnp.clip(tile_end - 1, 0, work_cap - 1)
    c2 = jnp.where(has[:, None, None], seg_c[last], 0.0)   # (T, nc, P)
    t2 = jnp.where(has[:, None], seg_t[last], 1.0)         # (T, P)

    # phase 1 (front) o phase 2
    accum = c1 + t1[:, None, :] * c2
    trans = t1 * t2

    img = accum + trans[:, None, :] * bg[:nc][None, :, None]
    img = img.reshape(tiles_y, tiles_x, nc, TILE, TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(nc, tiles_y * TILE,
                                               tiles_x * TILE)
    alpha_map = 1.0 - trans
    alpha_map = alpha_map.reshape(tiles_y, tiles_x, TILE, TILE)
    alpha_map = alpha_map.transpose(0, 2, 1, 3).reshape(
        1, tiles_y * TILE, tiles_x * TILE)
    return (img[:, :height, :width], alpha_map[:, :height, :width],
            overflow)


@partial(jax.jit, static_argnames=("width", "height", "tile_capacity",
                                   "max_tiles_per_gauss", "chunk",
                                   "tile_capacity_lo", "hot_tiles",
                                   "work_cap", "mid_capacity",
                                   "big_capacity", "tiers", "stop_eps",
                                   "instance_cap"))
def rasterize(means3d, colors, opacities, cov3d, cam: CameraArrays,
              bg, width: int, height: int, means2d_offset=None,
              tile_capacity: int = 512, max_tiles_per_gauss: int = 36,
              chunk: int = 32, tile_capacity_lo: int = 0,
              hot_tiles: int = 0, work_cap: int = 0,
              mid_capacity: int = None, big_capacity: int = None,
              tiers=None, stop_eps: float = 0.0, instance_cap: int = 0):
    """Full differentiable splatting pass.

    ``means2d_offset`` (N,2), normally zeros, is added to the projected 2D
    means — differentiate the loss w.r.t. it to get the view-space
    positional gradients the densification heuristic needs
    (gaussian_renderer/__init__.py:26-29, gaussian_model.py:524-526).

    ``tile_capacity_lo``/``hot_tiles`` enable two-tier compositing (see
    _composite) — large-frame speed knob; 0 disables.

    Returns dict(render (3,H,W), alpha (1,H,W), radii (N,), depth (N,)).
    """
    means2d, depth, conic, radius, in_frustum = project_gaussians(
        means3d, cov3d, cam, width, height)
    if means2d_offset is not None:
        means2d = means2d + means2d_offset
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    num_tiles = tiles_x * tiles_y
    tile_sorted, gauss_sorted, edges, big_overflow = _sorted_instances(
        means2d, depth, radius, in_frustum, width, height,
        max_tiles_per_gauss,
        mid_capacity=mid_capacity, big_capacity=big_capacity,
        tiers=tiers)
    counts = edges[1:num_tiles + 1] - edges[:num_tiles]
    if work_cap > 0:
        img, alpha, work_overflow = _composite_worklist(
            gauss_sorted, edges, means2d, conic, colors, opacities,
            width, height, bg, chunk=chunk, work_cap=work_cap,
            tile_capacity=tile_capacity, stop_eps=stop_eps,
            instance_cap=instance_cap)
    else:
        table = _build_tile_table(tile_sorted, gauss_sorted, edges,
                                  means3d.shape[0], num_tiles,
                                  tile_capacity)
        img, alpha = _composite(table, means2d, conic, colors, opacities,
                                width, height, bg, chunk=chunk,
                                cap_lo=tile_capacity_lo,
                                hot_tiles=hot_tiles)
        work_overflow = jnp.zeros((), jnp.int32)
    return {"render": img, "alpha": alpha, "radii": radius,
            "depth": depth, "tile_counts": counts,
            "big_overflow": big_overflow,
            "work_overflow": work_overflow}
