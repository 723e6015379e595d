"""Column-packed MXU particle<->grid transfer (the fast P2G/G2P path).

Motivation (measured on TPU v5e): XLA's scatter-add executes row-serially
(~60 ns/row), so the naive 27-tap P2G of 100k particles costs ~150 ms —
35x the whole substep budget.  This module reformulates both transfers as
dense batched matmuls on the MXU:

1. Particles are binned by their (x, y) base-cell COLUMN; only the
   occupied columns (bounded by a static cap) are packed into a
   (C_cap, K) slot table — built with sort + gathers, no scatter.
2. The z-axis becomes the TPU lane dimension: for every packed particle
   three z-basis rows are built over all Gz cells — Z0 = w(z),
   Z1 = (z offset - fz) * w(z), Z2 = w'(z) — so every per-tap
   contribution becomes  coeff(shift) . Z_basis(z).
3. P2G = einsum("cmz,cmn->czn") over m = K*3 slot-basis pairs and
   n = 9 shifts x channels, then 9 small row scatters (C_cap rows each)
   place whole z-columns into the grid.  G2P is the transposed batched
   matmul against gathered grid columns.

Everything is static-shape and differentiable.  K bounds particles per
column and C_cap bounds occupied columns; overflow is reported in
ColumnBins.overflow (raise the caps for denser scenes).

Matches core.stepping.p2g / g2p semantics exactly (same B-spline,
APIC/RPIC, force terms); verified by tests/test_column_transfer.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.types import MPMState, MPMStaticConfig


class ColumnBins(NamedTuple):
    active_col: jnp.ndarray  # (C,) column id per ROW (sentinel G*G);
    #                          a column with > K points spans several rows
    pid: jnp.ndarray         # (C, K) particle index (sentinel = P)
    valid: jnp.ndarray       # (C, K) bool
    cidx_of_p: jnp.ndarray   # (P,) row index of each particle
    rank_of_p: jnp.ndarray   # (P,) slot within the row (K+1 = dropped)
    overflow: jnp.ndarray    # () int32: particles dropped (row cap)


def default_col_cap(cfg: MPMStaticConfig, n_points: int) -> int:
    """Heuristic row cap: occupied columns + chunk rows for the points."""
    return min(cfg.n_grid * cfg.n_grid + n_points,
               max(1024, n_points // 8))


# z-tiled binning: rows are (x, y, z-tile) bins instead of full (x, y)
# columns, so the z-basis spans a _ZW-lane window instead of all Gz
# cells — the transfer matmuls and z-tensors become G-independent
# (zb shrinks 4x at G=128, 6x+ at the 200^3/250^3 production grids).
# A tile holds base-z cells [t*_ZH, (t+1)*_ZH); its 3-tap stencil writes
# z in [t*_ZH, t*_ZH + _ZH + 1], i.e. a _ZW = _ZH + 2 window.  Only the
# exact-rebin path (radius == 1) uses z tiles: cross-tile drift would
# need rebinning, which that path does every substep anyway.
_ZW = 32
_ZH = _ZW - 2


def n_ztiles(G: int) -> int:
    return -(-G // _ZH)


def _bin_key(x, cfg: MPMStaticConfig, ztile: bool):
    """Flat bin id per point + the sentinel id (== number of bins)."""
    G = cfg.n_grid
    base = jnp.floor(x * cfg.inv_dx - 0.5).astype(jnp.int32)
    col = jnp.clip(base[:, 0], 0, G - 1) * G + jnp.clip(base[:, 1], 0,
                                                        G - 1)
    if not ztile:
        return col, G * G
    T = n_ztiles(G)
    tile = jnp.clip(base[:, 2], 0, G - 1) // _ZH
    return col * T + tile, G * G * T


@partial(jax.jit, static_argnums=(1, 2, 3))
def count_rows(x: jnp.ndarray, cfg: MPMStaticConfig, K: int,
               ztile: bool = False):
    """Exact pack-table row count for the current positions — the
    adaptive-row-cap probe (one sort + cumsum; run once per frame)."""
    col, _ = _bin_key(x, cfg, ztile)
    sorted_col = jax.lax.sort(col)
    flags = jnp.concatenate([jnp.ones((1,), jnp.int32),
                             (sorted_col[1:] != sorted_col[:-1])
                             .astype(jnp.int32)])
    seg_id = jnp.cumsum(flags) - 1
    # per-segment counts via first positions of each segment
    P = x.shape[0]
    iota = jnp.arange(P, dtype=jnp.int32)
    seg_start = jax.lax.cummax(jnp.where(flags > 0, iota, 0))
    # rows = sum over segments of ceil(count/K); count at each segment
    # END position = iota - seg_start + 1
    is_end = jnp.concatenate([(sorted_col[1:] != sorted_col[:-1]),
                              jnp.ones((1,), bool)])
    count_at_end = iota - seg_start + 1
    rows = jnp.sum(jnp.where(is_end, (count_at_end + K - 1) // K, 0))
    return rows


def build_bins(x: jnp.ndarray, cfg: MPMStaticConfig, K: int,
               c_cap: Optional[int] = None,
               ztile: bool = False) -> ColumnBins:
    """Sort-and-pack points by (x, y) base-cell column into (row, slot)
    tables of K slots per row.

    A column holding n > K points occupies ceil(n/K) consecutive ROWS
    (same ``active_col`` id) — P2G's column scatter adds the chunks back
    together and G2P gathers the same grid column for each chunk, so any
    per-column population is exact up to the total row cap ``c_cap``.
    (A fixed one-row-per-column table silently dropped all but K points
    of dense columns — e.g. a horizontal cloth stacks thousands of
    points into a handful of (x, y) columns.)

    Cost note (TPU v5e): ONE multi-operand ``lax.sort`` + two P-sized
    unique-index scatters.  Per-particle row/slot come from segmented
    cumsums riding the sort (no per-segment tables, no searchsorted —
    P-sized ``jnp.searchsorted`` compiles to ~17 serial gather rounds
    and a second restore sort costs ~1.5 ms at 200k points; the scatter
    formulation measures 6.0 -> 2.6 ms at the 250^3 demo shape)."""
    G = cfg.n_grid
    P = x.shape[0]
    if c_cap is None:
        c_cap = default_col_cap(cfg, P)
    col, sentinel = _bin_key(x, cfg, ztile)
    iota = jnp.arange(P, dtype=jnp.int32)
    # sort 1: by column id, carrying the original index
    sorted_col, perm = jax.lax.sort((col, iota), num_keys=1)
    flags = jnp.concatenate([jnp.ones((1,), jnp.int32),
                             (sorted_col[1:] != sorted_col[:-1])
                             .astype(jnp.int32)])
    # in-column rank = distance to the segment's first position (a
    # running max over flagged positions)
    seg_start = jax.lax.cummax(jnp.where(flags > 0, iota, 0))
    rank_sorted = iota - seg_start
    # rows of all earlier segments, per particle: each segment START
    # contributes ceil(prev_segment_count / K) rows; an inclusive cumsum
    # of those contributions IS row_off[segment_of_p].  (At p=0 the
    # previous count is 0, so no special case.)
    prev_start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  seg_start[:-1]])
    prev_count = iota - prev_start
    contrib = jnp.where(flags > 0, (prev_count + K - 1) // K, 0)
    row_base = jnp.cumsum(contrib).astype(jnp.int32)
    row_of_p = row_base + rank_sorted // K
    slot_of_p = rank_sorted % K
    # rows >= segments, so row_of_p < c_cap implies segment < c_cap:
    # the row cap is the only overflow condition.
    ok = row_of_p < c_cap
    rank_capped = jnp.where(ok, slot_of_p, K + 1).astype(jnp.int32)
    row_capped = jnp.clip(row_of_p, 0, c_cap - 1).astype(jnp.int32)

    # pid table: ONE P-sized scatter into the (c_cap, K) slot table
    # (replaces a 2x slower C*K flat gather); overflow particles get an
    # out-of-bounds index and mode="drop" discards them — in-bounds
    # indices stay unique, so unique_indices=True holds without the UB
    # of several particles sharing one dump slot.
    pos = jnp.where(ok, row_of_p * K + slot_of_p, c_cap * K)
    pid = jnp.full((c_cap * K,), P, jnp.int32).at[pos].set(
        perm, unique_indices=True, mode="drop").reshape(c_cap, K)
    valid = pid < P
    # slot 0 of every live row is always filled (chunk c exists only if
    # the column holds > c*K points), so the row's column id is the bin
    # key of its first member; empty rows hit the padded sentinel.
    col_pad = jnp.concatenate(
        [col, jnp.full((1,), sentinel, jnp.int32)])
    active_col = col_pad[jnp.minimum(pid[:, 0], P)]

    # per-particle (row, slot) restored to original order: a packed
    # int32 scatter inverting the sort permutation (rank <= K+1, so the
    # pack holds for any c_cap < 2^31 / (K+2); div-by-constant unpack
    # compiles to a multiply-shift).
    packed = rank_capped * jnp.int32(c_cap) + row_capped
    unpacked = jnp.zeros((P,), jnp.int32).at[perm].set(
        packed, unique_indices=True, mode="promise_in_bounds")
    rank_of_p = unpacked // jnp.int32(c_cap)
    cidx_of_p = unpacked % jnp.int32(c_cap)
    overflow = jnp.sum((rank_capped >= K).astype(jnp.int32))
    return ColumnBins(active_col=active_col, pid=pid, valid=valid,
                      cidx_of_p=cidx_of_p,
                      rank_of_p=rank_of_p, overflow=overflow)


def _packed_gather(arr, pid, fill=0.0):
    """Gather per-particle array into (C, K, ...) with sentinel fill."""
    padded = jnp.concatenate(
        [arr, jnp.full((1,) + arr.shape[1:], fill, arr.dtype)], 0)
    return padded[pid]


def _z_weights(fz, inv_dx):
    """Quadratic B-spline z weights/derivatives (shared by the full-Gz
    and windowed z-basis builders so the stencil formulas cannot
    drift)."""
    wa = 1.5 - fz
    wb = fz - 1.0
    wc = fz - 0.5
    wz = jnp.stack([0.5 * wa * wa, 0.75 - wb * wb, 0.5 * wc * wc], -1)
    dwz = jnp.stack([fz - 1.5, -2.0 * (fz - 1.0), fz - 0.5], -1) * inv_dx
    return wz, dwz


def _z_bases(px_z, base_z, cfg, Gz):
    """Three z-basis tensors (C, K, 3, Gz).

    Z0[.., z] = wz(z), Z1 = dpos_z_unitless(z) * wz(z), Z2 = dwz(z) where
    dpos_z_unitless = (z - base_z) - fz."""
    inv_dx = cfg.inv_dx
    gz = px_z * inv_dx
    fz = gz - base_z.astype(px_z.dtype)
    wz, dwz = _z_weights(fz, inv_dx)

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
    return jnp.stack([z0, z1, z2], axis=-2)  # (C, K, 3, Gz)


def _z_bases_win(px_z, base_z, cfg, tile):
    """Windowed z-basis (C, K, 3, _ZW): same three basis rows as
    _z_bases but indexed z-local to the row's tile window
    [tile*_ZH, tile*_ZH + _ZW).  Taps outside the window (points whose
    base-z was clipped into the tile) get zero weight, matching the
    no-hit behavior of the full-Gz one-hot."""
    inv_dx = cfg.inv_dx
    gz = px_z * inv_dx
    fz = gz - base_z.astype(px_z.dtype)
    wz, dwz = _z_weights(fz, inv_dx)

    zloc = base_z - (tile * _ZH)[:, None]       # (C, K) window-local
    zline = jnp.arange(_ZW, dtype=jnp.int32)
    z0 = jnp.zeros(px_z.shape + (_ZW,), px_z.dtype)
    z1 = jnp.zeros_like(z0)
    z2 = jnp.zeros_like(z0)
    for o in range(3):
        hit = (zline[None, None, :] == (zloc + o)[..., None])
        hitf = hit.astype(px_z.dtype)
        z0 = z0 + hitf * wz[..., o, None]
        z1 = z1 + hitf * ((float(o) - fz) * wz[..., o])[..., None]
        z2 = z2 + hitf * dwz[..., o, None]
    return jnp.stack([z0, z1, z2], axis=-2)  # (C, K, 3, _ZW)


def shift_set(radius: int = 1):
    """Per-axis column shifts covering binned-column drift of
    +/-(radius-1) cells: offsets in [-(radius-1), radius+1]."""
    rng = range(-(radius - 1), radius + 2)
    return [(i, j) for i in rng for j in rng]


class PackedGeometry(NamedTuple):
    """Per-slot stencil geometry shared by p2g and g2p in one substep.

    With ``radius > 1`` (amortized rebinning) the shift axis S grows to
    (2*radius+1)^2 and weights are computed relative to the particle's
    CURRENT base cell, masked to its own 3-tap stencil."""
    px: jnp.ndarray     # (C, K, 3)
    base: jnp.ndarray   # (C, K, 3) int32
    zb: jnp.ndarray     # (C, K, 3, Gz)
    wxy: jnp.ndarray    # (C, K, S)
    dxwy: jnp.ndarray
    wxdy: jnp.ndarray
    dpx: jnp.ndarray
    dpy: jnp.ndarray


def pack_geometry(cfg: MPMStaticConfig, x, bins: ColumnBins,
                  radius: int = 1, zb_dtype=None,
                  ztile: bool = False) -> "PackedGeometry":
    px = _packed_gather(x, bins.pid)
    base = jnp.floor(px * cfg.inv_dx - 0.5).astype(jnp.int32)
    G = cfg.n_grid
    if ztile:
        T = n_ztiles(G)
        colxy = bins.active_col // T
        zb = _z_bases_win(px[..., 2], base[..., 2], cfg,
                          bins.active_col % T)
    else:
        colxy = bins.active_col
        zb = _z_bases(px[..., 2], base[..., 2], cfg, cfg.n_grid)
    if zb_dtype is not None:
        # bf16 mode: the z-basis is by far the largest per-substep tensor
        # (C*K*3*Gz); storing it half-width halves its HBM traffic in
        # both transfer einsums.
        zb = zb.astype(zb_dtype)
    cb = jnp.stack([colxy // G, colxy % G], -1)[:, None, :]  # (C, 1, 2)
    wxy, dxwy, wxdy, dpx, dpy = _xy_weights(px[..., :2], base[..., :2],
                                            cfg, cb, radius)
    return PackedGeometry(px, base, zb, wxy, dxwy, wxdy, dpx, dpy)


def _xy_weights(px_xy, base_xy, cfg, col_xy, radius: int = 1):
    """Per-shift in-plane weights/derivatives; all (C, K, S).

    ``col_xy`` is the BINNED column of each slot; shift s targets column
    col + s, which is the particle's own tap o = s - (base - col).  Taps
    outside [0, 2] get zero weight (drift beyond radius-1 drops the
    particle — monitored via ColumnBins.overflow at rebin time)."""
    inv_dx = cfg.inv_dx
    g = px_xy * inv_dx
    f = g - base_xy.astype(px_xy.dtype)
    wa = 1.5 - f
    wb = f - 1.0
    wc = f - 0.5
    w = jnp.stack([0.5 * wa * wa, 0.75 - wb * wb, 0.5 * wc * wc], -1)
    dw = jnp.stack([f - 1.5, -2.0 * (f - 1.0), f - 0.5], -1) * inv_dx
    drift = base_xy - col_xy                      # (C, K, 2) int32

    def axis_terms(axis, s):
        o = s - drift[..., axis]                  # tap index, may be oob
        wv = jnp.zeros_like(f[..., axis])
        dv = jnp.zeros_like(f[..., axis])
        for q in range(3):
            hit = (o == q).astype(wv.dtype)
            wv = wv + hit * w[..., axis, q]
            dv = dv + hit * dw[..., axis, q]
        dp = o.astype(f.dtype) - f[..., axis]
        return wv, dv, dp

    outs = []
    for (i, j) in shift_set(radius):
        wx, dwx, dpx = axis_terms(0, i)
        wy, dwy, dpy = axis_terms(1, j)
        outs.append((wx * wy, dwx * wy, wx * dwy, dpx, dpy))
    stack = lambda n: jnp.stack([o[n] for o in outs], -1)
    return stack(0), stack(1), stack(2), stack(3), stack(4)


class HaloGrid(NamedTuple):
    """Packed halo-column ("sparse") grid addressing.

    ``hcols`` is the sorted unique DILATED active-column set: every
    (x, y) grid column any pack row can scatter to or gather from this
    substep.  Grid fields are stored packed as (H, Gz, ch) rows indexed
    by halo id — the dense (G^2, Gz, ch) grid never materializes, so
    every grid pass, splat fold and G2P gather scales with the occupied
    columns instead of G^2.  Only cells a particle reads matter for the
    final state, so collider/mover splats to non-halo columns are
    physically irrelevant and dropped exactly.

    Replaces the reference's dense grid allocation (MPMStateStruct.
    init_grid, /root/reference/warp_mpm/mpm_data_structure.py:136) with
    an active-block structure sized to the scene, not the domain."""
    hcols: jnp.ndarray     # (H,) sorted unique flat xy ids; pad = G*G
    htargets: jnp.ndarray  # (C, S) halo row per pack-row/shift; H = drop
    lut: jnp.ndarray       # (G*G+1,) flat xy id -> halo row (H = drop)
    n_h: jnp.ndarray       # () int32 live halo columns (<= H)
    overflow: jnp.ndarray  # () int32 unique halo columns beyond the cap


def build_halo(bins: ColumnBins, cfg: MPMStaticConfig, radius: int,
               h_cap: int) -> HaloGrid:
    """Sorted-unique dilation of the active column set.

    One C*S-candidate sort + ONE h_cap-row scatter building a dense
    (G^2+1,) inverse lookup; every column->halo map (P2G fold, G2P
    gather, mesh/mover splats) is then a single gather.  (The first
    version mapped with jnp.searchsorted, which compiles to ~12 SERIAL
    gather rounds per map on TPU — the same trap ROUND_NOTES documents
    for build_bins.)"""
    G = cfg.n_grid
    sentinel = G * G
    tcols = _shift_columns(bins, G, radius)              # (C, S)
    cand = jax.lax.sort(tcols.reshape(-1))
    flags = jnp.concatenate([jnp.ones((1,), bool),
                             cand[1:] != cand[:-1]])
    n_h = jnp.sum((flags & (cand < sentinel)).astype(jnp.int32))
    # compaction by sort-select: demote duplicates to a beyond-sentinel
    # key and re-sort — unique reals land in the first n_h slots already
    # sorted.  (searchsorted compaction compiles to ~15 serial gather
    # rounds; a second small sort is cheaper on TPU.)
    keys = jnp.where(flags & (cand < sentinel), cand, sentinel + 1)
    if keys.shape[0] < h_cap:
        keys = jnp.concatenate([keys, jnp.full((h_cap - keys.shape[0],),
                                               sentinel + 1, keys.dtype)])
    ar = jnp.arange(h_cap)
    hcols = jnp.minimum(jax.lax.sort(keys)[:h_cap], sentinel)
    overflow = jnp.maximum(n_h - h_cap, 0)
    # dense inverse lookup: pad rows write to sentinel+1 (OOB, dropped)
    # so lut[sentinel] stays = h_cap (the drop row)
    widx = jnp.where(ar < n_h, hcols, sentinel + 1)
    lut = jnp.full((sentinel + 1,), h_cap, jnp.int32).at[widx].set(
        ar.astype(jnp.int32), mode="drop")
    htargets = lut[tcols]
    return HaloGrid(hcols=hcols, htargets=htargets, lut=lut,
                    n_h=jnp.minimum(n_h, h_cap), overflow=overflow)


@partial(jax.jit, static_argnums=(1, 2))
def count_halo(x: jnp.ndarray, cfg: MPMStaticConfig, radius: int):
    """Exact halo-column count for the current positions — the adaptive
    halo-cap probe (once per frame on the host)."""
    G = cfg.n_grid
    col, sentinel = _bin_key(x, cfg, False)
    cx, cy = col // G, col % G
    cands = []
    for (i, j) in shift_set(radius):
        tx, ty = cx + i, cy + j
        bad = (tx < 0) | (ty < 0) | (tx >= G) | (ty >= G)
        cands.append(jnp.where(bad, sentinel, tx * G + ty))
    cand = jax.lax.sort(jnp.concatenate(cands))
    flags = jnp.concatenate([jnp.ones((1,), bool),
                             cand[1:] != cand[:-1]])
    return jnp.sum((flags & (cand < sentinel)).astype(jnp.int32))


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def count_rows_and_halo(x: jnp.ndarray, cfg: MPMStaticConfig, K: int,
                        ztile: bool, radius: int):
    """Fused per-frame cap probe: (4,) int32
    [pack rows, halo columns, z base-cell min, z base-cell max].

    One device computation and ONE host transfer — on a tunneled
    runtime each separate readback costs a full round trip (~40 ms),
    which dominates an otherwise ~17 ms/substep frame when probed
    per frame."""
    zb = jnp.clip(jnp.floor(x[:, 2] * cfg.inv_dx - 0.5).astype(jnp.int32),
                  0, cfg.n_grid - 1)
    return jnp.stack([count_rows(x, cfg, K, ztile),
                      count_halo(x, cfg, radius),
                      jnp.min(zb), jnp.max(zb)])


def halo_cell_ids(halo: HaloGrid, G: int, z_lo=0, g_z=None):
    """Dense flat cell id per packed cell, (H*Gz,) int32 (pad rows get
    ids >= G^3 — they carry zero mass and are never gathered).  With a
    z-window, Gz = ``g_z`` cells starting at absolute cell ``z_lo``."""
    g_z = G if g_z is None else g_z
    return (halo.hcols[:, None] * G + z_lo
            + jnp.arange(g_z, dtype=jnp.int32)[None, :]).reshape(-1)


def halo_coords(halo: HaloGrid, cfg: MPMStaticConfig, dtype,
                z_lo=0, g_z=None):
    """(idx (H*Gz, 3) int32, pos (H*Gz, 3)) for the packed halo grid —
    the sparse sibling of stepping._grid_coords for grid BCs.  ``idx``
    holds ABSOLUTE cell coordinates also under a z-window."""
    G = cfg.n_grid
    g_z = G if g_z is None else g_z
    hx = (halo.hcols // G).astype(jnp.int32)
    hy = (halo.hcols % G).astype(jnp.int32)
    z = z_lo + jnp.arange(g_z, dtype=jnp.int32)
    idx = jnp.stack([jnp.repeat(hx, g_z),
                     jnp.repeat(hy, g_z),
                     jnp.tile(z, halo.hcols.shape[0])], -1)
    return idx, idx.astype(dtype) * cfg.dx


def _shift_columns(bins: ColumnBins, G: int, radius: int = 1,
                   ztile: bool = False):
    """Target bin ids per shift; sentinel (= number of bins) for
    out-of-range or inactive bins.  Returns (C, S) int32.  Shifts move
    in (x, y) only; the z tile rides along unchanged."""
    T = n_ztiles(G) if ztile else 1
    sentinel = G * G * T
    ac = bins.active_col
    colxy = ac // T
    tile = ac % T
    cx = colxy // G
    cy = colxy % G
    inactive = ac >= sentinel
    cols = []
    for (i, j) in shift_set(radius):
        tx = cx + i
        ty = cy + j
        bad = inactive | (tx < 0) | (ty < 0) | (tx >= G) | (ty >= G)
        cols.append(jnp.where(bad, sentinel, (tx * G + ty) * T + tile))
    return jnp.stack(cols, 1)


def _scatter_columns(out, bins, G, n_ch, radius: int = 1,
                     ztile: bool = False, halo: HaloGrid = None):
    """Place (C, W, n_ch, S) shift results into a (G*G, G, n_ch) grid
    via S row scatters of C rows each (row-serial scatter cost is
    bounded by the row cap, not the particle count).  Duplicate rows of
    a chunked bin accumulate through the scatter-add.

    With ``halo``, the fold lands in the PACKED (H, G, n_ch) halo grid
    instead (targets precomputed in halo.htargets; H = drop).

    Without z tiles, W == Gz and rows are whole grid columns.  With
    z tiles, W == _ZW windows land in a (G*G*T, _ZW) fine grid and are
    folded into dense columns: window cell w of tile t is z = t*_ZH + w,
    so the 2-cell tail of each tile overlaps the head of the next and
    the fold adds them (z >= G spill from the last tile is sliced off,
    matching the no-hit drop of the full-Gz one-hot)."""
    if halo is not None:
        assert not ztile
        H = halo.hcols.shape[0]
        grid = jnp.zeros((H, out.shape[1], n_ch), out.dtype)
        for s in range(halo.htargets.shape[1]):
            grid = grid.at[halo.htargets[:, s]].add(out[..., s],
                                                    mode="drop")
        return grid
    targets = _shift_columns(bins, G, radius, ztile)
    T = n_ztiles(G) if ztile else 1
    # no sentinel row: the sentinel id == size is out-of-bounds and
    # mode="drop" discards it — a +1 row would force a full-grid slice
    # copy afterwards
    grid = jnp.zeros((G * G * T, out.shape[1], n_ch), out.dtype)
    for s in range(targets.shape[1]):
        grid = grid.at[targets[:, s]].add(out[..., s], mode="drop")
    if not ztile:
        return grid
    fine = grid.reshape(G * G, T, _ZW, n_ch)
    main = fine[:, :, :_ZH]
    ov = jnp.pad(fine[:, :-1, _ZH:],
                 ((0, 0), (1, 0), (0, _ZH - (_ZW - _ZH)), (0, 0)))
    return (main + ov).reshape(G * G, T * _ZH, n_ch)[:, :G]


@partial(jax.jit, static_argnums=(0, 4, 7, 9, 10))
def p2g_columns(cfg: MPMStaticConfig, state: MPMState, stress, vertex_force,
                K: int, bins: ColumnBins = None, c_eff=None,
                radius: int = 1, geom: PackedGeometry = None,
                bf16: bool = False, ztile: bool = False,
                halo: HaloGrid = None):
    """Column-packed P2G; exact replacement for stepping.p2g.

    ``stress`` and ``vertex_force`` must be pre-scaled by dt*selection;
    ``c_eff`` is the RPIC-damped affine field (defaults to state.C).
    Returns (grid_v_in (G^3, 3), grid_m (G^3,)); with ``halo`` the
    grids are PACKED (H*Gz, .) halo rows instead."""
    E, T, V = cfg.n_elements, cfg.n_traditional, cfg.n_vertices
    P = cfg.n_particles
    G = cfg.n_grid
    dx = cfg.dx
    dtype = state.x.dtype
    if bins is None:
        bins = build_bins(state.x, cfg, K, ztile=ztile)
    pid, valid = bins.pid, bins.valid

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

    if geom is None:
        geom = pack_geometry(cfg, state.x, bins, radius=radius,
                             ztile=ztile)
    # ONE fused (C, K)-row gather of all per-particle attributes —
    # TPU gathers are row-latency-bound, so 7 separate gathers of the
    # same 196k slots cost ~7x one 27-wide gather.
    attr = jnp.concatenate(
        [state.v,
         (state.C if c_eff is None else c_eff).reshape(P, 9),
         mass[:, None], sel[:, None],
         stress_eff.reshape(P, 9), vforce, is_vertex[:, None]], axis=1)
    pattr = _packed_gather(attr, pid)                    # (C, K, 27)
    pv = pattr[..., 0:3]
    pC = pattr[..., 3:12].reshape(pattr.shape[:2] + (3, 3))
    pmass = pattr[..., 12] * valid
    psel = pattr[..., 13] * valid
    pstress = pattr[..., 14:23].reshape(pattr.shape[:2] + (3, 3))
    pvf = pattr[..., 23:26]
    pisv = pattr[..., 26]

    zb = geom.zb
    wxy, dxwy, wxdy, dpx, dpy = (geom.wxy, geom.dxwy, geom.wxdy,
                                 geom.dpx, geom.dpy)

    mC = pmass[..., None, None] * pC                     # (C,K,3,3)
    mv = pmass[..., None] * pv                           # (C,K,3)

    S = wxy.shape[-1]
    # alpha (Z0): momentum + in-plane APIC + in-plane force parts
    apic_xy = (mC[..., :, 0, None] * dpx[..., None, :]
               + mC[..., :, 1, None] * dpy[..., None, :]) * dx
    mom_alpha = (mv[..., :, None] + apic_xy) * wxy[..., None, :]
    f_vert = (pisv[..., None, None] * pvf[..., :, None]
              * wxy[..., None, :])
    not_v = (1.0 - pisv)
    f_alpha = f_vert - (pstress[..., :, 0, None] * dxwy[..., None, :]
                        + pstress[..., :, 1, None] * wxdy[..., None, :]) \
        * not_v[..., None, None]
    alpha_mom = mom_alpha + f_alpha                      # (C,K,3,S)
    alpha_mass = pmass[..., None] * wxy                  # (C,K,S)
    alpha = jnp.concatenate([alpha_mom,
                             alpha_mass[..., None, :]], axis=-2)

    beta_mom = mC[..., :, 2, None] * dx * wxy[..., None, :]
    beta = jnp.concatenate([beta_mom,
                            jnp.zeros_like(alpha_mass)[..., None, :]],
                           axis=-2)

    gamma_mom = -pstress[..., :, 2, None] * wxy[..., None, :] \
        * not_v[..., None, None]
    gamma = jnp.concatenate([gamma_mom,
                             jnp.zeros_like(alpha_mass)[..., None, :]],
                            axis=-2)

    m3 = psel[..., None, None]
    coeff = jnp.stack([alpha * m3, beta * m3, gamma * m3], axis=2)
    C_cap = pid.shape[0]
    coeff = coeff.reshape(C_cap, K * 3, 4 * S)
    W = _ZW if ztile else G
    zmat = zb.reshape(C_cap, K * 3, W)

    if bf16:
        # half-precision operands, f32 accumulation: 2x MXU throughput,
        # ~3 decimal digits on the transfer (visual-fidelity mode).
        out = jnp.einsum("cmz,cmn->czn", zmat.astype(jnp.bfloat16),
                         coeff.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum("cmz,cmn->czn", zmat, coeff)     # (C, W, 4*S)
    out = out.reshape(C_cap, W, 4, S)

    grid = _scatter_columns(out, bins, G, 4, radius, ztile,
                            halo=halo)  # (G*G | H, Gz, 4)
    grid = grid.reshape(-1, 4)
    return grid[:, :3], grid[:, 3]


@partial(jax.jit, static_argnums=(0, 3, 5, 7, 8))
def g2p_columns(cfg: MPMStaticConfig, state: MPMState, grid_v_out, K: int,
                bins: ColumnBins = None, radius: int = 1,
                geom: PackedGeometry = None, bf16: bool = False,
                ztile: bool = False, halo: HaloGrid = None):
    """Column-packed G2P gather; returns per-particle (new_v (P,3),
    new_C (P,3,3), grad_v (P,3,3)) in ORIGINAL particle order.
    With ``halo``, ``grid_v_out`` is the packed (H*Gz, 3) halo grid."""
    G = cfg.n_grid
    P = cfg.n_particles
    dtype = state.x.dtype
    if bins is None:
        bins = build_bins(state.x, cfg, K, ztile=ztile)
    pid, valid = bins.pid, bins.valid
    C_cap = pid.shape[0]

    if geom is None:
        geom = pack_geometry(cfg, state.x, bins, radius=radius,
                             ztile=ztile)
    zb = geom.zb
    wxy, dxwy, wxdy, dpx, dpy = (geom.wxy, geom.dxwy, geom.wxdy,
                                 geom.dpx, geom.dpy)
    S = wxy.shape[-1]

    grid = grid_v_out.reshape(-1, G, 3)
    if ztile:
        # fine view: row (colxy, tile) holds the tile's _ZW-cell window
        # (one bulk static-index gather; ~25% duplicated cells)
        T = n_ztiles(G)
        warange = jnp.arange(T * _ZW, dtype=jnp.int32)
        tz = (warange // _ZW) * _ZH + (warange % _ZW)
        zmask = (tz < G)[None, :, None].astype(dtype)
        fine = grid[:, jnp.clip(tz, 0, G - 1), :] * zmask
        grid_rows = fine.reshape(G * G * T, _ZW, 3)
        W = _ZW
        nrows = G * G * T
    else:
        grid_rows = grid
        W = G
        nrows = grid.shape[0]
    # clip-gather + mask instead of a sentinel row: the concat would
    # copy the whole grid just to add one zero row
    if halo is not None:
        tcols = halo.htargets                            # (C, S)
    else:
        tcols = _shift_columns(bins, G, radius, ztile)   # (C, S)
    good = (tcols < nrows)[..., None, None].astype(dtype)
    gcols = grid_rows[jnp.clip(tcols, 0, nrows - 1)] * good

    zmat = zb.reshape(C_cap, K * 3, W)
    g_all = gcols.transpose(0, 2, 1, 3).reshape(C_cap, W, S * 3)
    if bf16:
        acc = jnp.einsum("cmz,czn->cmn", zmat.astype(jnp.bfloat16),
                         g_all.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    else:
        acc = jnp.einsum("cmz,czn->cmn", zmat, g_all)
    acc = acc.reshape(C_cap, K, 3, S, 3)                 # (C,K,basis,S,3)

    v0 = acc[..., 0, :, :]   # (C,K,S,3)
    v1 = acc[..., 1, :, :]
    v2 = acc[..., 2, :, :]

    inv_dx = cfg.inv_dx
    wxy_e = wxy[..., :, None]
    new_v = jnp.sum(wxy_e * v0, axis=2)
    dxy = jnp.stack([dpx, dpy], -1)                      # (C,K,S,2)
    c_xy = jnp.einsum("cksa,cksb->ckab", wxy_e * v0, dxy)
    c_z = jnp.sum(wxy_e * v1, axis=2)
    new_c = 4.0 * inv_dx * jnp.concatenate(
        [c_xy, c_z[..., :, None]], axis=-1)
    gx = jnp.sum(dxwy[..., :, None] * v0, axis=2)
    gy = jnp.sum(wxdy[..., :, None] * v0, axis=2)
    gz = jnp.sum(wxy_e * v2, axis=2)
    grad_v = jnp.stack([gx, gy, gz], axis=-1)

    cidx = bins.cidx_of_p
    rank = jnp.clip(bins.rank_of_p, 0, K - 1)
    in_table = (bins.rank_of_p < K)

    # one fused (P,)-row unpack gather (v 3 + C 9 + grad 9 = 21 wide)
    packed = jnp.concatenate(
        [new_v, new_c.reshape(C_cap, K, 9), grad_v.reshape(C_cap, K, 9)],
        axis=-1)
    vals = packed[cidx, rank]
    vals = jnp.where(in_table[:, None], vals, 0.0)
    return (vals[:, 0:3], vals[:, 3:12].reshape(P, 3, 3),
            vals[:, 12:21].reshape(P, 3, 3))


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def splat_columns(cfg: MPMStaticConfig, points, values, K: int,
                  bounds_check: bool = True, c_cap: Optional[int] = None,
                  halo: HaloGrid = None):
    """Generic w-weighted splat: scatter-free replacement for
    core.stepping.rasterize_to_grid (mesh collider / particle mover).
    Returns (grid_vals (G^3, C), grid_w (G^3,), overflow ()) — overflow
    counts points dropped by the K-slot / column caps (dropped collider
    faces distort contact normals, so callers must surface it).

    With ``halo`` the splat lands in the PACKED (H*Gz, .) halo grid;
    contributions to columns outside the halo set are dropped exactly
    (no particle reads those cells) and do NOT count as overflow."""
    G = cfg.n_grid
    Cch = values.shape[-1]
    bins = build_bins(points, cfg, K, c_cap=c_cap)
    pid, valid = bins.pid, bins.valid
    C_cap = pid.shape[0]

    pp = _packed_gather(points, pid)
    pvals = _packed_gather(values, pid)
    base = jnp.floor(pp * cfg.inv_dx - 0.5).astype(jnp.int32)
    ok = valid.astype(pp.dtype)
    if bounds_check:
        inb = jnp.all((base >= 0) & (base < G - 3), axis=-1)
        ok = ok * inb.astype(pp.dtype)

    zb = _z_bases(pp[..., 2], base[..., 2], cfg, G)
    z0 = zb[..., 0, :]
    col = bins.active_col
    cbl = jnp.stack([col // G, col % G], -1)[:, None, :]
    wxy, _, _, _, _ = _xy_weights(pp[..., :2], base[..., :2], cfg, cbl)

    vals1 = jnp.concatenate(
        [pvals, jnp.ones(pvals.shape[:-1] + (1,), pvals.dtype)], -1)
    coeff = (wxy * ok[..., None])[..., :, None] * vals1[..., None, :]
    S = wxy.shape[-1]
    coeff = coeff.transpose(0, 1, 3, 2).reshape(C_cap, K, (Cch + 1) * S)
    out = jnp.einsum("ckz,ckn->czn", z0, coeff)
    out = out.reshape(C_cap, G, Cch + 1, S)

    shalo = None
    if halo is not None:
        shalo = halo._replace(
            htargets=halo.lut[_shift_columns(bins, G, 1)])
    grid = _scatter_columns(out, bins, G, Cch + 1, halo=shalo)
    grid = grid.reshape(-1, Cch + 1)
    return grid[:, :Cch], grid[:, Cch], bins.overflow


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
