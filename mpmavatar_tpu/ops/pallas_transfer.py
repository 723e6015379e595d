"""Pallas-fused column P2G/G2P transfer kernels.

The XLA column path (ops.column_transfer) materializes the z-basis
tensor (C*K*3*G floats — ~300 MB at bench scale), the xy-weight tables
and the coefficient tensor in HBM between elementwise passes and the
transfer einsums; the profile shows those round-trips cost ~3-5x the
matmuls themselves.  These kernels build basis + weights + coefficients
in VMEM per column block and feed the MXU directly — the only HBM
traffic is the packed inputs and the (C, G, 4S) output.

Design notes:
  * One jnp "math" function per transfer defines the computation; it is
    traced INSIDE the Pallas kernel for the fused forward and in plain
    XLA for the custom-VJP backward — single source of truth, exact
    parity with ops.column_transfer by construction
    (tests/test_pallas_transfer.py).
  * Row basis is basis-major (m = basis*K + k) and the output/gather
    channel axis is channel-major (n = ch*S + s) so the kernel needs no
    lane-dimension reshapes (Mosaic-friendly static concats/slices).
  * Differentiable via jax.custom_vjp: backward re-traces the jnp math
    with jax.vjp (gradients flow to positions, velocities, stresses and
    grid velocities exactly as in the XLA path).

Replaces the inner loop of the reference Warp kernels p2g_apic_with_stress
/ g2p (/root/reference/warp_mpm/mpm_utils.py:455-557,575-660) on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import MPMStaticConfig
from .column_transfer import (ColumnBins, _packed_gather, _scatter_columns,
                              _shift_columns, shift_set)


def _axis_weights(f, inv_dx):
    """Quadratic B-spline weights / derivatives per tap, as LISTS of
    (…,) arrays — Mosaic lowers ``stacked[..., o, None]`` to a gather it
    rejects ("Only 2D gather is supported"), so taps stay unstacked."""
    wa = 1.5 - f
    wb = f - 1.0
    wc = f - 0.5
    w = [0.5 * wa * wa, 0.75 - wb * wb, 0.5 * wc * wc]
    dw = [(f - 1.5) * inv_dx, -2.0 * (f - 1.0) * inv_dx,
          (f - 0.5) * inv_dx]
    return w, dw


def _tap_select(o, taps):
    """taps[o] with float o in {0.,1.,2.} (out-of-range -> 0),
    branch-free."""
    out = jnp.zeros_like(taps[0])
    for q in range(3):
        out = out + (o == float(q)).astype(taps[0].dtype) * taps[q]
    return out


def _geometry(px_t, colxy, inv_dx, G, shifts):
    """Shared stencil geometry for one block, slot-lane layout.

    px_t (B, 3, K) positions (channel rows, slot lanes), colxy (B, 2)
    binned column.  Returns (zmat (B, 3K, G) basis-major, wxy/dxwy/wxdy/
    dpx/dpy each (B, S, K)).  Keeping K on the lane axis is the whole
    game: with S trailing, every per-shift elementwise op padded 9 lanes
    to 128 (the round-1 kernel lost to XLA on exactly this).
    """
    B, K = px_t.shape[0], px_t.shape[2]
    g = px_t * inv_dx
    base = jnp.floor(g - 0.5)
    f = g - base                                       # (B, 3, K)
    fx, fy, fz = f[:, 0, :], f[:, 1, :], f[:, 2, :]    # (B, K)
    wx, dwx = _axis_weights(fx, inv_dx)
    wy, dwy = _axis_weights(fy, inv_dx)
    wz, dwz = _axis_weights(fz, inv_dx)

    # z basis (B, 3K, G): rows basis-major (m = basis*K + k)
    base_z = base[:, 2, :]                             # (B, K) float
    zline = jax.lax.broadcasted_iota(jnp.int32, (B, K, G), 2)
    hit = [(zline == (base_z + o)[..., None].astype(jnp.int32))
           .astype(px_t.dtype) for o in range(3)]
    z0 = hit[0] * wz[0][..., None]
    z1 = hit[0] * ((0.0 - fz) * wz[0])[..., None]
    z2 = hit[0] * dwz[0][..., None]
    for o in (1, 2):
        z0 = z0 + hit[o] * wz[o][..., None]
        z1 = z1 + hit[o] * ((float(o) - fz) * wz[o])[..., None]
        z2 = z2 + hit[o] * dwz[o][..., None]
    zmat = jnp.concatenate([z0, z1, z2], axis=1)       # (B, 3K, G)

    driftx = base[:, 0, :] - colxy[:, 0][:, None]      # (B, K) float
    drifty = base[:, 1, :] - colxy[:, 1][:, None]
    wxy_l, dxwy_l, wxdy_l, dpx_l, dpy_l = [], [], [], [], []
    for (i, j) in shifts:
        ox = float(i) - driftx
        oy = float(j) - drifty
        wvx = _tap_select(ox, wx)
        dvx = _tap_select(ox, dwx)
        wvy = _tap_select(oy, wy)
        dvy = _tap_select(oy, dwy)
        wxy_l.append(wvx * wvy)
        dxwy_l.append(dvx * wvy)
        wxdy_l.append(wvx * dvy)
        dpx_l.append(ox - fx)
        dpy_l.append(oy - fy)
    st = lambda lst: jnp.stack(lst, axis=1)            # (B, S, K)
    return zmat, st(wxy_l), st(dxwy_l), st(wxdy_l), st(dpx_l), st(dpy_l)


def _p2g_math(px_t, pattr_t, colxy, inv_dx, dx, G, shifts, bf16):
    """(B,3,K) x (B,27|31,K) -> (B, 4S|8S, G) column contributions.

    pattr_t rows: [v(3), C_eff(9), mass, sel, stress(9), vforce(3),
    is_vertex] pre-scaled exactly as ops.column_transfer.p2g_columns.
    With 31 rows, the extra [jvel(3), jw] rows FUSE the particle-mover
    splat into the same pass: four more Z0-only output channels that
    ride the identical (3K-contraction) matmul — n grows 4S -> 8S but
    both pad to the same 128-lane MXU tile, so the mover's separate
    binning/splat/fold disappears for free.
    Coefficients are assembled directly in the (B, nS, 3K) matmul
    orientation (rows n = ch*S + s, lanes m = basis*K + k) so the
    dot_general against the basis needs no relayout."""
    S = len(shifts)
    with_mover = pattr_t.shape[1] > 27
    zmat, wxy, dxwy, wxdy, dpx, dpy = _geometry(px_t, colxy, inv_dx, G,
                                                shifts)
    row = lambda i: pattr_t[:, i, :][:, None, :]          # (B, 1, K)
    pmass = row(12)
    psel = row(13)
    pisv = row(26)
    not_v = 1.0 - pisv
    msel = pmass * psel

    blocks = []
    for ch in range(3):
        mv = msel * row(0 + ch)
        mC0 = msel * row(3 + 3 * ch + 0)
        mC1 = msel * row(3 + 3 * ch + 1)
        mC2 = msel * row(3 + 3 * ch + 2)
        s0 = psel * not_v * row(14 + 3 * ch + 0)
        s1 = psel * not_v * row(14 + 3 * ch + 1)
        s2 = psel * not_v * row(14 + 3 * ch + 2)
        fv = psel * pisv * row(23 + ch)
        alpha = (mv + (mC0 * dpx + mC1 * dpy) * dx) * wxy \
            + fv * wxy - (s0 * dxwy + s1 * wxdy)          # (B, S, K)
        beta = mC2 * dx * wxy
        gamma = -s2 * wxy
        blocks.append(jnp.concatenate([alpha, beta, gamma], axis=2))
    am = msel * wxy
    zeros = jnp.zeros_like(am)
    blocks.append(jnp.concatenate([am, zeros, zeros], axis=2))
    if with_mover:
        jw = row(30)
        for ch in range(3):
            jv = jw * row(27 + ch) * wxy
            blocks.append(jnp.concatenate([jv, zeros, zeros], axis=2))
        blocks.append(jnp.concatenate([jw * wxy, zeros, zeros], axis=2))
    coeff = jnp.concatenate(blocks, axis=1)               # (B, nS, 3K)

    if bf16:
        zmat = zmat.astype(jnp.bfloat16)
        coeff = coeff.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        coeff, zmat, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # (B, nS, G)


def _g2p_math(px_t, g_all, colxy, inv_dx, G, shifts, bf16):
    """(B,3,K) x (B,3S,G) -> (B, 21, K) = [v(3), C(9), grad_v(9)] rows.

    g_all rows are channel-major (n = ch*S + s) gathered grid columns.
    The batched matmul contracts the G lanes of both operands, so the
    accumulator lands as (B, 3S, 3K) with slots still on lanes and all
    APIC reductions stay (B, S, K)-shaped."""
    S = len(shifts)
    K = px_t.shape[2]
    zmat, wxy, dxwy, wxdy, dpx, dpy = _geometry(px_t, colxy, inv_dx, G,
                                                shifts)
    if bf16:
        acc = jax.lax.dot_general(
            g_all.astype(jnp.bfloat16), zmat.astype(jnp.bfloat16),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # (B, 3S, 3K)
    else:
        acc = jax.lax.dot_general(
            g_all, zmat, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def block(basis, ch):                                 # (B, S, K)
        return acc[:, ch * S:(ch + 1) * S, basis * K:(basis + 1) * K]

    outs = []
    red = lambda w, t: jnp.sum(w * t, axis=1)             # (B, K)
    v0 = [block(0, ch) for ch in range(3)]
    v1 = [block(1, ch) for ch in range(3)]
    v2 = [block(2, ch) for ch in range(3)]
    outs += [red(wxy, v0[ch]) for ch in range(3)]         # new_v
    four = 4.0 * inv_dx
    for ch in range(3):                                   # C rows
        outs.append(four * red(wxy * dpx, v0[ch]))
        outs.append(four * red(wxy * dpy, v0[ch]))
        outs.append(four * red(wxy, v1[ch]))
    for ch in range(3):                                   # grad_v rows
        outs.append(red(dxwy, v0[ch]))
        outs.append(red(wxdy, v0[ch]))
        outs.append(red(wxy, v2[ch]))
    return jnp.stack(outs, axis=1)                        # (B, 21, K)


# ----------------------------------------------------------------------
# pallas_call wrappers
# ----------------------------------------------------------------------
# Outputs are emitted ROW-FLAT 2-D ((C*rows_per_col, lanes)) from ONE
# pallas_call gridded over column blocks — XLA:TPU stack-allocates
# small-leading-dim pallas results in the 16 MB scoped-vmem space
# (several coexisting slab results OOM it); the row-flat layout lands
# in HBM (same trick as ops.pallas_grid_pipeline).


def _p2g_pallas(px_t, pattr_t, colxy_f, inv_dx, dx, G, shifts, bf16,
                block_c, interpret):
    C, n_attr, K = px_t.shape[0], pattr_t.shape[1], px_t.shape[2]
    S = len(shifts)
    bc = _pick_block(C, block_c)
    n = (8 if n_attr > 27 else 4) * S

    def kernel(px_ref, attr_ref, col_ref, out_ref):
        out = _p2g_math(px_ref[...], attr_ref[...], col_ref[...],
                        inv_dx, dx, G, shifts, bf16)      # (bc, nS, G)
        out_ref[...] = out.reshape(bc * n, G)

    out = pl.pallas_call(
        kernel,
        grid=(C // bc,),
        in_specs=[
            pl.BlockSpec((bc, 3, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, n_attr, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc * n, G), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C * n, G), jnp.float32),
        interpret=interpret,
    )(px_t, pattr_t, colxy_f)
    return out.reshape(C, n, G)


def _g2p_pallas(px_t, g_all, colxy_f, inv_dx, G, shifts, bf16, block_c,
                interpret):
    C, _, K = px_t.shape
    S = len(shifts)
    bc = _pick_block(C, block_c)

    def kernel(px_ref, g_ref, col_ref, out_ref):
        out = _g2p_math(px_ref[...], g_ref[...], col_ref[...],
                        inv_dx, G, shifts, bf16)          # (bc, 21, K)
        out_ref[...] = out.reshape(bc * 21, K)

    out = pl.pallas_call(
        kernel,
        grid=(C // bc,),
        in_specs=[
            pl.BlockSpec((bc, 3, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 3 * S, G), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc * 21, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C * 21, K), jnp.float32),
        interpret=interpret,
    )(px_t, g_all, colxy_f)
    return out.reshape(C, 21, K)


# ----------------------------------------------------------------------
# custom-VJP entry points (forward = Pallas, backward = XLA re-trace)
# ----------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _p2g_fused(px, pattr, colxy_f, inv_dx, dx, G, shifts, bf16, block_c,
               interpret):
    return _p2g_pallas(px, pattr, colxy_f, inv_dx, dx, G, shifts, bf16,
                       block_c, interpret)


def _p2g_fused_fwd(px, pattr, colxy_f, inv_dx, dx, G, shifts, bf16,
                   block_c, interpret):
    out = _p2g_pallas(px, pattr, colxy_f, inv_dx, dx, G, shifts, bf16,
                      block_c, interpret)
    return out, (px, pattr, colxy_f)


def _p2g_fused_bwd(inv_dx, dx, G, shifts, bf16, block_c, interpret,
                   res, g):
    px, pattr, colxy_f = res
    _, vjp = jax.vjp(
        lambda a, b: _p2g_math(a, b, colxy_f, inv_dx, dx, G, shifts,
                               bf16), px, pattr)
    dpx, dattr = vjp(g)
    return dpx, dattr, jnp.zeros_like(colxy_f)


_p2g_fused.defvjp(_p2g_fused_fwd, _p2g_fused_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _g2p_fused(px, g_all, colxy_f, inv_dx, G, shifts, bf16, block_c,
               interpret):
    return _g2p_pallas(px, g_all, colxy_f, inv_dx, G, shifts, bf16,
                       block_c, interpret)


def _g2p_fused_fwd(px, g_all, colxy_f, inv_dx, G, shifts, bf16, block_c,
                   interpret):
    out = _g2p_pallas(px, g_all, colxy_f, inv_dx, G, shifts, bf16,
                      block_c, interpret)
    return out, (px, g_all, colxy_f)


def _g2p_fused_bwd(inv_dx, G, shifts, bf16, block_c, interpret, res, g):
    px, g_all, colxy_f = res
    _, vjp = jax.vjp(
        lambda a, b: _g2p_math(a, b, colxy_f, inv_dx, G, shifts, bf16),
        px, g_all)
    dpx, dg = vjp(g)
    return dpx, dg, jnp.zeros_like(colxy_f)


_g2p_fused.defvjp(_g2p_fused_fwd, _g2p_fused_bwd)


# ----------------------------------------------------------------------
# public API (drop-in siblings of column_transfer.p2g_columns/g2p_columns)
# ----------------------------------------------------------------------
def _interpret_default():
    return jax.default_backend() != "tpu"


def _pick_block(c_cap: int, block_c: int) -> int:
    """Largest block <= block_c that divides c_cap; multiples of 8
    (Mosaic block sublane constraint) preferred."""
    block_c = max(8 * (block_c // 8), 1)
    while block_c > 1 and c_cap % block_c:
        block_c //= 2
    return max(block_c, 1)


def pack_positions(state, bins: ColumnBins):
    """(C, 3, K) slot-lane packed positions — shareable between the
    fused P2G and G2P calls of one substep (same bins, same x)."""
    return _packed_gather(state.x, bins.pid,
                          fill=-1e6).transpose(0, 2, 1)


def _zwin_shift(px_t, z_win):
    """Shift packed z into the window frame: z' = z - z_lo*dx.

    ``z_win = (z_shift scalar, Zw static int)`` restricts the grid's z
    extent to Zw cells starting at the per-substep window origin — the
    kernels then build their z basis over Zw lanes instead of G.  Base
    cells land exactly at base - z_lo (the fractional part is shift-
    invariant), so the windowed transfer is bit-identical to the full
    one whenever the particle reach fits the window (the caller counts
    coverage overflow).  Sentinel slots (fill -1e6) stay far negative."""
    if z_win is None:
        return px_t
    z_shift, _ = z_win
    off = jnp.stack([jnp.zeros_like(z_shift), jnp.zeros_like(z_shift),
                     z_shift]).reshape(1, 3, 1)
    return px_t - off


def p2g_columns_fused(cfg: MPMStaticConfig, state, stress, vertex_force,
                      K: int, bins: ColumnBins, c_eff=None,
                      radius: int = 1, bf16: bool = False,
                      block_c: int = 8, interpret=None, px_t=None,
                      return_px: bool = False, halo=None, mover=None,
                      z_win=None):
    """Fused-Pallas p2g_columns (same contract; geometry built in VMEM).

    ``stress``/``vertex_force`` pre-scaled by dt*selection as in
    column_transfer.p2g_columns; ``c_eff`` is the RPIC-damped affine
    field (defaults to state.C).  Returns (grid_v_in (G^3,3), grid_m).

    ``mover=(jvel (P,3), jw (P,))`` fuses the particle-mover splat into
    the same kernel pass (joint particles carry jw=1): the return gains
    (mover_v (N,3), mover_w (N,)) — exact replacement for a separate
    stepping.mover_fields splat."""
    if interpret is None:
        interpret = _interpret_default()
    assert z_win is None or halo is not None, \
        "the z-window needs the packed halo grid"
    block_c = _pick_block(bins.pid.shape[0], block_c)
    E, T, V = cfg.n_elements, cfg.n_traditional, cfg.n_vertices
    P, G, dx = cfg.n_particles, cfg.n_grid, cfg.dx
    dtype = state.x.dtype
    pid = bins.pid

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
    mass = state.mass
    c_use = state.C if c_eff is None else c_eff

    # ONE fused 30-row gather (x + attributes): TPU gathers are
    # row-latency bound (~8 ns per row regardless of width), so a
    # separate position gather costs a full extra pass over the
    # C*K pack rows
    cols = [state.x, state.v, c_use.reshape(P, 9), mass[:, None],
            sel[:, None], stress_eff.reshape(P, 9), vforce,
            is_vertex[:, None]]
    if mover is not None:
        jvel, jw = mover
        cols += [jvel, jw[:, None]]
    attr = jnp.concatenate(cols, axis=1)
    # slot-lane kernel layout: channels on rows, packed slots on lanes
    packed = _packed_gather(attr, pid,
                            fill=0.0).transpose(0, 2, 1)  # (C, 30|34, K)
    if px_t is None:
        # sentinel slots gathered x=0 -> base=-1; their coefficients are
        # zero (mass/sel gathered 0) so the weights never contribute
        px_t = packed[:, 0:3, :]
    pattr_t = packed[:, 3:, :]                            # (C, 27|31, K)
    col = bins.active_col
    colxy_f = jnp.stack([col // G, col % G], -1).astype(dtype)

    shifts = tuple(shift_set(radius))
    g_z = z_win[1] if z_win is not None else G
    out = _p2g_fused(_zwin_shift(px_t, z_win), pattr_t, colxy_f,
                     float(cfg.inv_dx), float(dx), g_z, shifts, bf16,
                     block_c, interpret)
    S = len(shifts)
    nch = 8 if mover is not None else 4
    # (C, nS, Gz) lane-aligned kernel layout -> (C, Gz, n, S) scatter layout
    out = out.reshape(pid.shape[0], nch, S, g_z).transpose(0, 3, 1, 2)
    grid = _scatter_columns(out, bins, G, nch, radius,
                            halo=halo).reshape(-1, nch)
    rets = (grid[:, :3], grid[:, 3])
    if mover is not None:
        rets = rets + (grid[:, 4:7], grid[:, 7])
    if return_px:
        return rets + (px_t,)
    return rets


def g2p_columns_fused(cfg: MPMStaticConfig, state, grid_v_out, K: int,
                      bins: ColumnBins, radius: int = 1,
                      bf16: bool = False, block_c: int = 8,
                      interpret=None, px_t=None, halo=None, z_win=None):
    """Fused-Pallas g2p_columns: returns (new_v, new_C, grad_v) in
    original particle order (same contract as column_transfer).  With
    ``halo``, ``grid_v_out`` is the packed (H*Gz, 3) halo grid
    (Gz = z_win[1] when windowed)."""
    if interpret is None:
        interpret = _interpret_default()
    assert z_win is None or halo is not None, \
        "the z-window needs the packed halo grid"
    block_c = _pick_block(bins.pid.shape[0], block_c)
    G, P = cfg.n_grid, cfg.n_particles
    g_z = z_win[1] if z_win is not None else G
    dtype = state.x.dtype
    pid = bins.pid
    C_cap = pid.shape[0]
    shifts = tuple(shift_set(radius))
    S = len(shifts)

    grid = grid_v_out.reshape(-1, g_z, 3)
    nrows = grid.shape[0]
    # clip-gather + mask instead of a sentinel row (the concat copies
    # the whole grid to add one zero row)
    if halo is not None:
        tcols = halo.htargets                             # (C, S)
    else:
        tcols = _shift_columns(bins, G, radius)           # (C, S)
    good = (tcols < nrows)[..., None, None].astype(dtype)
    gcols = grid[jnp.clip(tcols, 0, nrows - 1)] * good    # (C, S, Gz, 3)
    # channel-major rows (n = ch*S + s), grid z on lanes
    g_all = gcols.transpose(0, 3, 1, 2).reshape(C_cap, 3 * S, g_z)

    if px_t is None:
        px_t = pack_positions(state, bins)                # (C, 3, K)
    col = bins.active_col
    colxy_f = jnp.stack([col // G, col % G], -1).astype(dtype)

    packed = _g2p_fused(_zwin_shift(px_t, z_win), g_all, colxy_f,
                        float(cfg.inv_dx), g_z, shifts, bf16, block_c,
                        interpret).transpose(0, 2, 1)     # (C, K, 21)

    cidx = bins.cidx_of_p
    rank = jnp.clip(bins.rank_of_p, 0, K - 1)
    in_table = (bins.rank_of_p < K)
    vals = packed[cidx, rank]
    vals = jnp.where(in_table[:, None], vals, 0.0)
    new_v = vals[:, 0:3]
    new_c = vals[:, 3:12].reshape(P, 3, 3)
    grad_v = vals[:, 12:21].reshape(P, 3, 3)
    return new_v, new_c, grad_v


# ----------------------------------------------------------------------
# fused splat (mesh-collider / generic w-weighted rasterization)
# ----------------------------------------------------------------------
def _splat_math(px_t, vals_t, colxy, inv_dx, G, shifts):
    """(B,3,K) x (B,CH,K) -> (B, CH*S, G) column contributions.

    Only the Z0 = w(z) basis row is needed (plain w-weighted splat, no
    APIC/force terms): coeff rows are (ch, s)-major, matching the
    (C, G, CH, S) scatter layout after one reshape."""
    S = len(shifts)
    CH = vals_t.shape[1]
    B, K = px_t.shape[0], px_t.shape[2]
    g = px_t * inv_dx
    base = jnp.floor(g - 0.5)
    f = g - base
    fx, fy, fz = f[:, 0, :], f[:, 1, :], f[:, 2, :]
    wx, _ = _axis_weights(fx, inv_dx)
    wy, _ = _axis_weights(fy, inv_dx)
    wz, _ = _axis_weights(fz, inv_dx)

    base_z = base[:, 2, :]
    zline = jax.lax.broadcasted_iota(jnp.int32, (B, K, G), 2)
    z0 = jnp.zeros((B, K, G), px_t.dtype)
    for o in range(3):
        hit = (zline == (base_z + o)[..., None].astype(jnp.int32))
        z0 = z0 + hit.astype(px_t.dtype) * wz[o][..., None]

    driftx = base[:, 0, :] - colxy[:, 0][:, None]
    drifty = base[:, 1, :] - colxy[:, 1][:, None]
    wxy_l = []
    for (i, j) in shifts:
        wxy_l.append(_tap_select(float(i) - driftx, wx)
                     * _tap_select(float(j) - drifty, wy))
    wxy = jnp.stack(wxy_l, axis=1)                        # (B, S, K)

    coeff = jnp.concatenate(
        [vals_t[:, ch, :][:, None, :] * wxy for ch in range(CH)],
        axis=1)                                           # (B, CH*S, K)
    return jax.lax.dot_general(
        coeff, z0, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # (B, CH*S, G)


def splat_columns_fused(cfg: MPMStaticConfig, points, values, K: int,
                        bounds_check: bool = True, c_cap=None,
                        block_c: int = 8, interpret=None, halo=None,
                        z_win=None):
    """Fused-Pallas sibling of column_transfer.splat_columns (same
    contract): returns (grid_vals (G^3, CH), grid_w (G^3,), overflow).

    Forward-only (the mesh-collider splat consumes mesh_x/mesh_v which
    are rollout inputs, not trained parameters) — grid BCs stop
    gradients at the grid in the reference semantics too.

    With ``z_win`` contributions below/above the window never match the
    Zw-lane z basis and drop exactly — physically irrelevant, since the
    coverage check guarantees every cell a particle reads is inside the
    window (same argument as dropping non-halo columns)."""
    from .column_transfer import build_bins, default_col_cap
    if interpret is None:
        interpret = _interpret_default()
    assert z_win is None or halo is not None, \
        "the z-window needs the packed halo grid"
    G = cfg.n_grid
    g_z = z_win[1] if z_win is not None else G
    Cch = values.shape[-1]
    bins = build_bins(points, cfg, K, c_cap=c_cap)
    pid = bins.pid
    C_cap = pid.shape[0]
    block_c = _pick_block(C_cap, block_c)

    vals1 = jnp.concatenate(
        [values, jnp.ones(values.shape[:-1] + (1,), values.dtype)], -1)
    # one fused (3 + CH + 1)-row gather (row-latency bound, like p2g);
    # the bounds check reuses the gathered points instead of a second
    # gather pass
    both = _packed_gather(jnp.concatenate([points, vals1], -1), pid)
    ok = bins.valid.astype(points.dtype)
    if bounds_check:
        pbase = jnp.floor(both[..., :3] * cfg.inv_dx
                          - 0.5).astype(jnp.int32)
        inb = jnp.all((pbase >= 0) & (pbase < G - 3), axis=-1)
        ok = ok * inb.astype(points.dtype)
    px_t = _zwin_shift(both[..., :3].transpose(0, 2, 1), z_win)
    vals_t = (both[..., 3:] * ok[..., None]
              ).transpose(0, 2, 1)                        # (C, CH+1, K)
    col = bins.active_col
    colxy_f = jnp.stack([col // G, col % G], -1).astype(points.dtype)

    CH = Cch + 1
    S = 9
    shifts = tuple(shift_set(1))

    def kernel(px_ref, v_ref, col_ref, out_ref):
        out = _splat_math(px_ref[...], v_ref[...], col_ref[...],
                          float(cfg.inv_dx), g_z, shifts)
        out_ref[...] = out.reshape(block_c * CH * S, g_z)

    out = pl.pallas_call(
        kernel,
        grid=(C_cap // block_c,),
        in_specs=[
            pl.BlockSpec((block_c, 3, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, CH, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_c * CH * S, g_z), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C_cap * CH * S, g_z),
                                       jnp.float32),
        interpret=interpret,
    )(px_t, vals_t, colxy_f)
    out = out.reshape(C_cap, CH, S, g_z).transpose(0, 3, 1, 2)
    shalo = None
    if halo is not None:
        shalo = halo._replace(
            htargets=halo.lut[_shift_columns(bins, G, 1)])
    grid = _scatter_columns(out, bins, G, CH, halo=shalo)
    grid = grid.reshape(-1, CH)
    return grid[:, :Cch], grid[:, Cch], bins.overflow
