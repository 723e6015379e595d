"""Pallas segment kernel for the compacted rasterizer worklist.

The worklist compositor (rasterizer._composite_worklist) evaluates one
(tile, chunk) work item per row: 32 depth-ordered gaussians against the
tile's 256 pixels, combined per tile with the associative segment rule.
The XLA formulation was gather-latency-bound — per chunk-step it
re-gathered means/conic/colors/opacity by instance id (~45M gather rows
for the all-big-splat 1080p case, ~370 ms) and materialized (W, 256,
chunk) intermediates in HBM (large work caps crashed the compiler).

This kernel consumes a ONE-gather packed parameter table and evaluates
each work block entirely in VMEM: HBM traffic collapses to the packed
instances in and the (W, nc+1, 256) segments out.  Same math, bit-level
layout differences only; single jnp source traced both inside the
kernel and (re-traced) for the custom-VJP backward.

Replaces the per-instance inner loop of the reference CUDA rasterizer's
renderCUDA kernel (diff-gaussian-rasterization submodule;
/root/reference/gaussian_renderer/__init__.py:95) for heavy-footprint
distributions on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
ALPHA_MIN = 1.0 / 255.0
_P = TILE * TILE


def _seg_math(pgT, pix0, nc: int):
    """(B, D, C) packed instances + (B, 2) tile origins ->
    (B, nc+1, P) [seg colors, seg transmittance].

    pgT rows (D = 6 + nc): [mean_x, mean_y, conic_a, conic_b, conic_c,
    color_0..nc-1, opacity]; instances are depth-ordered along C.

    The depth prefix uses a doubling cumulative PRODUCT along the
    sublane (C) axis — log2(C) shift+multiply passes.  Measured on v5e
    this beats the earlier log/exp + strict-triangular-matmul prefix
    5.4x at C=32 (the matmul pads C to 128 on both MXU dims) and 2x at
    C=128, and it drops the two biggest in-kernel temporaries (the
    (B, P, C) matmul accumulators), letting larger blocks compile."""
    B, D, C = pgT.shape
    f32 = pgT.dtype
    ip = jax.lax.broadcasted_iota(jnp.int32, (B, 1, _P), 2)
    px = pix0[:, 0][:, None, None] + (ip % TILE).astype(f32)   # (B,1,P)
    py = pix0[:, 1][:, None, None] + (ip // TILE).astype(f32)

    mx = pgT[:, 0, :][:, :, None]                        # (B, C, 1)
    my = pgT[:, 1, :][:, :, None]
    ca = pgT[:, 2, :][:, :, None]
    cb = pgT[:, 3, :][:, :, None]
    cc = pgT[:, 4, :][:, :, None]
    op = pgT[:, 5 + nc, :][:, :, None]

    dx = px - mx                                         # (B, C, P)
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(0.99, op * jnp.exp(jnp.minimum(power, 0.0)))
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0,
                      alpha)                             # (B, C, P)

    # inclusive cumprod of (1 - alpha) along depth (sublanes)
    prod = 1.0 - alpha
    s = 1
    while s < C:
        prod = prod * jnp.concatenate(
            [jnp.ones((B, s, _P), f32), prod[:, :-s]], 1)
        s *= 2
    excl = jnp.concatenate([jnp.ones((B, 1, _P), f32), prod[:, :-1]], 1)
    w = alpha * excl                                     # (B, C, P)

    colT = pgT[:, 5:5 + nc, :]                           # (B, nc, C)
    seg_c = jax.lax.dot_general(
        colT, w, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (B, nc, P)
    return jnp.concatenate([seg_c, prod[:, -1:]], axis=1)  # (B, nc+1, P)


def _seg_pallas(pgT, pix0, nc: int, block_w: int, interpret: bool):
    W, D, C = pgT.shape
    rows = nc + 2 if (nc + 1) % 2 else nc + 1  # even sublane count

    def kernel(pg_ref, pix_ref, out_ref):
        out = _seg_math(pg_ref[...], pix_ref[...], nc)
        if rows != nc + 1:
            out = jnp.concatenate(
                [out, jnp.zeros(out.shape[:1] + (1, _P), out.dtype)], 1)
        out_ref[...] = out.reshape(block_w * rows, _P)

    out = pl.pallas_call(
        kernel,
        grid=(W // block_w,),
        in_specs=[
            pl.BlockSpec((block_w, D, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_w, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_w * rows, _P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W * rows, _P), jnp.float32),
        interpret=interpret,
    )(pgT, pix0)
    return out.reshape(W, rows, _P)[:, :nc + 1]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def segment_composite(pgT, pix0, nc: int, block_w: int, interpret: bool):
    """(W, D, C) packed worklist -> (W, nc+1, 256) segments."""
    return _seg_pallas(pgT, pix0, nc, block_w, interpret)


def _fwd(pgT, pix0, nc, block_w, interpret):
    return _seg_pallas(pgT, pix0, nc, block_w, interpret), (pgT, pix0)


def _seg_bwd_pallas(pgT, pix0, g, nc: int, block_w: int,
                    interpret: bool):
    """Pallas backward: recompute the block's forward in VMEM and apply
    its VJP there.  The XLA re-trace backward materialized every
    (W, C, P) intermediate in HBM (~10x the forward's wall clock at the
    1500x1000 appearance-training shape); here residuals live and die in
    the block's VMEM, so HBM traffic is the packed instances + cotangent
    in, d(packed) out — the same streams as the forward."""
    W, D, C = pgT.shape

    def kernel(pg_ref, pix_ref, g_ref, dpg_ref):
        pix = pix_ref[...]
        _, vjp = jax.vjp(lambda a: _seg_math(a, pix, nc), pg_ref[...])
        (dpg,) = vjp(g_ref[...])
        dpg_ref[...] = dpg

    return pl.pallas_call(
        kernel,
        grid=(W // block_w,),
        in_specs=[
            pl.BlockSpec((block_w, D, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_w, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_w, nc + 1, _P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_w, D, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, D, C), jnp.float32),
        interpret=interpret,
    )(pgT, pix0, g)


def _bwd(nc, block_w, interpret, res, g):
    pgT, pix0 = res
    dpg = _seg_bwd_pallas(pgT, pix0, g, nc, block_w, interpret)
    return dpg, jnp.zeros_like(pix0)


segment_composite.defvjp(_fwd, _bwd)


def pick_block(w_cap: int, block_w: int = 8) -> int:
    """Largest power-of-two block (<= ``block_w``) dividing ``w_cap``.

    Measured on v5e: block_w 16/32 blow the 16 MB scoped-vmem budget
    (Mosaic stack-allocates the transposed matmul operands of
    ``_seg_math`` per block), while block_w=8 compiles and composites the
    W=131072 big-splat worklist in ~0.22 ms — grid parallelism covers
    the smaller block.
    """
    block_w = max(block_w, 1)
    while block_w > 1 and w_cap % block_w:
        block_w //= 2
    return block_w
