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
    color_0..nc-1, opacity]; instances are depth-ordered along C."""
    B, D, C = pgT.shape
    f32 = pgT.dtype
    ip = jax.lax.broadcasted_iota(jnp.int32, (B, C, _P), 2)
    px = pix0[:, 0][:, None, None] + (ip % TILE).astype(f32)
    py = pix0[:, 1][:, None, None] + (ip // TILE).astype(f32)

    mx = pgT[:, 0, :][:, :, None]
    my = pgT[:, 1, :][:, :, None]
    ca = pgT[:, 2, :][:, :, None]
    cb = pgT[:, 3, :][:, :, None]
    cc = pgT[:, 4, :][:, :, None]
    op = pgT[:, 5 + nc, :][:, :, None]

    dx = px - mx
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(0.99, op * jnp.exp(jnp.minimum(power, 0.0)))
    alpha = jnp.where(power > 0.0, 0.0, alpha)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)     # (B, C, P)
    log1m = jnp.log1p(-alpha)
    # exclusive prefix over depth via a strict-upper triangular matmul
    # (Mosaic TC has no cumsum lowering); result lands (B, P, C) and the
    # downstream contractions consume that layout directly — no
    # transposes in-kernel
    tri = jnp.triu(jnp.ones((C, C), f32), 1)             # [c, d]: c < d
    excl_pd = jax.lax.dot_general(
        log1m, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (B, P, C)
    alpha_pd = jax.lax.dot_general(
        alpha, jnp.eye(C, dtype=f32), (((1,), (0,)), ((), ())))
    w_pd = alpha_pd * jnp.exp(excl_pd)                   # (B, P, C)

    colT = pgT[:, 5:5 + nc, :]                           # (B, nc, C)
    seg_c = jax.lax.dot_general(
        colT, w_pd, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (B, nc, P)
    seg_t = jnp.exp(jnp.sum(log1m, axis=1,
                            keepdims=True))              # (B, 1, P)
    return jnp.concatenate([seg_c, seg_t], axis=1)       # (B, nc+1, P)


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


def _bwd(nc, block_w, interpret, res, g):
    pgT, pix0 = res
    _, vjp = jax.vjp(lambda a: _seg_math(a, pix0, nc), pgT)
    (dpg,) = vjp(g)
    return dpg, jnp.zeros_like(pix0)


segment_composite.defvjp(_fwd, _bwd)


def pick_block(w_cap: int, block_w: int = 32) -> int:
    block_w = max(8 * (block_w // 8), 1)
    while block_w > 1 and w_cap % block_w:
        block_w //= 2
    return max(block_w, 1)
