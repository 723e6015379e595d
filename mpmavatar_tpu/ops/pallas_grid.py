"""Pallas TPU kernel: fused grid update (normalize + gravity + damping).

The grid pass touches every cell of the dense G^3 grid
(grid_normalization_and_gravity + add_damping_via_grid,
/root/reference/warp_mpm/mpm_utils.py:561-572,1162-1174).  XLA already
fuses these elementwise ops well; this kernel exists to pin the memory
schedule (single HBM read/write per array, blocks streamed through VMEM)
and as the template for further fused grid-BC passes.

Falls back to the jnp implementation under `interpret=True` on CPU tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _grid_update_kernel(vin_ref, m_ref, g_ref, scale_ref, dt_ref, out_ref):
    m = m_ref[0]
    active = m > 1e-15
    safe_m = jnp.where(active, m, 1.0)
    dt = dt_ref[0]
    scale = scale_ref[0]
    damping = jnp.where(scale < 1.0, scale, 1.0)
    for c in range(3):
        v = vin_ref[0, :, :, c] / safe_m + dt * g_ref[c]
        out_ref[0, :, :, c] = jnp.where(active, v * damping, 0.0)


@partial(jax.jit, static_argnames=("interpret",))
def grid_update_pallas(grid_v_in, grid_m, gravity, dt, damping_scale,
                       interpret: bool = False):
    """grid_v_in (N, 3), grid_m (N,) -> grid_v_out (N, 3)."""
    n = grid_m.shape[0]
    block = 8 * 128
    num_blocks = pl.cdiv(n, block)
    # pad to a whole number of blocks
    pad = num_blocks * block - n
    vin = jnp.pad(grid_v_in, ((0, pad), (0, 0))).reshape(
        num_blocks, block // 128, 128, 3)
    m = jnp.pad(grid_m, (0, pad)).reshape(num_blocks, block // 128, 128)

    out = pl.pallas_call(
        _grid_update_kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((1, block // 128, 128, 3),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block // 128, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block // 128, 128, 3),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(vin.shape, vin.dtype),
        interpret=interpret,
    )(vin, m, jnp.asarray(gravity, jnp.float32),
      jnp.asarray([damping_scale], jnp.float32),
      jnp.asarray([dt], jnp.float32))
    return out.reshape(-1, 3)[:n]
