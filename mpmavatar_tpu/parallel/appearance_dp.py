"""Data-parallel appearance training over a device mesh.

The reference wraps its appearance/physics loops in HuggingFace accelerate
DDP plumbing that never synchronizes anything (SURVEY.md §2.7).  Here the
appearance stage gets true data parallelism: a batch of (camera, frame)
samples is sharded over the ``"dp"`` mesh axis, each device renders and
differentiates its shard with the SAME full stage-2 loss as the
single-device trainer (train.appearance.frame_loss — L1/DSSIM (+LPIPS) +
normal/opacity/iso/area/xyz/scale regularizers), gradients are
``pmean``-reduced before the shared optax update, and the densification
statistics (view-space gradient norms, visible counts, max screen radii
— gaussian_model.py:524-526) are ``psum``-accumulated so multi-chip
training reproduces the single-device densify/prune trajectory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render import gaussians as G
from ..render.rasterizer import CameraArrays
from ..train.appearance import (AppearanceLossWeights, apply_updates_float,
                                float_leaf_grads, frame_loss)


def make_dp_appearance_step(avatar, opt, tx, device_mesh: Mesh,
                            active_sh_degree: int, white_bkgd: bool,
                            width: int, height: int,
                            weights: AppearanceLossWeights = None,
                            tile_capacity: int = 256, work_cap: int = 0,
                            chunk: int = 32, lpips_fn=None,
                            axis: str = "dp"):
    """Returns step(params, opt_state, densify_state, batch...) ->
    (params, opt_state, densify_state, loss, metrics).

    ``batch`` fields are leading-axis B arrays (B divisible by mesh
    size): cam (CameraArrays stacked), camera_idx (B,) int, timestep
    (B,) int (indexes verts_offset), verts_base (B, V, 3) the tracked
    vertices WITHOUT offset (the learnable offset row is gathered and
    added on device so its gradient flows), ao_map (B, 1, Ha, Wa),
    rgb (B, 3, H, W), msk (B, 1, H, W).

    One step with B samples optimizes mean_b loss_b — gradient-identical
    (up to reduction order) to averaging B single-device
    ``make_train_step`` gradients — and accumulates B samples' worth of
    densification statistics (each sample counts as one reference
    iteration of add_densification_stats).
    """
    weights = weights or AppearanceLossWeights(
        dssim=opt.lambda_dssim, lpips=getattr(opt, "lambda_lpips", 0.2),
        threshold_xyz=getattr(opt, "threshold_xyz", 1.0),
        threshold_scale=getattr(opt, "threshold_scale", 0.6))
    bg = jnp.ones(3) if white_bkgd else jnp.zeros(3)
    ndc_scale = jnp.asarray([0.5 * width, 0.5 * height], jnp.float32)

    def one_sample_grads(params, cam, cidx, t, verts_base, ao, rgb, msk):
        def loss_fn(p, m2d):
            verts = verts_base + p.verts_offset[t]
            return frame_loss(
                avatar, weights, p, m2d, verts, p.verts_offset[t], ao,
                cam, width, height, cidx, rgb, msk, active_sh_degree,
                bg, white_bkgd, tile_capacity, work_cap, chunk, lpips_fn)

        m2d0 = jnp.zeros((params.splats.capacity, 2))
        (loss, aux), grads, vgrad = float_leaf_grads(params, loss_fn,
                                                     m2d0)
        cap = params.splats.capacity
        gn = jnp.linalg.norm(vgrad[:, :2] * ndc_scale[None], axis=-1)
        visible = aux["visible"][:cap]
        stats = (jnp.where(visible, gn[:cap], 0.0),
                 visible.astype(jnp.float32),
                 jnp.where(visible, aux["radii"][:cap], 0.0))
        metrics = {"l1": aux["l1"], "dssim": aux["dssim"],
                   "lpips": aux["lpips"],
                   "big_overflow": aux["big_overflow"],
                   "work_overflow": aux["work_overflow"]}
        return loss, grads, stats, metrics

    def step(params, opt_state, ds, cam_b, cidx_b, t_b, verts_b, ao_b,
             rgb_b, msk_b):
        # UNROLLED local-batch loop, not vmap: the local shard is small
        # (usually 1 sample/device) and static, and a vmapped rasterizer
        # lowers catastrophically on TPU (the tile compositor's scans and
        # Pallas VJP pick up a batch dim they were never laid out for —
        # measured 225x slower than the unsharded step at local B=1 on a
        # v5e; unrolled it matches the single-device step).
        local_b = rgb_b.shape[0]
        loss = grads = stats = metrics = None
        for i in range(local_b):
            li, gi, si, mi = one_sample_grads(
                params, jax.tree.map(lambda a: a[i], cam_b), cidx_b[i],
                t_b[i], verts_b[i], ao_b[i], rgb_b[i], msk_b[i])
            if loss is None:
                loss, grads, stats, metrics = li, gi, si, mi
            else:
                loss = loss + li
                grads = jax.tree.map(jnp.add, grads, gi)
                stats = (stats[0] + si[0], stats[1] + si[1],
                         jnp.maximum(stats[2], si[2]))
                metrics = jax.tree.map(jnp.add, metrics, mi)
        inv_b = 1.0 / local_b
        # cross-device gradient mean (params replicated, batch sharded)
        loss = jax.lax.pmean(loss * inv_b, axis)
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(g * inv_b, axis), grads)
        # densification stats: SUM over the global batch (each sample ==
        # one reference iteration), max for the screen radii
        gn_sum = jax.lax.psum(stats[0], axis)
        vis_sum = jax.lax.psum(stats[1], axis)
        rad_max = jax.lax.pmax(stats[2], axis)
        ds = G.DensifyState(
            xyz_gradient_accum=ds.xyz_gradient_accum + gn_sum[:, None],
            denom=ds.denom + vis_sum[:, None],
            max_radii2d=jnp.maximum(ds.max_radii2d, rad_max))
        metrics = {k: jax.lax.pmean(v * inv_b, axis)
                   if jnp.issubdtype(v.dtype, jnp.floating)
                   else jax.lax.psum(v, axis)
                   for k, v in metrics.items()}
        params, opt_state = apply_updates_float(tx, params, grads,
                                                opt_state)
        return params, opt_state, ds, loss, metrics

    sharded = jax.shard_map(
        step, mesh=device_mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False)
    return jax.jit(sharded)


def stack_camera_arrays(cams) -> CameraArrays:
    """Stack host Cameras into batched CameraArrays for vmap/shard_map."""
    import numpy as np
    return CameraArrays(
        world_view=jnp.asarray(np.stack(
            [c.world_view_transform for c in cams])),
        full_proj=jnp.asarray(np.stack(
            [c.full_proj_transform for c in cams])),
        cam_center=jnp.asarray(np.stack([c.camera_center for c in cams])),
        tanfovx=jnp.asarray([c.tanfovx for c in cams], jnp.float32),
        tanfovy=jnp.asarray([c.tanfovy for c in cams], jnp.float32))


def shard_batch(device_mesh: Mesh, batch_tree, axis: str = "dp"):
    spec = NamedSharding(device_mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, spec), batch_tree)
