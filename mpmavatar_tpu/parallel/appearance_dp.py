"""Data-parallel appearance training over a device mesh.

The reference wraps its appearance/physics loops in HuggingFace accelerate
DDP plumbing that never synchronizes anything (SURVEY.md §2.7).  Here the
appearance stage gets true data parallelism: a batch of (camera, frame)
samples is sharded over the ``"dp"`` mesh axis, each device renders and
differentiates its shard, and gradients are ``psum``-reduced before the
optax update — the canonical DP recipe, with params replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.rasterizer import CameraArrays
from ..train.appearance import render_avatar_frame
from ..utils.losses import l1_loss, ssim


def make_dp_appearance_step(avatar, tx, device_mesh: Mesh,
                            active_sh_degree: int, white_bkgd: bool,
                            width: int, height: int,
                            dssim_weight: float = 0.2,
                            tile_capacity: int = 256, axis: str = "dp"):
    """Returns step(params, opt_state, batch) -> (params, opt_state, loss).

    ``batch`` fields are leading-axis B arrays (B divisible by mesh size):
    cam (CameraArrays stacked), camera_idx (B,), timestep_verts (B, V, 3)
    pre-posed vertices, ao_map (B, 1, H, W), rgb (B, 3, H, W),
    msk (B, 1, H, W)."""
    bg = jnp.ones(3) if white_bkgd else jnp.zeros(3)

    def local_loss(params, cam_b, camera_idx, verts_b, ao_b, rgb_b, msk_b):
        def one(cam, ci, verts, ao, rgb, msk):
            rendering, _ = render_avatar_frame(
                avatar, params, verts, ao, (cam, width, height), ci,
                active_sh_degree, bg, white_bkgd,
                tile_capacity=tile_capacity)
            gt = rgb * msk + (1.0 - msk if white_bkgd else 0.0)
            return (1.0 - dssim_weight) * l1_loss(rendering, gt) \
                + dssim_weight * (1.0 - ssim(rendering, gt))

        losses = jax.vmap(one)(cam_b, camera_idx, verts_b, ao_b, rgb_b,
                               msk_b)
        return jnp.mean(losses)

    def step(params, opt_state, cam_b, camera_idx, verts_b, ao_b, rgb_b,
             msk_b):
        flat, treedef = jax.tree.flatten(params)
        fmask = [jnp.issubdtype(l.dtype, jnp.floating) for l in flat]

        def recombine(floats):
            it = iter(floats)
            return jax.tree.unflatten(
                treedef, [next(it) if m else orig
                          for m, orig in zip(fmask, flat)])

        floats_in = [l for l, m in zip(flat, fmask) if m]
        loss, fgrads = jax.value_and_grad(
            lambda fl: local_loss(recombine(fl), cam_b, camera_idx,
                                  verts_b, ao_b, rgb_b, msk_b))(floats_in)
        # cross-device reduction: params replicated, batch sharded
        loss = jax.lax.pmean(loss, axis)
        fgrads = jax.tree.map(lambda g: jax.lax.pmean(g, axis), fgrads)
        it = iter(fgrads)
        grads = jax.tree.unflatten(
            treedef, [next(it) if m else jnp.zeros_like(orig)
                      for m, orig in zip(fmask, flat)])
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u: p + u if jnp.issubdtype(p.dtype, jnp.floating)
            else p, params, updates)
        return params, opt_state, loss

    sharded = jax.shard_map(
        step, mesh=device_mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis)),
        out_specs=(P(), P(), P()),
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
