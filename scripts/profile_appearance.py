"""Per-phase timing of the stage-2 appearance train step at bench scale.

Phases measured separately (each jitted alone):
  fwd       loss forward only
  grad      value_and_grad (forward + full backward), no optimizer
  step      full train step (bench_appearance configuration)
  raster_f  rasterizer forward only
  raster_b  rasterizer forward+VJP
  ssim      SSIM forward+backward at frame size
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def t(fn, *args, iters=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    from mpmavatar_tpu.utils import compile_cache
    compile_cache.setup()
    import jax.numpy as jnp
    from bench_appearance import build_avatar
    from mpmavatar_tpu.data.config import OptimizationParams
    from mpmavatar_tpu.render import camera_arrays, rasterize
    from mpmavatar_tpu.render.cameras import Camera
    from mpmavatar_tpu.render import gaussians as G
    from mpmavatar_tpu.train.appearance import (make_optimizer,
                                                make_train_step,
                                                render_avatar_frame)
    from mpmavatar_tpu.utils.losses import l1_loss, ssim

    width, height = 1500, 1000
    work_cap = 8192
    avatar, params, n_faces = build_avatar()
    k = np.array([[1400.0, 0, width / 2], [0, 1400.0, height / 2],
                  [0, 0, 1.0]])
    w2c = np.eye(4)
    w2c[2, 3] = 2.6
    cam = Camera.from_kw2c("bench", width, height, k, w2c, near=0.1,
                           far=20.0)
    ca = camera_arrays(cam)
    rng = np.random.default_rng(1)
    gt_rgb = jnp.asarray(rng.random((3, height, width)).astype(np.float32))
    gt_msk = jnp.ones((1, height, width), jnp.float32)
    ao = jnp.asarray(avatar.ao_maps[0])

    opt = OptimizationParams()
    tx = make_optimizer(opt, spatial_lr_scale=1.0)
    opt_state = tx.init(params)
    step = make_train_step(avatar, opt, tx, active_sh_degree=3,
                           white_bkgd=False, tile_capacity=512,
                           work_cap=work_cap)
    print("step      %7.2f ms" % t(
        lambda: step(params, opt_state, 0, 0, ca, gt_rgb, gt_msk, ao,
                     width, height)))

    # forward-only loss
    @jax.jit
    def fwd(params):
        verts = avatar.select_verts(params, 0)
        rendering, out = render_avatar_frame(
            avatar, params, verts, ao, (ca, width, height), 0, 3,
            jnp.zeros(3), False, tile_capacity=512, work_cap=work_cap)
        rendering = jnp.clip(rendering, 0.0, 1.0)
        loss = 0.8 * l1_loss(rendering, gt_rgb) \
            + 0.2 * (1.0 - ssim(rendering, gt_rgb))
        loss += 0.1 * avatar.normal_loss(verts)
        loss += 0.05 * avatar.opacity_loss(params)
        loss += 20.0 * avatar.iso_loss(verts)
        loss += 1000.0 * avatar.area_loss(verts)
        return loss

    print("fwd       %7.2f ms" % t(fwd, params))

    gradf = jax.jit(jax.value_and_grad(
        lambda fl: fwd(jax.tree.unflatten(jax.tree.structure(params),
                                          fl))))
    flat = jax.tree.leaves(params)
    # grads only wrt float leaves via the same machinery as fwd is messy;
    # approximate with grad wrt splats xyz/colors through a closure
    @jax.jit
    def gradr(params):
        return jax.value_and_grad(fwd)(params)
    try:
        print("grad      %7.2f ms" % t(gradr, params))
    except Exception as e:
        print("grad      failed:", str(e)[:200])

    # raw rasterizer fwd / fwd+bwd
    verts = avatar.select_verts(params, 0)
    frames = avatar.frames_for_verts(verts)
    xyz = G.get_xyz(params.splats, frames)
    colors = jnp.abs(jnp.asarray(
        rng.random((params.splats.capacity, 3)).astype(np.float32)))
    opac = G.get_opacity(params.splats)[:, 0] * params.splats.alive
    cov3d = G.get_covariance(params.splats, frames)

    def rf(xyz, colors, opac, cov3d):
        out = rasterize(xyz, colors, opac, cov3d, ca, jnp.zeros(3),
                        width=width, height=height, tile_capacity=512,
                        work_cap=work_cap)
        return out["render"], out["alpha"]

    rfj = jax.jit(rf)
    print("raster_f  %7.2f ms" % t(rfj, xyz, colors, opac, cov3d))

    def rb(xyz, colors, opac, cov3d):
        def f(args):
            img, alpha = rf(*args)
            return jnp.sum(img ** 2) + jnp.sum(alpha)
        return jax.grad(f)((xyz, colors, opac, cov3d))

    rbj = jax.jit(rb)
    print("raster_b  %7.2f ms" % t(rbj, xyz, colors, opac, cov3d))

    def sb(img):
        return jax.grad(lambda im: 1.0 - ssim(im, gt_rgb))(img)

    sbj = jax.jit(sb)
    img = jnp.asarray(rng.random((3, height, width)).astype(np.float32))
    print("ssim_b    %7.2f ms" % t(sbj, img))

    from mpmavatar_tpu.render import shadow_unet_apply
    def shb(sp):
        return jax.grad(lambda sp: jnp.sum(
            shadow_unet_apply(sp, ao[None])["shadow_map"]))(sp)
    shbj = jax.jit(shb)
    print("shadow_b  %7.2f ms" % t(shbj, params.shadow))


if __name__ == "__main__":
    main()
