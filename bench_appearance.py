"""Stage-2 appearance-TRAINING throughput benchmark.

The reference's longest stage is 30k iterations of render + backward
(/root/reference/train_appearance.py:99-261).  This measures ONE jitted
train step at production scale — splat forward + rasterizer VJP + the
full regularizer set (normal/opacity/iso/area/xyz/scale) + shadow UNet
(256 uv, in the graph and differentiated) + per-group optax update —
and reports steps/s plus the projected 30k-iteration wall clock.

Production shape: 1500x1000 render, ~50k alive splats (one per face of
a ~50k-face body-scale mesh, the reference's init_from_trained_model
density), SH degree 3, viewspace grads extracted from the same backward
(densification stats), AO 256x256.

Prints one JSON line (folded into bench.py's headline output).
"""

import json
import time

import numpy as np


def build_body_mesh(n_theta=160, n_phi=158, height=1.7, radius=0.25):
    """Closed capsule-ish UV sphere at body scale: ~50k faces."""
    th = np.linspace(1e-3, np.pi - 1e-3, n_theta)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    # stretch the sphere into a 1.7m-tall, 0.5m-wide "body"
    verts = np.stack([radius * np.sin(tt) * np.cos(pp),
                      0.5 * height * np.cos(tt),
                      radius * np.sin(tt) * np.sin(pp)], -1)
    idx = np.arange(n_theta * n_phi).reshape(n_theta, n_phi)
    a = idx[:-1, :].ravel()
    b = idx[1:, :].ravel()
    c = idx[:-1, np.r_[1:n_phi, 0]].ravel()
    d = idx[1:, np.r_[1:n_phi, 0]].ravel()
    faces = np.concatenate([np.stack([a, b, c], -1),
                            np.stack([c, b, d], -1)], 0).astype(np.int32)
    return verts.reshape(-1, 3).astype(np.float32), faces


def build_avatar(sh_degree=3, capacity=65536, n_frames=2, ao_size=256,
                 seed=0, n_theta=160, n_phi=158):
    import jax
    import jax.numpy as jnp
    from mpmavatar_tpu.render import gaussians as G
    from mpmavatar_tpu.render.avatar_model import AvatarParams, MeshAvatar
    from mpmavatar_tpu.render.geometry import find_adjacent_faces
    from mpmavatar_tpu.render.shadow import init_shadow_unet

    rng = np.random.default_rng(seed)
    verts, faces = build_body_mesh(n_theta=n_theta, n_phi=n_phi)
    verts_orig = np.stack([verts + 0.001 * t for t in range(n_frames)])
    ao_maps = (0.4 + 0.5 * rng.random(
        (n_frames, 1, ao_size, ao_size))).astype(np.float32)
    uv = (rng.random((len(faces), 2)).astype(np.float32)) * 2.0 - 1.0

    face_neighbors = find_adjacent_faces(faces)
    centers = verts_orig[0][faces].mean(1)
    nb = centers[face_neighbors]
    sq = np.sum((nb - centers[:, None]) ** 2, -1)
    avatar = MeshAvatar(
        faces=faces, verts_orig=verts_orig, ao_maps=ao_maps,
        uv_coord=uv, face_neighbors=face_neighbors,
        neighbor_weight=np.exp(-2000 * sq).astype(np.float32),
        neighbor_dist=np.sqrt(sq).astype(np.float32),
        num_timesteps=n_frames, sh_degree=sh_degree)

    splats = G.init_from_mesh(
        len(faces), sh_degree,
        rgb=rng.random((len(faces), 3)).astype(np.float32),
        capacity=capacity)
    shadow = init_shadow_unet(jax.random.PRNGKey(seed),
                              ao_maps.mean(axis=0), uv_size=ao_size,
                              shadow_size=ao_size, n_dims=4)
    params = AvatarParams(
        splats=splats,
        verts_offset=jnp.zeros((n_frames, len(verts), 3), jnp.float32),
        cam_m=jnp.zeros((4, 3), jnp.float32),
        cam_c=jnp.zeros((4, 3), jnp.float32),
        shadow=shadow)
    return avatar, params, len(faces)


def main(quiet=False, iters=10, width=1500, height=1000,
         tile_capacity=512, work_cap=8192):
    import jax
    from mpmavatar_tpu.utils import compile_cache
    compile_cache.setup()
    import jax.numpy as jnp
    from mpmavatar_tpu.data.config import OptimizationParams
    from mpmavatar_tpu.render import camera_arrays
    from mpmavatar_tpu.render.cameras import Camera
    from mpmavatar_tpu.train.appearance import (make_optimizer,
                                                make_train_step)

    avatar, params, n_faces = build_avatar()

    # production-style camera: body fills ~80% of the 1500x1000 frame
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
                           white_bkgd=False, tile_capacity=tile_capacity,
                           work_cap=work_cap)

    def run(params, opt_state):
        return step(params, opt_state, 0, 0, ca, gt_rgb, gt_msk, ao,
                    width, height)

    def sync(params, loss):
        # device->host readbacks: genuinely wait for the whole step (the
        # tunneled runtime's block_until_ready can return early — same
        # discipline as bench.py's sim sync).  The params leaf depends on
        # the full backward + optimizer chain, loss on the forward.
        float(loss)
        float(jnp.sum(params.cam_m))

    params, opt_state, loss, aux = run(params, opt_state)
    assert np.isfinite(float(loss)), "train step produced NaN loss"
    assert int(aux["work_overflow"]) == 0 and \
        int(aux["big_overflow"]) == 0, "rasterizer caps overflowed"
    sync(params, loss)

    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss, aux = run(params, opt_state)
    sync(params, loss)
    dt = time.perf_counter() - t0
    sps = iters / dt
    stage2_hours = 30_000 / sps / 3600.0

    result = {"metric": "appearance_train_steps_per_sec_1500x1000_50k",
              "value": round(sps, 2), "unit": "steps/s",
              "n_alive_splats": n_faces,
              "projected_stage2_hours_30k_iters": round(stage2_hours, 2),
              "loss": round(float(loss), 4)}
    if not quiet:
        print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
