"""Stage-1 mesh-TRACKING throughput benchmark (VERDICT r4 item 6).

The reference's stage 1 spends 10k iterations at t0 + 3k per subsequent
frame across ~160 cameras (/root/reference/preprocess/
train_mesh_lbs_actorshq.py:454-469).  This measures ONE jitted JOINT
tracking iteration at production scale — gaussian-per-face render of a
~40k-face tracked mesh at 1500x1000, the full loss stack (im L1+SSIM,
mask, scale/normal/opacity/iso/area/eq-faces, soft color, cloth-body
collision penalty), SMPL-X forward from a trainable VPoser latent inside
the graph, and BOTH optimizers — and projects the per-frame fit time.

The SMPL-X body is a synthetic rig at the real model's vertex/joint
count (10,475 verts / 22 joints / 63-dim body pose; no real checkpoint
exists in this env — see PARITY.md) — the compute shape matches.

Prints one JSON line (folded into bench.py's default output).
"""

import json
import time

import numpy as np


def build_tracking_problem(n_theta=144, n_phi=142, width=1500,
                           height=1000, seed=0):
    import jax
    import jax.numpy as jnp
    from bench_appearance import build_body_mesh
    from mpmavatar_tpu.avatar.smplx import SMPLXModel, make_test_rig
    from mpmavatar_tpu.avatar.vposer import init_vposer
    from mpmavatar_tpu.render.cameras import Camera
    from mpmavatar_tpu.train.tracking import MeshTracker, TrackingConfig

    # tracked mesh: ~40k faces at body scale
    verts, faces = build_body_mesh(n_theta=n_theta, n_phi=n_phi)
    # upper half = cloth (collision penalty active on a realistic subset)
    cloth_v_idx = np.where(verts[:, 1] > 0.0)[0].astype(np.int32)

    # SMPL-X-sized rig: 10,475 verts / 22 joints -> 63-dim body pose,
    # matching VPoser's 21-joint decode
    rig = make_test_rig(n_joints=22, n_verts=10475, seed=seed)
    vposer = init_vposer(jax.random.PRNGKey(seed))

    cfg = TrackingConfig(tile_capacity=512)
    tracker = MeshTracker(verts, faces, cfg, cloth_v_idx=cloth_v_idx,
                          smplx_model=rig, vposer=vposer,
                          smplx_faces=np.asarray(rig.faces),
                          max_cams=160)
    pose = {"latent": jnp.zeros((1, 32), jnp.float32),
            "trans": jnp.zeros((1, 3), jnp.float32),
            "beta": jnp.zeros((1, 5), jnp.float32)}
    tracker.set_smplx_frame(pose, is_initial=True)

    k = np.array([[1400.0, 0, width / 2], [0, 1400.0, height / 2],
                  [0, 0, 1.0]])
    w2c = np.eye(4)
    w2c[2, 3] = 2.6
    cam = Camera.from_kw2c("bench", width, height, k, w2c, near=0.1,
                           far=20.0)
    rng = np.random.default_rng(seed + 1)
    batch = {"cam": cam, "camera_idx": 0,
             "rgb": rng.random((3, height, width)).astype(np.float32),
             "msk": np.ones((1, height, width), np.float32)}
    return tracker, [batch], len(faces)


def main(quiet=False, iters=20):
    from mpmavatar_tpu.utils import compile_cache
    compile_cache.setup()

    tracker, batches, n_faces = build_tracking_problem()

    # warmup/compile (fit_frame reads float(loss) per iteration — the
    # device->host readback IS the honest fence on this runtime)
    losses = tracker.fit_frame(batches, is_initial=True, iters=2)
    assert np.isfinite(losses).all(), "tracking loss not finite"

    t0 = time.perf_counter()
    losses = tracker.fit_frame(batches, is_initial=True, iters=iters)
    dt = time.perf_counter() - t0
    sps = iters / dt
    per_frame_min = 3000 / sps / 60.0
    t0_hours = 10_000 / sps / 3600.0

    result = {"metric": "tracking_steps_per_sec_1500x1000_40kfaces",
              "value": round(sps, 2), "unit": "steps/s",
              "n_faces": n_faces,
              "projected_min_per_frame_3k_iters": round(per_frame_min, 2),
              "projected_t0_hours_10k_iters": round(t0_hours, 2),
              "loss": round(float(losses[-1]), 4)}
    if not quiet:
        print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
