"""On-chip phase profile of the rasterizer for a given splat distribution.

Times projection, instance sort, worklist assembly+gather, segment
kernel and combine scan separately, and prints the pool populations the
caps must cover.  Run on the TPU:
    python -u scripts/profile_render.py [--big] [--iters 20]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax_flat = [x for x in jax.tree_util.tree_leaves(out)]
    float(jax_flat[0].sum())  # force host sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax_flat[0].sum())
    import jax as _j
    _j.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--big", action="store_true", default=True)
    parser.add_argument("--small", dest="big", action="store_false")
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    global jax
    import jax
    from mpmavatar_tpu.utils import compile_cache
    compile_cache.setup()
    import jax.numpy as jnp
    import numpy as np

    from mpmavatar_tpu.render import camera_arrays
    from mpmavatar_tpu.render import rasterizer as R
    from mpmavatar_tpu.render.cameras import Camera
    from mpmavatar_tpu.render.geometry import \
        covariance_from_scaling_rotation

    n = 50_000
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(0, 0.4, (n, 3)).astype(np.float32))
    colors = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    opac = jnp.asarray((0.3 + 0.6 * rng.random(n)).astype(np.float32))
    if args.big:
        scales = jnp.asarray(
            (0.01 + 0.02 * rng.random((n, 3))).astype(np.float32))
        kw = dict(tile_capacity=4096, max_tiles_per_gauss=196, chunk=128,
                  work_cap=12288,
                  tiers=((2, None), (4, 8192), (6, 36864),
                         (8, 12288), (12, 512)))
    else:
        scales = jnp.asarray(
            (0.001 + 0.003 * rng.random((n, 3))).astype(np.float32))
        kw = dict(tile_capacity=512, work_cap=8192)
    rots = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    cov3d = covariance_from_scaling_rotation(scales, 1.0, rots)

    w, h = 1920, 1080
    k = np.array([[1500.0, 0, w / 2], [0, 1500.0, h / 2], [0, 0, 1]])
    w2c = np.eye(4)
    w2c[2, 3] = 3.0
    cam = Camera.from_kw2c("bench", w, h, k, w2c, near=0.5, far=20.0)
    ca = camera_arrays(cam)
    it = args.iters

    # full frame
    full = jax.jit(lambda x: R.rasterize(
        x, colors, opac, cov3d, ca, jnp.zeros(3), width=w, height=h,
        **kw)["render"])
    t_full, _ = timeit(full, xyz, iters=it)
    print(f"full rasterize      {t_full:8.2f} ms")

    # phase 1: projection
    proj = jax.jit(lambda x: R.project_gaussians(x, cov3d, ca, w, h))
    t_proj, (means2d, depth, conic, radius, inf) = timeit(proj, xyz,
                                                          iters=it)
    print(f"project             {t_proj:8.2f} ms")

    # pool populations
    tiles_x = (w + R.TILE - 1) // R.TILE
    rmin = jnp.clip(((means2d[:, 0] - radius) / R.TILE).astype(jnp.int32),
                    0, tiles_x)
    rmax = jnp.clip(((means2d[:, 0] + radius + R.TILE - 1) / R.TILE
                     ).astype(jnp.int32), 0, tiles_x)
    tiles_y = (h + R.TILE - 1) // R.TILE
    rminy = jnp.clip(((means2d[:, 1] - radius) / R.TILE).astype(jnp.int32),
                     0, tiles_y)
    rmaxy = jnp.clip(((means2d[:, 1] + radius + R.TILE - 1) / R.TILE
                      ).astype(jnp.int32), 0, tiles_y)
    w_t = np.asarray(rmax - rmin)
    h_t = np.asarray(rmaxy - rminy)
    ok = np.asarray(inf & (radius > 0))
    span = np.maximum(w_t, h_t)[ok]
    for lim in (2, 4, 6, 8, 12):
        print(f"  pop span>{lim}:  {(span > lim).sum():7d}")
    print(f"  max span: {span.max()}, instances(sum rect): "
          f"{(w_t * h_t)[ok].sum()}")

    # phase 2: sorted instances
    srt = jax.jit(lambda m, d, r, v: R._sorted_instances(
        m, d, r, v, w, h, kw.get("max_tiles_per_gauss", 36),
        mid_capacity=kw.get("mid_capacity"),
        big_capacity=kw.get("big_capacity"),
        tiers=kw.get("tiers")))
    t_sort, (ts, gs, edges, bov) = timeit(srt, means2d, depth, radius,
                                          inf, iters=it)
    print(f"sorted_instances    {t_sort:8.2f} ms  "
          f"(sort size {ts.shape[0]}, big_overflow {int(bov)})")

    num_tiles = tiles_x * tiles_y
    counts = np.asarray(edges[1:num_tiles + 1] - edges[:num_tiles])
    chunk = kw.get("chunk", 32)
    cap = kw["tile_capacity"]
    n_items = int(np.ceil(np.minimum(counts, cap) / chunk).sum())
    print(f"  real tile counts: mean {counts.mean():.0f} max "
          f"{counts.max()} -> n_items {n_items} (work_cap "
          f"{kw['work_cap']})")

    # phase 3: worklist composite (gather + kernel + combine)
    wl = jax.jit(lambda gs_, e_, m_, c_, o_: R._composite_worklist(
        gs_, e_, m_, conic, c_, o_, w, h, jnp.zeros(3), chunk=chunk,
        work_cap=kw["work_cap"], tile_capacity=cap,
        instance_cap=kw.get("instance_cap", 0)))
    t_wl, _ = timeit(wl, gs, edges, means2d, colors, opac, iters=it)
    print(f"composite_worklist  {t_wl:8.2f} ms")
    print(f"(sum of phases      {t_proj + t_sort + t_wl:8.2f} ms)")


if __name__ == "__main__":
    main()
