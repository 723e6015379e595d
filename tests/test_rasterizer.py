"""Rasterizer tests: analytic single-gaussian splats, occlusion ordering,
alpha mask, differentiability (SURVEY.md §4 test plan item (e))."""

import numpy as np
import jax
import jax.numpy as jnp

from mpmavatar_tpu.render import (Camera, camera_arrays, rasterize,
                                  render)
from mpmavatar_tpu.render import gaussians as G
from mpmavatar_tpu.render.rasterizer import project_gaussians


def simple_camera(w=64, h=64, f=60.0, cam_z=-3.0):
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
    w2c = np.eye(4)
    w2c[2, 3] = -cam_z  # camera at z = cam_z looking +z
    return Camera.from_kw2c("test", w, h, k, w2c, near=0.5, far=20.0)


def iso_cov(n, s):
    return jnp.broadcast_to(jnp.eye(3) * s * s, (n, 3, 3)).astype(jnp.float32)


def test_single_gaussian_center_projection():
    cam = simple_camera()
    means = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    m2d, depth, conic, radius, vis = project_gaussians(
        means, iso_cov(1, 0.05), camera_arrays(cam), 64, 64)
    # center of image is pixel (w-1)/2 with this convention
    np.testing.assert_allclose(np.asarray(m2d)[0], [31.5, 31.5], atol=0.6)
    assert float(depth[0]) > 0
    assert bool(vis[0])


def test_single_gaussian_renders_blob():
    cam = simple_camera()
    means = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    out = rasterize(means, jnp.asarray([[1.0, 0.0, 0.0]]),
                    jnp.asarray([0.9]), iso_cov(1, 0.1),
                    camera_arrays(cam), jnp.zeros(3), 64, 64)
    img = np.asarray(out["render"])
    alpha = np.asarray(out["alpha"])
    assert img.shape == (3, 64, 64)
    # red blob centered; corner empty
    assert img[0, 31, 31] > 0.5
    assert img[1, 31, 31] < 1e-3
    assert img[0, 0, 0] < 1e-3
    assert alpha[0, 31, 31] > 0.5
    assert alpha[0, 0, 0] < 1e-3
    # radially symmetric-ish
    np.testing.assert_allclose(img[0, 31, 25], img[0, 31, 37], atol=0.08)


def test_gaussian_alpha_profile_matches_analytic():
    """Peak alpha of a single splat = min(.99, o) * exp(-.5 d^T conic d)."""
    cam = simple_camera()
    means = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    opac = 0.8
    out = rasterize(means, jnp.ones((1, 3)), jnp.asarray([opac]),
                    iso_cov(1, 0.1), camera_arrays(cam),
                    jnp.zeros(3), 64, 64)
    m2d, depth, conic, radius, vis = project_gaussians(
        means, iso_cov(1, 0.1), camera_arrays(cam), 64, 64)
    alpha = np.asarray(out["alpha"])[0]
    c = np.asarray(conic)[0]
    mu = np.asarray(m2d)[0]
    for px, py in [(31, 31), (28, 33), (36, 30)]:
        d = np.array([px, py]) - mu
        expect = opac * np.exp(-0.5 * (c[0] * d[0] ** 2 + c[2] * d[1] ** 2)
                               - c[1] * d[0] * d[1])
        if expect < 1 / 255:
            expect = 0.0
        np.testing.assert_allclose(alpha[py, px], expect, atol=1e-3)


def test_occlusion_order():
    """Near gaussian occludes far one regardless of input order."""
    cam = simple_camera()
    means = jnp.asarray([[0.0, 0.0, 1.0],    # far, green
                         [0.0, 0.0, 0.0]],   # near, red
                        jnp.float32)
    colors = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    out = rasterize(means, colors, jnp.asarray([0.99, 0.99]),
                    iso_cov(2, 0.1), camera_arrays(cam), jnp.zeros(3),
                    64, 64)
    img = np.asarray(out["render"])
    assert img[0, 31, 31] > 0.9      # red in front
    assert img[1, 31, 31] < 0.1


def test_background_composited():
    cam = simple_camera()
    out = rasterize(jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32),
                    jnp.ones((1, 3)), jnp.asarray([0.5]), iso_cov(1, 0.05),
                    camera_arrays(cam), jnp.asarray([0.2, 0.4, 0.6]),
                    64, 64)
    img = np.asarray(out["render"])
    np.testing.assert_allclose(img[:, 0, 0], [0.2, 0.4, 0.6], atol=1e-5)


def test_rasterizer_is_differentiable():
    cam = simple_camera()
    ca = camera_arrays(cam)

    def loss(means):
        out = rasterize(means, jnp.ones((2, 3)), jnp.asarray([0.8, 0.8]),
                        iso_cov(2, 0.1), ca, jnp.zeros(3), 64, 64)
        return jnp.sum(out["render"] ** 2)

    means = jnp.asarray([[0.0, 0.0, 0.0], [0.3, 0.1, 0.5]], jnp.float32)
    g = jax.grad(loss)(means)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_mesh_bound_render_end_to_end():
    """Face-bound gaussians on a triangle render through the full API."""
    verts = jnp.asarray([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0],
                         [0.0, 0.5, 0.0]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    params = G.init_from_mesh(1, sh_degree=1,
                              rgb=np.asarray([[0.8, 0.2, 0.2]]))
    frames = G.face_frames_from_verts(verts, faces)
    cam = simple_camera()
    out = render(cam, params, frames, bg_color=jnp.zeros(3),
                 active_sh_degree=0)
    img = np.asarray(out["render"])
    assert np.isfinite(img).all()
    assert img[0].max() > 0.05          # something rendered
    assert out["mask"].shape == (1, 64, 64)


def test_extra_gaussians_path():
    """Demo `extra` path: appended gaussians render and occlude
    (gaussian_renderer/__init__.py:85-92)."""
    from mpmavatar_tpu.render.geometry import \
        covariance_from_scaling_rotation
    verts = jnp.asarray([[-0.5, -0.5, 0.5], [0.5, -0.5, 0.5],
                         [0.0, 0.5, 0.5]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    params = G.init_from_mesh(1, sh_degree=1,
                              rgb=np.asarray([[0.0, 0.8, 0.0]]))
    frames = G.face_frames_from_verts(verts, faces)
    cam = simple_camera()

    # extra red blob in FRONT of the avatar triangle
    n = 1
    exyz = jnp.asarray([[0.0, 0.0, -0.5]], jnp.float32)
    ecol = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    eop = jnp.asarray([0.95], jnp.float32)
    ecov = covariance_from_scaling_rotation(
        jnp.full((n, 3), 0.15), 1.0,
        jnp.zeros((n, 4)).at[:, 0].set(1.0))

    out = render(cam, params, frames, bg_color=jnp.zeros(3),
                 active_sh_degree=0, extra=(exyz, ecol, eop, ecov))
    img = np.asarray(out["render"])
    assert img[0, 31, 31] > 0.5     # red extra in front
    out2 = render(cam, params, frames, bg_color=jnp.zeros(3),
                  active_sh_degree=0)
    img2 = np.asarray(out2["render"])
    assert img2[0, 31, 31] < 0.1    # without extra: no red


def test_two_tier_compositing_matches_full():
    """tile_capacity_lo + hot_tiles two-tier path is exact when the hot
    set covers every tile denser than the low capacity."""
    rng = np.random.default_rng(3)
    n = 1500
    xyz = jnp.asarray(rng.normal(0, 0.3, (n, 3)).astype(np.float32))
    colors = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    opac = jnp.asarray((0.3 + 0.6 * rng.random(n)).astype(np.float32))
    cov = iso_cov(n, 0.02)
    cam = simple_camera()
    ca = camera_arrays(cam)
    full = rasterize(xyz, colors, opac, cov, ca, jnp.zeros(3), 64, 64,
                     tile_capacity=256)
    two = rasterize(xyz, colors, opac, cov, ca, jnp.zeros(3), 64, 64,
                    tile_capacity=256, tile_capacity_lo=32, hot_tiles=16)
    np.testing.assert_allclose(np.asarray(two["render"]),
                               np.asarray(full["render"]), atol=1e-5)

    def loss(m):
        o = rasterize(m, colors, opac, cov, ca, jnp.zeros(3), 64, 64,
                      tile_capacity=256, tile_capacity_lo=32, hot_tiles=16)
        return jnp.sum(o["render"] ** 2)

    g = jax.grad(loss)(xyz)
    assert np.isfinite(np.asarray(g)).all()


def test_big_footprint_pool():
    """Gaussians spanning many tiles go through the big-instance pool and
    still render full coverage; overflow count is exposed."""
    cam = simple_camera()
    # one huge gaussian covering most of the 64x64 frame (16 tiles)
    out = rasterize(jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32),
                    jnp.asarray([[1.0, 0.0, 0.0]]), jnp.asarray([0.9]),
                    iso_cov(1, 0.5), camera_arrays(cam), jnp.zeros(3),
                    64, 64)
    img = np.asarray(out["render"])
    assert int(out["big_overflow"]) == 0
    # red in all four quadrant tiles, far from the 2x2 top-left prefix
    assert img[0, 16, 16] > 0.05 and img[0, 16, 47] > 0.05
    assert img[0, 47, 16] > 0.05 and img[0, 47, 47] > 0.05


def test_worklist_compositing_matches_full():
    """work_cap>0 (compacted tile worklist) matches the flat compositor
    exactly and reports zero overflow when sized correctly."""
    rng = np.random.default_rng(5)
    n = 1200
    xyz = jnp.asarray(rng.normal(0, 0.3, (n, 3)).astype(np.float32))
    colors = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    opac = jnp.asarray((0.3 + 0.6 * rng.random(n)).astype(np.float32))
    cov = iso_cov(n, 0.02)
    ca = camera_arrays(simple_camera())
    full = rasterize(xyz, colors, opac, cov, ca, jnp.zeros(3), 64, 64,
                     tile_capacity=256)
    wl = rasterize(xyz, colors, opac, cov, ca, jnp.zeros(3), 64, 64,
                   tile_capacity=256, work_cap=512)
    assert int(wl["work_overflow"]) == 0
    np.testing.assert_allclose(np.asarray(wl["render"]),
                               np.asarray(full["render"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(wl["alpha"]),
                               np.asarray(full["alpha"]), atol=1e-5)

    # the Pallas segment kernel's custom VJP matches the flat path's
    # gradient (XLA re-trace backward)
    def loss(path_kw):
        def f(op):
            out = rasterize(xyz, colors, op, cov, ca, jnp.zeros(3),
                            64, 64, tile_capacity=256, **path_kw)
            return jnp.sum(out["render"] ** 2)
        return jax.grad(f)(opac)

    g_full = loss({})
    g_wl = loss({"work_cap": 512})
    np.testing.assert_allclose(np.asarray(g_wl), np.asarray(g_full),
                               atol=1e-4)

    # chunk=128 (the big-splat bench configuration: full sublane axis in
    # the segment kernel, 4x shorter worklist) is parity-exact too
    wl128 = rasterize(xyz, colors, opac, cov, ca, jnp.zeros(3), 64, 64,
                      tile_capacity=256, work_cap=512, chunk=128)
    assert int(wl128["work_overflow"]) == 0
    np.testing.assert_allclose(np.asarray(wl128["render"]),
                               np.asarray(full["render"]), atol=1e-5)
