"""Fused plane-form stress kernel vs the (E,3,3) reference path."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from test_substep_golden import make_cloth, build_pair

from mpmavatar_tpu.core import stepping
from mpmavatar_tpu.ops.pallas_stress import cloth_stress_fused


def _scene(bend=True):
    verts, faces = make_cloth(nx=9, ny=9, y0=1.1, extent=0.5)
    _, cfg, state, model = build_pair(verts, faces, E=500.0)
    if bend:
        # deform d so the return map's separated/slipping branches and a
        # non-trivial QR all get exercised
        rng = np.random.default_rng(0)
        import dataclasses
        d = np.asarray(state.d)
        d = d + rng.normal(0, 0.02, d.shape).astype(np.float32)
        d[:, :, 2] *= rng.uniform(0.5, 1.6, (len(d), 1)).astype(np.float32)
        state = dataclasses.replace(state, d=jnp.asarray(d))
    return cfg, state, model


def test_stress_fused_matches_reference_path():
    cfg, state, model = _scene()
    ref = stepping.compute_stress(cfg, state, model, 1e-4)
    out = stepping.compute_stress(cfg, state, model, 1e-4, pallas=True)
    names = ("new_d", "new_F", "yield", "stress", "vertex_force")
    for a, b, n in zip(out, ref, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, err_msg=n)


def test_stress_fused_selection_mask():
    import dataclasses
    cfg, state, model = _scene()
    sel = np.zeros(cfg.n_particles, np.int32)
    sel[: cfg.n_elements // 2] = 1          # freeze half the elements
    state = dataclasses.replace(state, selection=jnp.asarray(sel))
    ref = stepping.compute_stress(cfg, state, model, 1e-4)
    out = stepping.compute_stress(cfg, state, model, 1e-4, pallas=True)
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(ref[3]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=3e-5)


@pytest.mark.slow
def test_stress_fused_gradients():
    cfg, state, model = _scene()

    def loss(d, pallas):
        import dataclasses
        st = dataclasses.replace(state, d=d)
        _, _, _, stress, vf = stepping.compute_stress(cfg, st, model,
                                                      1e-4, pallas=pallas)
        return jnp.sum(stress ** 2) + jnp.sum(vf ** 2)

    g_ref = jax.grad(lambda d: loss(d, False))(state.d)
    g_pal = jax.grad(lambda d: loss(d, True))(state.d)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-2)


def _sand_inputs(t=600, seed=0):
    rng = np.random.default_rng(seed)
    f_trial = np.eye(3) + 0.15 * rng.standard_normal((t, 3, 3))
    # a few deliberately expanding / compressing / reflected cases
    f_trial[: t // 8] *= 1.5          # tr(eps) > 0 -> cone tip
    f_trial[t // 8: t // 4] *= 0.5    # strong compression -> projection
    f_trial[t // 4] = np.diag([1.0, 1.0, -1.0]) @ f_trial[t // 4]
    f_prev = np.eye(3) + 0.05 * rng.standard_normal((t, 3, 3))
    sel = (rng.random(t) > 0.2).astype(np.float32)
    mu = np.full(t, 400.0, np.float32)
    lam = np.full(t, 600.0, np.float32)
    return (jnp.asarray(f_trial, jnp.float32),
            jnp.asarray(f_prev, jnp.float32), jnp.asarray(sel),
            jnp.asarray(mu), jnp.asarray(lam), jnp.float32(0.3))


def test_sand_stress_fused_matches_reference_path():
    """Fused sand kernel == sand_return_mapping + svd3 + DP stress on the
    (T,3,3) path (the material==2 branch of compute_stress)."""
    from mpmavatar_tpu.core import constitutive, linalg
    from mpmavatar_tpu.ops.pallas_stress import sand_stress_fused

    f_trial, f_prev, sel, mu, lam, alpha = _sand_inputs()
    f_ref = constitutive.sand_return_mapping(f_trial, mu, lam, alpha)
    f_ref = jnp.where((sel > 0.5)[:, None, None], f_ref, f_prev)
    u, sig, v = linalg.svd3(f_ref)
    st = constitutive.kirchoff_stress_drucker_prager(f_ref, u, v, sig,
                                                     mu, lam)
    st = 0.5 * (st + jnp.swapaxes(st, -1, -2))
    st_ref = jnp.where((sel > 0.5)[:, None, None], st, 0.0)

    f_new, stress = sand_stress_fused(f_trial, f_prev, sel, mu, lam,
                                      alpha)
    np.testing.assert_allclose(np.asarray(f_new), np.asarray(f_ref),
                               atol=2e-5)
    # stress magnitudes are O(mu); compare at a relative-ish tolerance
    scale = float(jnp.max(jnp.abs(st_ref))) + 1e-6
    np.testing.assert_allclose(np.asarray(stress) / scale,
                               np.asarray(st_ref) / scale, atol=3e-5)


def test_compute_stress_sand_pallas_dispatch():
    """compute_stress(pallas=True) on a material-2 config routes the
    traditional block through the fused kernel and matches pallas=False."""
    import dataclasses
    from mpmavatar_tpu.core import types

    t = 257
    rng = np.random.default_rng(1)
    cfg = types.MPMStaticConfig(n_elements=0, n_traditional=t,
                                n_vertices=0, n_grid=32, grid_lim=2.0,
                                material=2)
    x = jnp.asarray(rng.uniform(0.6, 1.4, (t, 3)), jnp.float32)
    state = types.make_state(cfg, x, vol=jnp.full((t,), 1e-7,
                                                  jnp.float32))
    f_trial = jnp.asarray(np.eye(3) + 0.2 * rng.standard_normal(
        (t, 3, 3)), jnp.float32)
    state = dataclasses.replace(state, F_trial=f_trial)
    model = types.make_model(cfg.n_particles, E=2000.0, nu=0.3)

    outs_ref = stepping.compute_stress(cfg, state, model, 1e-4,
                                       pallas=False)
    outs_pal = stepping.compute_stress(cfg, state, model, 1e-4,
                                       pallas=True)
    for a, b in zip(outs_ref, outs_pal):
        if a.size == 0:
            continue
        # stress tolerance scales with mu: near sigma=1 the reference's
        # log(svd(recomposed F)) amplifies f32 noise by ~2*mu (the fused
        # kernel computes log sigma exactly from the return map)
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=3e-5)
