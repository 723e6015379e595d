"""Golden trajectory tests: vectorized JAX substep vs the scalar numpy
transliteration of the reference Warp kernels."""

import numpy as np
import jax.numpy as jnp

from mpmavatar_tpu.core import stepping, types
from mpmavatar_tpu.core.colliders import ColliderSet, MeshCollider, SurfaceCollider

from reference_numpy import RefCloth


def make_cloth(nx=5, ny=5, y0=1.0, extent=0.4):
    xs = np.linspace(1.0 - extent / 2, 1.0 + extent / 2, nx)
    zs = np.linspace(1.0 - extent / 2, 1.0 + extent / 2, ny)
    verts = np.stack(np.meshgrid(xs, zs, indexing="ij"), -1).reshape(-1, 2)
    verts = np.stack([verts[:, 0], np.full(len(verts), y0), verts[:, 1]], -1)
    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            b = a + 1
            c = a + ny
            d = c + 1
            faces.append([a, b, c])
            faces.append([b, d, c])
    return verts.astype(np.float64), np.asarray(faces, np.int32)


def build_pair(verts, faces, n_grid=32, density=1.0, E=200.0, nu=0.3,
               gamma=500.0, kappa=500.0, mesh_friction=0.5):
    ref = RefCloth(verts, faces, n_grid=n_grid, grid_lim=2.0,
                   density=density, E=E, nu=nu, gamma=gamma, kappa=kappa,
                   mesh_friction=mesh_friction)

    cfg = types.MPMStaticConfig(
        n_elements=len(faces), n_traditional=0, n_vertices=len(verts),
        n_grid=n_grid, grid_lim=2.0, material=7)
    d, r_inv, evol, vvol = types.cloth_geometry(
        jnp.asarray(verts, jnp.float32), jnp.asarray(faces))
    x = jnp.concatenate([jnp.asarray(verts, jnp.float32)[faces].mean(1),
                         jnp.asarray(verts, jnp.float32)], 0)
    vol = jnp.concatenate([evol, vvol], 0)
    state = types.make_state(cfg, x, faces=faces, d=d, R_inv=r_inv, vol=vol,
                             density=jnp.full((cfg.n_particles,), density))
    model = types.make_model(cfg.n_particles, E=E, nu=nu, gamma=gamma,
                             kappa=kappa)
    return ref, cfg, state, model


def compare(ref, state, atol):
    E = ref.E
    np.testing.assert_allclose(np.asarray(state.x[E:]), ref.x[E:], atol=atol)
    np.testing.assert_allclose(np.asarray(state.v[E:]), ref.v[E:], atol=atol * 50)
    np.testing.assert_allclose(np.asarray(state.d), ref.d, atol=atol * 10)


def test_free_fall_matches_reference():
    verts, faces = make_cloth()
    ref, cfg, state, model = build_pair(verts, faces)
    colliders = ColliderSet()
    dt = 1e-4
    for s in range(10):
        ref.substep(dt)
        state = stepping.p2g2p(cfg, colliders, state, model, dt,
                               jnp.float32(s * dt))
    compare(ref, state, atol=2e-5)
    # sanity: cloth actually fell
    assert ref.x[:, 1].mean() < 1.0


def test_mesh_collider_and_pinning_matches_reference():
    verts, faces = make_cloth(y0=1.0)
    # body: a quad slightly below the cloth
    mesh_x = np.array([
        [0.6, 0.985, 0.6], [1.4, 0.985, 0.6], [1.4, 0.985, 1.4],
        [0.6, 0.985, 1.4]])
    mesh_f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh_v = np.zeros_like(mesh_x)

    num_joint_v, num_joint_f = 5, 3
    jv = np.tile(np.array([[0.05, 0.0, 0.0]]), (num_joint_v, 1))
    jf = np.tile(np.array([[0.05, 0.0, 0.0]]), (num_joint_f, 1))

    ref, cfg, state, model = build_pair(verts, faces)
    cfg = types.MPMStaticConfig(
        n_elements=cfg.n_elements, n_traditional=0, n_vertices=cfg.n_vertices,
        n_grid=cfg.n_grid, grid_lim=2.0, material=7,
        num_joint_v=num_joint_v, num_joint_f=num_joint_f)
    colliders = ColliderSet(
        grid_post=(SurfaceCollider(
            point=jnp.asarray([0.0, 0.1, 0.0], jnp.float32),
            normal=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
            friction=jnp.float32(0.0), start_time=jnp.float32(0.0),
            end_time=jnp.float32(999.0)),),
        mesh_colliders=(MeshCollider(faces=jnp.asarray(mesh_f),
                                     friction=jnp.float32(0.5)),),
        use_particle_mover=True,
    )
    dt = 1e-4
    for s in range(10):
        ref.substep(dt, mesh_x=mesh_x, mesh_v=mesh_v, mesh_faces=mesh_f,
                    joint_verts_v=jv, num_joint_v=num_joint_v,
                    joint_faces_v=jf, num_joint_f=num_joint_f,
                    floor_y=0.1)
        state = stepping.p2g2p(
            cfg, colliders, state, model, dt, jnp.float32(s * dt),
            mesh_x=jnp.asarray(mesh_x, jnp.float32),
            mesh_v=jnp.asarray(mesh_v, jnp.float32),
            joint_verts_v=jnp.asarray(jv, jnp.float32),
            joint_faces_v=jnp.asarray(jf, jnp.float32))
    compare(ref, state, atol=2e-5)
    # pinned vertices moved with the prescribed velocity (+x)
    moved = np.asarray(state.x)[ref.E:ref.E + num_joint_v, 0] - \
        verts[:num_joint_v, 0]
    assert np.all(moved > 1e-5)


def test_momentum_conservation_no_forces():
    """P2G + grid + G2P without gravity/stress conserves linear momentum
    (traditional-particle population, elastic material with zero moduli)."""
    import dataclasses
    rng = np.random.default_rng(0)
    n = 256
    cfg = types.MPMStaticConfig(n_elements=0, n_traditional=n, n_vertices=0,
                                n_grid=32, grid_lim=2.0, material=7)
    x = (0.6 + 0.8 * rng.random((n, 3))).astype(np.float32)
    state = types.make_state(cfg, jnp.asarray(x),
                             vol=jnp.full((n,), 1e-4),
                             density=jnp.ones((n,)))
    model = types.make_model(n, E=0.0, nu=0.3)
    model = dataclasses.replace(model, gravity=jnp.zeros(3))
    v0 = rng.normal(scale=0.1, size=(n, 3)).astype(np.float32)
    state = dataclasses.replace(state, v=jnp.asarray(v0))
    p_before = np.asarray(jnp.sum(state.mass[:, None] * state.v, axis=0))
    state2 = stepping.p2g2p(cfg, ColliderSet(), state, model, 1e-4,
                            jnp.float32(0.0))
    p_after = np.asarray(jnp.sum(state2.mass[:, None] * state2.v, axis=0))
    np.testing.assert_allclose(p_after, p_before, atol=1e-5)
