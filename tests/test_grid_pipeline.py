"""Fused Pallas grid pipeline vs the separate XLA grid passes.

The pipeline (ops.pallas_grid_pipeline) folds normalize+gravity+damping,
the mesh-collider projection, the mover override and the grid BCs into
one pass; these tests pin its parity against the unfused sequence in
core.stepping (interpret mode on CPU).  Supersedes the deleted
ops/pallas_grid.py single-pass kernel tests.
"""

import numpy as np
import jax.numpy as jnp

from test_substep_golden import make_cloth, build_pair

from mpmavatar_tpu.core import stepping
from mpmavatar_tpu.ops import pallas_grid_pipeline as pgp


def test_grid_pipeline_full_substep_parity():
    """One full substep with surface + bbox BCs, mesh collider and mover:
    fused_grid=True must match the unfused XLA grid passes exactly."""
    from mpmavatar_tpu.sim import MPMSolver
    from bench import build_body_sphere

    verts, faces = make_cloth(nx=8, ny=8, y0=1.05, extent=0.4)
    _, cfg, state, model = build_pair(verts, faces, E=400.0, n_grid=32)
    bv, bf = build_body_sphere(n_theta=8, n_phi=8,
                               center=(1.0, 0.85, 1.0), r=0.2)
    mx = jnp.asarray(bv)
    mv = jnp.full_like(mx, 0.1)
    jv = jnp.zeros((cfg.num_joint_v, 3), jnp.float32)

    def run(fused):
        s = MPMSolver(cfg, faces=faces, fused_grid=fused,
                      fused_stress=False)
        s.add_surface_collider([0.0, 0.1, 0.0], [0.0, 1.0, 0.0])
        s.add_bounding_box()
        s.add_mesh_collider(bf, friction=0.5)
        s.add_particle_mover()
        st = state
        t = 0.0
        for _ in range(3):
            st, t = s.frame(st, model, 2e-4, 5, t, mesh_x=mx, mesh_v=mv,
                            joint_verts_v=jv)
        return st

    ref = run(False)
    out = run(True)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v),
                               atol=2e-5)


def test_supported_bcs_gating():
    """Scenes with kernel-unsupported BCs must fall back to the XLA path
    (stepping.p2g2p gates on supported_bcs)."""
    from mpmavatar_tpu.core.colliders import (BoundingBoxCollider,
                                              GridMaskCollider,
                                              SurfaceCollider, STICKY, CUT)
    surf = SurfaceCollider(point=jnp.zeros(3), normal=jnp.asarray(
        [0.0, 1.0, 0.0]), friction=jnp.float32(0.0),
        start_time=jnp.float32(0.0), end_time=jnp.float32(1.0),
        surface_type=STICKY)
    bbox = BoundingBoxCollider(start_time=jnp.float32(0.0),
                               end_time=jnp.float32(1.0))
    cut = SurfaceCollider(point=jnp.zeros(3), normal=jnp.asarray(
        [0.0, 1.0, 0.0]), friction=jnp.float32(0.0),
        start_time=jnp.float32(0.0), end_time=jnp.float32(1.0),
        surface_type=CUT)
    mask = GridMaskCollider(mask=jnp.zeros((2, 2, 2), jnp.int32))
    assert pgp.supported_bcs((surf, bbox))
    assert not pgp.supported_bcs((surf, cut))
    assert not pgp.supported_bcs((mask,))
