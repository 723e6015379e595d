"""Avatar / LBS tests on a synthetic rig (SURVEY.md §2.3 capability)."""

import numpy as np
import jax.numpy as jnp

from mpmavatar_tpu.avatar import lbs, make_test_rig, smplx_forward


def _params(b=1, n_joints=4, n_betas=5):
    return {
        "trans": jnp.zeros((b, 3)),
        "orient": jnp.zeros((b, 3)),
        "body_pose": jnp.zeros((b, (n_joints - 1) * 3)),
        "beta": jnp.zeros((b, n_betas)),
        "expr": jnp.zeros((b, 2)),
        "scale": jnp.ones(()),
    }


def test_rest_pose_identity():
    model = make_test_rig()
    out = smplx_forward(model, _params(), use_pose_blendshapes=False)
    np.testing.assert_allclose(np.asarray(out.vertices[0]),
                               np.asarray(model.v_template), atol=1e-5)
    # rest-pose relative transforms are identity
    np.testing.assert_allclose(
        np.asarray(out.transform_mat[0]),
        np.tile(np.eye(4), (len(model.parents), 1, 1)), atol=1e-5)


def test_global_rotation_rotates_rigidly():
    model = make_test_rig()
    p = _params()
    angle = np.pi / 2
    p["orient"] = jnp.asarray([[0.0, 0.0, angle]])
    out = smplx_forward(model, p, use_pose_blendshapes=False)
    rot = np.array([[np.cos(angle), -np.sin(angle), 0],
                    [np.sin(angle), np.cos(angle), 0], [0, 0, 1]])
    # rigid rotation about the root joint location
    j0 = np.asarray(
        lbs.vertices2joints(model.j_regressor,
                            model.v_template[None]))[0, 0]
    expect = (np.asarray(model.v_template) - j0) @ rot.T + j0
    np.testing.assert_allclose(np.asarray(out.vertices[0]), expect,
                               atol=1e-4)


def test_translation_and_scale():
    model = make_test_rig()
    p = _params()
    p["trans"] = jnp.asarray([[1.0, 2.0, 3.0]])
    p["scale"] = jnp.asarray(2.0)
    out = smplx_forward(model, p, use_pose_blendshapes=False)
    expect = (np.asarray(model.v_template) + np.array([1, 2, 3])) * 2.0
    np.testing.assert_allclose(np.asarray(out.vertices[0]), expect,
                               atol=1e-5)


def test_inverse_forward_lbs_roundtrip():
    """transform_to_t_pose then transform_to_pose recovers the points
    (smplx_deformer.py:207-337 semantics)."""
    model = make_test_rig()
    p = _params()
    rng = np.random.default_rng(1)
    p["body_pose"] = jnp.asarray(
        rng.uniform(-0.4, 0.4, (1, 9)).astype(np.float32))
    out = smplx_forward(model, p, use_pose_blendshapes=False)

    # garment points near body surface, posed with the body
    offs = rng.normal(0, 0.02, (32, 3)).astype(np.float32)
    pick = rng.integers(0, model.v_template.shape[0], 32)
    posed_pts = np.asarray(out.vertices[0])[pick] + offs

    t_pts, t_inv, w = lbs.transform_to_t_pose(
        jnp.asarray(posed_pts), out.vertices[0], out.transform_mat[0],
        lbs_weights_packed=model.lbs_weights, k=5)
    reposed, _ = lbs.transform_to_pose(t_pts, w, out.transform_mat[0])
    np.testing.assert_allclose(np.asarray(reposed), posed_pts, atol=1e-4)


def test_knn_weight_transfer_matches_body_weights():
    model = make_test_rig()
    # points exactly on body vertices inherit (approximately) their weights
    pts = model.v_template[::7]
    w, idx = lbs.shepard_weights(pts, model.v_template, k=4, p=2)
    blended = jnp.einsum("pkj,pk->pj", model.lbs_weights[idx], w)
    np.testing.assert_allclose(np.asarray(blended),
                               np.asarray(model.lbs_weights[::7]), atol=1e-3)


def test_deform_tracked_to_poses_roundtrip():
    """Inverse-LBS first frame then forward-LBS back to the same pose
    recovers the tracked vertices (train_material_params.py:335-354)."""
    import jax
    from mpmavatar_tpu.avatar.pipeline import deform_tracked_to_poses
    model = make_test_rig()
    rng = np.random.default_rng(3)
    first = {
        "trans": jnp.asarray([[0.1, 0.0, -0.2]]),
        "orient": jnp.zeros((1, 3)),
        "body_pose": jnp.asarray(rng.uniform(-0.3, 0.3, (1, 9)),
                                 jnp.float32),
        "beta": jnp.zeros((1, 5)), "expr": jnp.zeros((1, 2)),
        "scale": jnp.asarray(1.0),
    }
    out_first = smplx_forward(model, first, use_pose_blendshapes=False)
    # tracked mesh = body surface + noise, posed like the first frame
    pick = rng.integers(0, model.v_template.shape[0], 40)
    tracked = np.asarray(out_first.vertices[0])[pick] \
        + rng.normal(0, 0.01, (40, 3)).astype(np.float32)

    poses = {k: (jnp.concatenate([v, v], 0) if k != "scale" else v)
             for k, v in first.items()}
    deformed, _, w = deform_tracked_to_poses(model, tracked, first, poses,
                                             k=4)
    assert deformed.shape == (2, 40, 3)
    # same pose as the reference frame: exact roundtrip (trans/scale are
    # removed by the inverse and reapplied by the forward pass)
    np.testing.assert_allclose(np.asarray(deformed[0]), tracked,
                               atol=2e-3)
