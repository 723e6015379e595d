"""SMPL-X npz loading against a synthetic archive with the official
layout (key names / shapes of SMPLX_*.npz)."""

import numpy as np
import jax.numpy as jnp


def make_fake_smplx_npz(path, n_verts=128, n_joints=55, n_faces=200):
    rng = np.random.default_rng(0)
    parents = np.zeros(n_joints, np.uint32)
    parents[0] = np.iinfo(np.uint32).max  # official root marker
    parents[1:] = rng.integers(0, np.arange(1, n_joints))
    kintree = np.stack([parents, np.arange(n_joints, dtype=np.uint32)])
    np.savez(
        path,
        v_template=rng.normal(0, 0.3, (n_verts, 3)).astype(np.float64),
        shapedirs=rng.normal(0, 0.01, (n_verts, 3, 400)),
        posedirs=rng.normal(0, 0.001, (n_verts, 3, (n_joints - 1) * 9)),
        J_regressor=(np.abs(rng.normal(size=(n_joints, n_verts)))
                     / n_verts),
        weights=(lambda w: w / w.sum(1, keepdims=True))(
            np.abs(rng.normal(size=(n_verts, n_joints))) + 1e-3),
        kintree_table=kintree,
        f=rng.integers(0, n_verts, (n_faces, 3)).astype(np.uint32),
        hands_componentsl=rng.normal(size=(45, 45)),
        hands_componentsr=rng.normal(size=(45, 45)),
        hands_meanl=rng.normal(size=45),
        hands_meanr=rng.normal(size=45),
    )


def test_load_official_layout(tmp_path):
    from mpmavatar_tpu.avatar.smplx import load_smplx_npz, smplx_forward
    p = tmp_path / "SMPLX_NEUTRAL.npz"
    make_fake_smplx_npz(p)

    model = load_smplx_npz(str(p), num_betas=300, num_expr=100)
    assert model.parents[0] == -1
    assert len(model.parents) == 55
    assert model.shapedirs.shape[-1] == 300
    assert model.expr_dirs.shape[-1] == 100
    assert model.posedirs.shape == (54 * 9, 128 * 3)

    out = smplx_forward(model, {
        "trans": jnp.zeros((1, 3)),
        "orient": jnp.zeros((1, 3)),
        "body_pose": jnp.zeros((1, 63)),
        "beta": jnp.zeros((1, 300)),
        "expr": jnp.zeros((1, 100)),
        "jaw_pose": jnp.zeros((1, 3)),
        "left_eye_pose": jnp.zeros((1, 3)),
        "right_eye_pose": jnp.zeros((1, 3)),
        "left_hand_pose": jnp.zeros((1, 45)),
        "right_hand_pose": jnp.zeros((1, 45)),
    })
    assert out.vertices.shape == (1, 128, 3)
    assert np.isfinite(np.asarray(out.vertices)).all()
    # rest pose + zero betas => v_template (pose blendshapes vanish)
    np.testing.assert_allclose(np.asarray(out.vertices[0]),
                               np.asarray(model.v_template), atol=1e-4)


def test_pca_hand_coding(tmp_path):
    from mpmavatar_tpu.avatar.smplx import load_smplx_npz, smplx_forward
    p = tmp_path / "SMPLX_NEUTRAL.npz"
    make_fake_smplx_npz(p)
    model = load_smplx_npz(str(p), num_betas=10, num_expr=10, use_pca=True,
                           num_pca_comps=12)
    assert model.hands_componentsl.shape == (12, 45)
    out = smplx_forward(model, {
        "trans": jnp.zeros((1, 3)), "orient": jnp.zeros((1, 3)),
        "body_pose": jnp.zeros((1, 63)), "beta": jnp.zeros((1, 10)),
        "expr": jnp.zeros((1, 10)),
        "left_hand_pose": jnp.zeros((1, 12)),
        "right_hand_pose": jnp.zeros((1, 12)),
    })
    assert np.isfinite(np.asarray(out.vertices)).all()
