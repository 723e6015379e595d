import numpy as np
import jax.numpy as jnp

from mpmavatar_tpu.core import linalg


def test_qr3_reconstruction_and_signs():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(64, 3, 3)).astype(np.float32)
    q, r = linalg.qr3_pos(jnp.asarray(d))
    q, r = np.asarray(q), np.asarray(r)
    # reconstruction
    np.testing.assert_allclose(q @ r, d, atol=2e-5)
    # proper rotation
    np.testing.assert_allclose(np.linalg.det(q), 1.0, atol=1e-4)
    # upper triangular, positive leading diagonal
    assert np.all(np.abs(r[:, 1, 0]) < 1e-6)
    assert np.all(np.abs(r[:, 2, 0]) < 1e-6)
    assert np.all(np.abs(r[:, 2, 1]) < 1e-6)
    assert np.all(r[:, 0, 0] > 0)
    assert np.all(r[:, 1, 1] > 0)
    # R33 carries orientation sign
    np.testing.assert_allclose(
        r[:, 0, 0] * r[:, 1, 1] * r[:, 2, 2], np.linalg.det(d), rtol=1e-3, atol=1e-5
    )


def test_polar2x2_matches_svd():
    rng = np.random.default_rng(1)
    for _ in range(50):
        a = rng.normal(size=(2, 2))
        if np.linalg.det(a) <= 0.05:
            continue
        u, _, vt = np.linalg.svd(a)
        rot_ref = u @ vt
        c, s = linalg.polar2x2_rotation(*[jnp.float32(x) for x in
                                          (a[0, 0], a[0, 1], a[1, 0], a[1, 1])])
        rot = np.array([[float(c), -float(s)], [float(s), float(c)]])
        np.testing.assert_allclose(rot, rot_ref, atol=1e-5)


def test_svd3_reconstruction():
    rng = np.random.default_rng(2)
    f = rng.normal(size=(128, 3, 3)).astype(np.float32)
    u, sig, v = linalg.svd3(jnp.asarray(f))
    u, sig, v = np.asarray(u), np.asarray(sig), np.asarray(v)
    recon = u @ (sig[..., None] * np.swapaxes(v, -1, -2))
    np.testing.assert_allclose(recon, f, atol=3e-4)
    np.testing.assert_allclose(np.linalg.det(u), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.linalg.det(v), 1.0, atol=1e-3)
    # magnitude-descending, negative last sigma iff det < 0
    assert np.all(sig[:, 0] >= np.abs(sig[:, 1]) - 1e-4)
    assert np.all(np.abs(sig[:, 1]) >= np.abs(sig[:, 2]) - 1e-4)
    detf = np.linalg.det(f)
    assert np.all((sig[:, 2] < 0) == (detf < 0))


def test_svd3_near_singular():
    # rank-deficient in-plane matrix like the cloth F3 embedding
    f = np.zeros((4, 3, 3), dtype=np.float32)
    f[:, 0, 0] = [1.0, 2.0, 0.5, 1.0]
    f[:, 1, 1] = [1.0, 0.3, 0.5, 1.0]
    f[:, 0, 1] = [0.0, 0.1, -0.2, 0.7]
    u, sig, v = linalg.svd3(jnp.asarray(f))
    recon = np.asarray(u) @ (np.asarray(sig)[..., None] * np.swapaxes(np.asarray(v), -1, -2))
    np.testing.assert_allclose(recon, f, atol=1e-5)


def test_inverse_lower_triangle():
    rng = np.random.default_rng(3)
    m = np.tril(rng.normal(size=(32, 3, 3))).astype(np.float32)
    m += np.eye(3, dtype=np.float32) * 2.0  # keep well-conditioned
    inv = np.asarray(linalg.inverse_lower_triangle(jnp.asarray(m)))
    # Reference formula ignores strictly-lower structure interplay only in
    # exact lower-triangular inputs; verify M @ inv(M) = I.
    np.testing.assert_allclose(m @ inv, np.eye(3)[None].repeat(32, 0), atol=1e-4)
