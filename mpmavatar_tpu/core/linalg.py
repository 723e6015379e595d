"""Batched small-matrix linear algebra for the MPM constitutive models.

TPU-first design: every routine here is a closed-form (or fixed-iteration)
batched computation over the leading particle axis, so XLA maps it onto the
VPU with no data-dependent control flow.  The reference implementation used
per-thread Warp intrinsics ``wp.qr3`` / ``wp.svd3``
(/root/reference/warp_mpm/mpm_utils.py:111,137,217); here they become
vectorized functions over ``(N, 3, 3)`` arrays.

Conventions
-----------
* ``qr3_pos``: thin QR of the direction matrix ``d`` whose *columns* are
  (d1, d2, d3).  Q is a proper rotation (det = +1), R is upper triangular
  with R11 > 0, R22 > 0 and R33 = det(d) / (R11 * R22) carrying the
  element-inversion sign.  This reproduces the sign-fixed output of the
  reference's ``wp.qr3`` post-processing
  (/root/reference/warp_mpm/mpm_utils.py:109-123,181-195).
* ``svd3``: rotation-convention SVD — U, V are proper rotations and the
  smallest-magnitude singular value is negative when det(F) < 0 (the
  McAdams convention used by ``wp.svd3``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def safe_sqrt(x):
    """sqrt with a zero (sub)gradient at x == 0 instead of NaN.

    The sqrt-at-zero NaN would otherwise leak through ``jnp.where``
    branches under reverse-mode AD (0 * NaN = NaN)."""
    safe = x > 0
    return jnp.where(safe, jnp.sqrt(jnp.where(safe, x, 1.0)), 0.0)


def safe_norm(x, axis=-1, keepdims=False):
    """L2 norm with a zero gradient at ||x|| == 0 (see safe_sqrt)."""
    return safe_sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims))


def safe_normalize(x, axis=-1, eps=_EPS):
    """x / max(||x||, eps) with NaN-free gradients at x == 0."""
    return x / jnp.maximum(safe_norm(x, axis=axis, keepdims=True), eps)


def qr3_pos(d: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched thin QR of (..., 3, 3) matrices with columns (d1, d2, d3).

    Returns (Q, R) with Q a proper rotation, R upper triangular, R11, R22 > 0.
    """
    d1 = d[..., :, 0]
    d2 = d[..., :, 1]
    d3 = d[..., :, 2]

    r11 = safe_norm(d1, axis=-1)
    q1 = d1 / jnp.maximum(r11, _EPS)[..., None]
    r12 = jnp.sum(q1 * d2, axis=-1)
    u2 = d2 - r12[..., None] * q1
    r22 = safe_norm(u2, axis=-1)
    q2 = u2 / jnp.maximum(r22, _EPS)[..., None]
    q3 = jnp.cross(q1, q2)

    r13 = jnp.sum(q1 * d3, axis=-1)
    r23 = jnp.sum(q2 * d3, axis=-1)
    r33 = jnp.sum(q3 * d3, axis=-1)

    q = jnp.stack([q1, q2, q3], axis=-1)
    zero = jnp.zeros_like(r11)
    r = jnp.stack(
        [
            jnp.stack([r11, r12, r13], axis=-1),
            jnp.stack([zero, r22, r23], axis=-1),
            jnp.stack([zero, zero, r33], axis=-1),
        ],
        axis=-2,
    )
    return q, r


def polar2x2_rotation(f11, f12, f21, f22):
    """Closed-form rotation factor of the polar decomposition of a 2x2
    matrix with positive determinant.

    Equivalent to U @ V.T of the reference's embedded 3x3 SVD of the
    in-plane deformation (/root/reference/warp_mpm/mpm_utils.py:133-141):
    for det(F) > 0 the polar rotation is R(theta) with
    theta = atan2(f21 - f12, f11 + f22).
    """
    x = f11 + f22
    y = f21 - f12
    scale = jax.lax.rsqrt(jnp.maximum(x * x + y * y, _EPS))
    c = x * scale
    s = y * scale
    return c, s  # rotation [[c, -s], [s, c]]


def _jacobi_eigh3(a: jnp.ndarray, sweeps: int = 8) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched cyclic-Jacobi eigendecomposition of symmetric (..., 3, 3).

    Fixed iteration count (static control flow for XLA).  Returns
    (eigenvalues, eigenvectors-as-columns), unsorted.
    """

    def rot_pq(a, v, p, q):
        app = a[..., p, p]
        aqq = a[..., q, q]
        apq = a[..., p, q]
        # Stable Jacobi rotation angle.
        small = jnp.abs(apq) < _EPS
        tau = (aqq - app) / (2.0 * jnp.where(small, 1.0, apq))
        sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(small, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        cb = c[..., None]
        sb = s[..., None]

        # Explicit Givens application (pure VPU elementwise; avoids
        # low-precision dot-general paths).  G has G[p,p]=G[q,q]=c,
        # G[p,q]=s, G[q,p]=-s;  A' = G^T A G,  V' = V G.
        ap = a[..., :, p]
        aq = a[..., :, q]
        b = a.at[..., :, p].set(cb * ap - sb * aq)
        b = b.at[..., :, q].set(sb * ap + cb * aq)
        brp = b[..., p, :]
        brq = b[..., q, :]
        a2 = b.at[..., p, :].set(cb * brp - sb * brq)
        a2 = a2.at[..., q, :].set(sb * brp + cb * brq)

        vp = v[..., :, p]
        vq = v[..., :, q]
        v2 = v.at[..., :, p].set(cb * vp - sb * vq)
        v2 = v2.at[..., :, q].set(sb * vp + cb * vq)
        return a2, v2

    v = jnp.eye(3, dtype=a.dtype) * jnp.ones_like(a)
    for _ in range(sweeps):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            a, v = rot_pq(a, v, p, q)
    return jnp.stack([a[..., 0, 0], a[..., 1, 1], a[..., 2, 2]], axis=-1), v


def svd3(f: jnp.ndarray, sweeps: int = 8) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched SVD of (..., 3, 3) in the rotation convention of ``wp.svd3``.

    Returns (U, sigma, V) with U, V proper rotations (det = +1) and
    ``sigma`` sorted descending by magnitude; ``sigma[..., 2] < 0`` iff
    det(f) < 0.
    """
    ata = jnp.sum(f[..., :, :, None] * f[..., :, None, :], axis=-3)
    eigval, v = _jacobi_eigh3(ata, sweeps=sweeps)

    # Sort eigenpairs descending.
    order = jnp.argsort(-eigval, axis=-1)
    eigval = jnp.take_along_axis(eigval, order, axis=-1)
    v = jnp.take_along_axis(v, order[..., None, :], axis=-1)

    # Make V a proper rotation.
    detv = jnp.linalg.det(v)
    v = v.at[..., :, 2].multiply(jnp.sign(detv)[..., None])

    sigma = jnp.sqrt(jnp.maximum(eigval, 0.0))

    # U columns: normalize F @ v_i; rebuild degenerate columns orthogonally.
    fv = jnp.sum(f[..., :, :, None] * v[..., None, :, :], axis=-2)
    u0 = fv[..., :, 0] / jnp.maximum(sigma[..., 0], _EPS)[..., None]
    u0 = u0 / jnp.maximum(safe_norm(u0, axis=-1, keepdims=True), _EPS)
    u1_raw = fv[..., :, 1] - jnp.sum(fv[..., :, 1] * u0, axis=-1)[..., None] * u0
    u1_norm = safe_norm(u1_raw, axis=-1, keepdims=True)
    # Degenerate fallback: any vector orthogonal to u0.
    alt = jnp.cross(u0, jnp.where(jnp.abs(u0[..., :1]) < 0.9,
                                  jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], f.dtype), u0.shape),
                                  jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], f.dtype), u0.shape)))
    alt = alt / jnp.maximum(safe_norm(alt, axis=-1, keepdims=True), _EPS)
    u1 = jnp.where(u1_norm > 1e-6, u1_raw / jnp.maximum(u1_norm, _EPS), alt)
    u2 = jnp.cross(u0, u1)
    u = jnp.stack([u0, u1, u2], axis=-1)

    # det(f) < 0 -> negate smallest singular value (U stays det +1).
    detf = jnp.linalg.det(f)
    sigma = sigma.at[..., 2].multiply(jnp.where(detf < 0.0, -1.0, 1.0))
    return u, sigma, v


def inverse_lower_triangle(m: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of (..., 3, 3) lower-triangular matrices.

    Mirrors /root/reference/warp_mpm/mpm_utils.py:87-99 exactly (including
    its assumption that the input is lower triangular).
    """
    m11 = m[..., 0, 0]
    m21 = m[..., 1, 0]
    m22 = m[..., 1, 1]
    m31 = m[..., 2, 0]
    m32 = m[..., 2, 1]
    m33 = m[..., 2, 2]
    invdet = 1.0 / (m11 * m22 * m33)
    zero = jnp.zeros_like(m11)
    out = jnp.stack(
        [
            jnp.stack([m22 * m33, zero, zero], axis=-1),
            jnp.stack([-m21 * m33, m11 * m33, zero], axis=-1),
            jnp.stack([m21 * m32 - m31 * m22, -m11 * m32, m11 * m22], axis=-1),
        ],
        axis=-2,
    )
    return invdet[..., None, None] * out
