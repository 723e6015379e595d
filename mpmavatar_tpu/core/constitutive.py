"""Vectorized constitutive models and plastic return mappings.

Faithful batched re-derivations of the reference's per-particle Warp
functions (/root/reference/warp_mpm/mpm_utils.py:8-399, 1017-1105): the
branchy per-thread code becomes masked `jnp.where` arithmetic over (N,...)
arrays — the natural TPU/VPU formulation and fully differentiable.

All matrices are (..., 3, 3); singular values (..., 3).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import linalg
from .linalg import safe_norm, safe_sqrt

_I3 = jnp.eye(3, dtype=jnp.float32)


def _mat(diag):
    """Diagonal (..., 3) -> (..., 3, 3)."""
    return diag[..., :, None] * _I3


def kirchoff_stress_fcr(f, u, v, j, mu, lam):
    """Fixed-corotated Kirchhoff stress (mpm_utils.py:8-15)."""
    r = u @ jnp.swapaxes(v, -1, -2)
    ft = jnp.swapaxes(f, -1, -2)
    return (2.0 * mu)[..., None, None] * ((f - r) @ ft) + \
        (_I3 * (lam * j * (j - 1.0))[..., None, None])


def kirchoff_stress_neo_hookean(f, u, v, j, sig, mu, lam):
    """Compressible neo-Hookean Kirchhoff stress (mpm_utils.py:18-47)."""
    b = sig * sig
    tr = jnp.sum(b, axis=-1, keepdims=True)
    b_hat = b - tr / 3.0
    tau = mu[..., None] * (j ** (-2.0 / 3.0))[..., None] * b_hat + \
        (lam / 2.0 * (j * j - 1.0))[..., None]
    return u @ _mat(tau) @ jnp.swapaxes(v, -1, -2) @ jnp.swapaxes(f, -1, -2)


def kirchoff_stress_stvk(f, u, v, sig, mu, lam):
    """St. Venant-Kirchhoff (Hencky) stress (mpm_utils.py:50-66)."""
    sig = jnp.maximum(sig, 0.01)
    eps = jnp.log(sig)
    log_sum = jnp.sum(eps, axis=-1, keepdims=True)
    tau = 2.0 * mu[..., None] * eps + lam[..., None] * log_sum
    return u @ _mat(tau) @ jnp.swapaxes(v, -1, -2) @ jnp.swapaxes(f, -1, -2)


def kirchoff_stress_drucker_prager(f, u, v, sig, mu, lam):
    """Drucker-Prager (sand) stress (mpm_utils.py:69-84)."""
    log_sig = jnp.log(sig)
    log_sum = jnp.sum(log_sig, axis=-1, keepdims=True)
    center = 2.0 * mu[..., None] * log_sig / sig + lam[..., None] * log_sum / sig
    return u @ _mat(center) @ jnp.swapaxes(v, -1, -2) @ jnp.swapaxes(f, -1, -2)


def von_mises_return_mapping(f_trial, mu, lam, yield_stress, xi, hardening: int):
    """von Mises plastic return map (mpm_utils.py:213-255).

    Returns (F_elastic, new_yield_stress)."""
    u, sig_old, v = linalg.svd3(f_trial)
    sig = jnp.maximum(sig_old, 0.01)
    eps = jnp.log(sig)
    temp = jnp.mean(eps, axis=-1, keepdims=True)
    tau = 2.0 * mu[..., None] * eps + lam[..., None] * jnp.sum(eps, -1, keepdims=True)
    cond = tau - jnp.mean(tau, axis=-1, keepdims=True)
    yielding = safe_norm(cond, axis=-1) > yield_stress

    eps_hat = eps - temp
    eps_hat_norm = safe_norm(eps_hat, axis=-1) + 1e-6
    delta_gamma = eps_hat_norm - yield_stress / (2.0 * mu)
    eps_new = eps - (delta_gamma / eps_hat_norm)[..., None] * eps_hat
    f_elastic = u @ _mat(jnp.exp(eps_new)) @ jnp.swapaxes(v, -1, -2)

    f_out = jnp.where(yielding[..., None, None], f_elastic, f_trial)
    if hardening == 1:
        ys_out = jnp.where(yielding, yield_stress + 2.0 * mu * xi * delta_gamma,
                           yield_stress)
    else:
        ys_out = yield_stress
    return f_out, ys_out


def von_mises_return_mapping_with_damage(f_trial, mu, lam, yield_stress,
                                         softening, xi, hardening: int):
    """von Mises with damage softening (mpm_utils.py:259-311).

    Returns (F_elastic, new_yield_stress, new_mu, new_lam)."""
    u, sig_old, v = linalg.svd3(f_trial)
    sig = jnp.maximum(sig_old, 0.01)
    eps = jnp.log(sig)
    temp = jnp.mean(eps, axis=-1, keepdims=True)
    tau = 2.0 * mu[..., None] * eps + lam[..., None] * jnp.sum(eps, -1, keepdims=True)
    cond = tau - jnp.mean(tau, axis=-1, keepdims=True)
    yielding = (safe_norm(cond, axis=-1) > yield_stress) & (yield_stress > 0)

    eps_hat = eps - temp
    eps_hat_norm = safe_norm(eps_hat, axis=-1) + 1e-6
    delta_gamma = eps_hat_norm - yield_stress / (2.0 * mu)
    corr = (delta_gamma / eps_hat_norm)[..., None] * eps_hat
    eps_new = eps - corr
    ys_soft = yield_stress - softening * safe_norm(corr, axis=-1)
    damaged = ys_soft <= 0
    f_elastic = u @ _mat(jnp.exp(eps_new)) @ jnp.swapaxes(v, -1, -2)

    f_out = jnp.where(yielding[..., None, None], f_elastic, f_trial)
    ys_out = jnp.where(yielding, ys_soft, yield_stress)
    if hardening == 1:
        ys_out = jnp.where(yielding, ys_out + 2.0 * mu * xi * delta_gamma, ys_out)
    mu_out = jnp.where(yielding & damaged, 0.0, mu)
    lam_out = jnp.where(yielding & damaged, 0.0, lam)
    return f_out, ys_out, mu_out, lam_out


def viscoplasticity_return_mapping_stvk(f_trial, mu, yield_stress,
                                        plastic_viscosity, dt):
    """Viscoplastic (foam/toothpaste) return map (mpm_utils.py:316-359)."""
    u, sig_old, v = linalg.svd3(f_trial)
    sig = jnp.maximum(sig_old, 0.01)
    b_trial = sig * sig
    eps = jnp.log(sig)
    trace_eps = jnp.sum(eps, axis=-1, keepdims=True)
    eps_hat = eps - trace_eps / 3.0
    s_trial = 2.0 * mu[..., None] * eps_hat
    s_norm = safe_norm(s_trial, axis=-1)
    y = s_norm - jnp.sqrt(2.0 / 3.0) * yield_stress
    yielding = y > 0

    mu_hat = mu * jnp.mean(b_trial, axis=-1)
    s_new_norm = s_norm - y / (1.0 + plastic_viscosity / (2.0 * mu_hat * dt))
    s_new = (s_new_norm / jnp.maximum(s_norm, 1e-12))[..., None] * s_trial
    eps_new = s_new / (2.0 * mu[..., None]) + trace_eps / 3.0
    f_elastic = u @ _mat(jnp.exp(eps_new)) @ jnp.swapaxes(v, -1, -2)
    return jnp.where(yielding[..., None, None], f_elastic, f_trial)


def sand_return_mapping(f_trial, mu, lam, alpha):
    """Drucker-Prager sand return map (mpm_utils.py:362-399)."""
    u, sig, v = linalg.svd3(f_trial)
    eps = jnp.log(jnp.maximum(jnp.abs(sig), 1e-14))
    tr = jnp.sum(eps, axis=-1)
    eps_hat = eps - (tr / 3.0)[..., None]
    eps_hat_norm = safe_norm(eps_hat, axis=-1)
    delta_gamma = eps_hat_norm + \
        (3.0 * lam + 2.0 * mu) / (2.0 * mu) * tr * alpha

    vt = jnp.swapaxes(v, -1, -2)
    h = eps - eps_hat * (delta_gamma / jnp.maximum(eps_hat_norm, 1e-12))[..., None]
    f_proj = u @ _mat(jnp.exp(h)) @ vt      # cone projection
    f_cone_tip = u @ vt                     # expansion: project to tip

    out = jnp.where((delta_gamma > 0)[..., None, None],
                    jnp.where((tr > 0)[..., None, None], f_cone_tip, f_proj),
                    f_trial)
    return out


def anisotropy_return_mapping(d, gamma, kappa, friction_coeff):
    """Garment return map on the QR factor of the direction matrix
    (mpm_utils.py:180-209): no normal-compression resistance beyond contact
    (R33 > 1 -> 1) and a Coulomb friction cone on in-plane shear.

    Updates only the third column (d3) of d."""
    q, r = linalg.qr3_pos(d)
    col3, d3 = map_r_col3(q, r, gamma, kappa, friction_coeff)
    return d.at[..., :, 2].set(d3)


def map_r_col3(q, r, gamma, kappa, friction_coeff):
    """Return-map core on a precomputed QR: new R column 3 and the mapped
    d3 = Q @ col3.  Q and R columns 1-2 are unchanged by the map (it only
    edits d3, and Q is built from d1, d2), so one QR serves both the
    return map and the stress evaluation."""
    r13, r23, r33 = r[..., 0, 2], r[..., 1, 2], r[..., 2, 2]

    separated = r33 > 1.0
    fn = kappa * (1.0 - r33) ** 2
    ff = gamma * safe_sqrt(r13 * r13 + r23 * r23)
    slipping = ff > friction_coeff * fn
    # guard: 1/(eps)^2 in the division VJP overflows f32 for tiny eps, and
    # inf * 0-cotangent = NaN; divide by ff only where actually slipping
    # (there ff > friction_coeff*fn >= 0).
    ff_safe = jnp.where(slipping, ff, 1.0)
    scale = friction_coeff * fn / ff_safe

    new_r13 = jnp.where(separated, r13, jnp.where(slipping, r13 * scale, r13))
    new_r23 = jnp.where(separated, r23, jnp.where(slipping, r23 * scale, r23))
    new_r33 = jnp.where(separated, 1.0, r33)

    col3 = jnp.stack([new_r13, new_r23, new_r33], axis=-1)
    d3 = jnp.einsum("...ij,...j->...i", q, col3)
    return col3, d3


def anisotropic_stress(r_inv, d, vol, mu, lam, gamma, kappa):
    """Anisotropic garment Kirchhoff stress + internal vertex forces.

    Port of kirchoff_stress_Anisotropy (mpm_utils.py:101-177).  Instead of
    atomically scattering vertex forces, returns them per-element for a
    segment-sum scatter by the caller.

    Returns (stress (E,3,3) = vol*outer(P3, d3), f1, f2, f3 each (E,3)).
    """
    q, r = linalg.qr3_pos(d)
    return anisotropic_stress_qr(r_inv, q, r, d[..., :, 2], vol,
                                 mu, lam, gamma, kappa)


def anisotropic_stress_qr(r_inv, q, r, d3, vol, mu, lam, gamma, kappa):
    """anisotropic_stress on a precomputed QR of d (see map_r_col3)."""
    i11, i12, i22 = r_inv[..., 0], r_inv[..., 1], r_inv[..., 2]

    f11 = r[..., 0, 0] * i11
    f12 = r[..., 0, 0] * i12 + r[..., 0, 1] * i22
    f22 = r[..., 1, 1] * i22

    # In-plane 2x2 fixed corotated + volume term.
    c, s = linalg.polar2x2_rotation(f11, f12, jnp.zeros_like(f11), f22)
    j = f11 * f22
    two_mu = 2.0 * mu
    k11 = two_mu * (f11 - c) + lam * (j - 1.0) * f22
    k12 = two_mu * (f12 + s)  # - (-s) rotation elem; iFTJ[0,1] = 0
    k21 = two_mu * (0.0 - s) - lam * (j - 1.0) * f12
    k22 = two_mu * (f22 - c) + lam * (j - 1.0) * f11

    r13, r23, r33 = r[..., 0, 2], r[..., 1, 2], r[..., 2, 2]
    dr11, dr12, dr22 = k11, k12, k22
    dr13 = gamma * r13
    dr23 = gamma * r23
    dr33 = jnp.where(r33 > 1.0, 0.0, -kappa * (1.0 - r33) ** 2)

    zeros = jnp.zeros_like(dr11)
    dr = jnp.stack([
        jnp.stack([dr11, dr12, dr13], axis=-1),
        jnp.stack([zeros, dr22, dr23], axis=-1),
        jnp.stack([zeros, zeros, dr33], axis=-1),
    ], axis=-2)

    # RiDT = [[F11,0,0],[F12,F22,0],[R13,R23,R33]] (lower triangular)
    ridt = jnp.stack([
        jnp.stack([f11, zeros, zeros], axis=-1),
        jnp.stack([f12, f22, zeros], axis=-1),
        jnp.stack([r13, r23, r33], axis=-1),
    ], axis=-2)

    k3 = dr @ ridt
    k3_sym = jnp.stack([
        jnp.stack([k3[..., 0, 0], k3[..., 0, 1], k3[..., 0, 2]], axis=-1),
        jnp.stack([k3[..., 0, 1], k3[..., 1, 1], k3[..., 1, 2]], axis=-1),
        jnp.stack([k3[..., 0, 2], k3[..., 1, 2], k3[..., 2, 2]], axis=-1),
    ], axis=-2)

    p = q @ k3_sym @ linalg.inverse_lower_triangle(ridt)
    p1 = p[..., :, 0]
    p2 = p[..., :, 1]
    p3 = p[..., :, 2]

    volb = vol[..., None]
    f2 = -volb * (i11[..., None] * p1 + i12[..., None] * p2)
    f3 = -volb * i22[..., None] * p2
    f1 = -(f2 + f3)

    stress = volb[..., None] * (p3[..., :, None] * d3[..., None, :])
    return stress, f1, f2, f3


# NOTE on k12/k21 above: the reference computes
#   K2 = 2 mu (F2 - Rot) + lam (J-1) iFTJ
# with F2 = [[F11,F12],[0,F22]], Rot = [[c,-s],[s,c]],
# iFTJ = [[F22, 0], [-F12, F11]]  (mpm_utils.py:128-144).
# Components:
#   K2[0,0] = 2 mu (F11 - c)  + lam (J-1) F22
#   K2[0,1] = 2 mu (F12 + s)  + 0
#   K2[1,0] = 2 mu (0   - s)  - lam (J-1) F12
#   K2[1,1] = 2 mu (F22 - c)  + lam (J-1) F11
# dr uses K2[0,0], K2[0,1], K2[1,1] only (mpm_utils.py:146-148).
