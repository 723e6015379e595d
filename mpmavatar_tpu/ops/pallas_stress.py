"""Fused Pallas cloth-stress kernel (QR + return map + stress, one pass).

`compute_stress`'s element block is pure per-element arithmetic, but in
(E, 3, 3) layout every intermediate tiles its trailing (3, 3) up to
(8, 128) — measured 7.6 ms for ~66k elements whose raw math is ~2 MB of
traffic.  This kernel evaluates the whole chain — QR of the direction
matrix, the anisotropic return map on R's third column, and the QR-form
anisotropic Kirchhoff stress with per-corner internal forces — in PLANE
form: every 3x3 component is its own (1, n) lane-tiled plane, fully
expanded (the matrices involved are triangular/orthogonal so the
products are short closed forms).

Math mirrors core.linalg.qr3_pos / core.constitutive.map_r_col3 /
anisotropic_stress_qr exactly (port of kirchoff_stress_Anisotropy +
return_mapping, /root/reference/warp_mpm/mpm_utils.py:101-177,228-264);
parity + gradients in tests/test_pallas_stress.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12


def _stress_math(inp):
    """(19, n) input planes -> (21, n) output planes.

    in: d (9 planes, index i*3+j), R_inv (3), vol, sel, mu, lam, gamma,
    kappa, friction_coeff (broadcast to a plane for layout uniformity).
    out: new_d3 (3), stress (9), f1 (3), f2 (3), f3 (3).
    """
    # keep every plane 2-D (1, n): Mosaic vector ops want >= 2D shapes
    pl_ = lambda i: inp[i:i + 1]
    d = [pl_(i) for i in range(9)]          # d[i*3+j] = d_{ij}
    i11, i12, i22 = pl_(9), pl_(10), pl_(11)
    vol = pl_(12)
    sel = pl_(13)
    mu, lam = pl_(14), pl_(15)
    gamma, kappa = pl_(16), pl_(17)
    fric = pl_(18)

    def col(j):
        return (d[0 * 3 + j], d[1 * 3 + j], d[2 * 3 + j])

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def norm(a):
        return jnp.sqrt(dot(a, a) + 1e-24)

    d1, d2, d3c = col(0), col(1), col(2)
    r11 = norm(d1)
    inv_r11 = 1.0 / jnp.maximum(r11, _EPS)
    q1 = tuple(c * inv_r11 for c in d1)
    r12 = dot(q1, d2)
    u2 = tuple(d2[i] - r12 * q1[i] for i in range(3))
    r22 = norm(u2)
    inv_r22 = 1.0 / jnp.maximum(r22, _EPS)
    q2 = tuple(c * inv_r22 for c in u2)
    q3 = (q1[1] * q2[2] - q1[2] * q2[1],
          q1[2] * q2[0] - q1[0] * q2[2],
          q1[0] * q2[1] - q1[1] * q2[0])
    r13 = dot(q1, d3c)
    r23 = dot(q2, d3c)
    r33 = dot(q3, d3c)

    # ---- return map on column 3 (map_r_col3) --------------------------
    separated = r33 > 1.0
    fn = kappa * (1.0 - r33) ** 2
    ff = gamma * jnp.sqrt(r13 * r13 + r23 * r23 + 1e-24)
    slipping = ff > fric * fn
    ff_safe = jnp.where(slipping, ff, 1.0)
    scale = fric * fn / ff_safe
    m13 = jnp.where(separated, r13, jnp.where(slipping, r13 * scale, r13))
    m23 = jnp.where(separated, r23, jnp.where(slipping, r23 * scale, r23))
    m33 = jnp.where(separated, 1.0, r33)
    # selection==0 applies the map; others keep the original column
    use = sel > 0.5
    n13 = jnp.where(use, m13, r13)
    n23 = jnp.where(use, m23, r23)
    n33 = jnp.where(use, m33, r33)
    new_d3 = tuple(q1[i] * n13 + q2[i] * n23 + q3[i] * n33
                   for i in range(3))
    new_d3 = tuple(jnp.where(use, new_d3[i], d3c[i]) for i in range(3))

    # ---- anisotropic stress on the mapped R (anisotropic_stress_qr) ---
    f11 = r11 * i11
    f12 = r11 * i12 + r12 * i22
    f22 = r22 * i22
    x = f11 + f22
    y = -f12                     # f21 = 0
    psc = jax.lax.rsqrt(jnp.maximum(x * x + y * y, _EPS))
    c = x * psc
    s = y * psc
    j = f11 * f22
    two_mu = 2.0 * mu
    k11 = two_mu * (f11 - c) + lam * (j - 1.0) * f22
    k12 = two_mu * (f12 + s)
    k22 = two_mu * (f22 - c) + lam * (j - 1.0) * f11

    dr13 = gamma * n13
    dr23 = gamma * n23
    dr33 = jnp.where(n33 > 1.0, 0.0, -kappa * (1.0 - n33) ** 2)

    # k3 = DR @ RiDT with DR upper- and RiDT lower-triangular
    k300 = k11 * f11 + k12 * f12 + dr13 * n13
    k301 = k12 * f22 + dr13 * n23
    k302 = dr13 * n33
    k311 = k22 * f22 + dr23 * n23
    k312 = dr23 * n33
    k322 = dr33 * n33
    # symmetric completion
    ks = ((k300, k301, k302), (k301, k311, k312), (k302, k312, k322))

    # inverse of RiDT = [[f11,0,0],[f12,f22,0],[n13,n23,n33]]
    det = f11 * f22 * n33
    invdet = 1.0 / jnp.where(jnp.abs(det) > _EPS, det, _EPS)
    l00 = f22 * n33 * invdet
    l10 = -f12 * n33 * invdet
    l11 = f11 * n33 * invdet
    l20 = (f12 * n23 - n13 * f22) * invdet
    l21 = -f11 * n23 * invdet
    l22 = f11 * f22 * invdet
    il = ((l00, 0.0, 0.0), (l10, l11, 0.0), (l20, l21, l22))

    # M = ks @ il (il lower triangular; zero entries skipped by hand)
    m = [[None] * 3 for _ in range(3)]
    for i in range(3):
        m[i][0] = ks[i][0] * il[0][0] + ks[i][1] * il[1][0] \
            + ks[i][2] * il[2][0]
        m[i][1] = ks[i][1] * il[1][1] + ks[i][2] * il[2][1]
        m[i][2] = ks[i][2] * il[2][2]

    # P = Q @ M, Q columns (q1, q2, q3)
    q = (q1, q2, q3)
    p = [[q[0][i] * m[0][jc] + q[1][i] * m[1][jc] + q[2][i] * m[2][jc]
          for jc in range(3)] for i in range(3)]
    p1 = tuple(p[i][0] for i in range(3))
    p2 = tuple(p[i][1] for i in range(3))
    p3 = tuple(p[i][2] for i in range(3))

    f2_ = tuple(-vol * (i11 * p1[i] + i12 * p2[i]) for i in range(3))
    f3_ = tuple(-vol * i22 * p2[i] for i in range(3))
    f1_ = tuple(-(f2_[i] + f3_[i]) for i in range(3))

    stress = [vol * p3[i] * new_d3[jc] for i in range(3)
              for jc in range(3)]

    msk = sel  # zero the outputs of unselected elements (compute_stress)
    outs = list(new_d3) + [t * msk for t in stress] \
        + [t * msk for t in f1_] + [t * msk for t in f2_] \
        + [t * msk for t in f3_]
    return jnp.concatenate(outs, axis=0)


def _stress_pallas(inp, block, interpret):
    n = inp.shape[-1]

    def kernel(in_ref, out_ref):
        out_ref[...] = _stress_math(in_ref[...])

    return pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[pl.BlockSpec((19, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((21, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((21, n), jnp.float32),
        interpret=interpret,
    )(inp)


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _stress_fused(inp, block, interpret):
    return _stress_pallas(inp, block, interpret)


def _stress_fwd(inp, block, interpret):
    return _stress_pallas(inp, block, interpret), inp


def _stress_bwd(block, interpret, res, g):
    _, vjp = jax.vjp(_stress_math, res)
    return (vjp(g)[0],)


_stress_fused.defvjp(_stress_fwd, _stress_bwd)


def cloth_stress_fused(d, r_inv, vol, sel, mu, lam, gamma, kappa,
                       friction_coeff, block: int = 8192,
                       interpret=None):
    """Fused QR + return map + anisotropic stress for the element block.

    Returns (new_d (E,3,3) with mapped column 3, stress (E,3,3),
    f1, f2, f3 (E,3)) — drop-in for the element half of
    core.stepping.compute_stress."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    e = d.shape[0]
    pad = (-e) % 128
    ep = e + pad

    def pplane(x, fill=0.0):
        x = jnp.asarray(x, jnp.float32).reshape(-1)
        x = jnp.broadcast_to(x, (e,)) if x.shape[0] == 1 else x
        return jnp.pad(x, (0, pad), constant_values=fill)

    planes = [pplane(d[:, i, jc]) for i in range(3) for jc in range(3)]
    planes += [pplane(r_inv[:, k]) for k in range(3)]
    planes += [pplane(vol), pplane(sel), pplane(mu), pplane(lam),
               pplane(gamma), pplane(kappa),
               pplane(jnp.broadcast_to(jnp.reshape(friction_coeff, ()),
                                       (e,)))]
    inp = jnp.stack(planes, axis=0)                       # (19, Ep)
    blk = block
    while ep % blk:
        blk //= 2
    out = _stress_fused(inp, blk, interpret)              # (21, Ep)
    out = out[:, :e]

    new_d3 = out[0:3].T                                   # (E, 3)
    new_d = d.at[..., :, 2].set(new_d3)
    stress = out[3:12].T.reshape(e, 3, 3)
    f1 = out[12:15].T
    f2 = out[15:18].T
    f3 = out[18:21].T
    return new_d, stress, f1, f2, f3
