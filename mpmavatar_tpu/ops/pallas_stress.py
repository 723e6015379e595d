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


def _svd3_planes(f):
    """Plane-form port of core.linalg.svd3: f is a 3x3 of (1, n) planes;
    returns (u, sigma, v) with u, v 3x3 plane lists and sigma a 3-list.

    Same Jacobi sweep structure (8 cyclic sweeps, full-matrix Givens),
    stable descending sort, proper-rotation V, Gram-Schmidt U with the
    degenerate fallback, det(f)<0 -> negative smallest singular value."""
    # ata = f^T f (kept as a full 3x3 of planes: the reference Jacobi
    # applies Givens to the full matrix, so we mirror that exactly)
    a = [[sum(f[k][i] * f[k][j] for k in range(3)) for j in range(3)]
         for i in range(3)]
    v = [[jnp.full_like(f[0][0], 1.0 if i == j else 0.0)
          for j in range(3)] for i in range(3)]

    for _ in range(8):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            app, aqq, apq = a[p][p], a[q][q], a[p][q]
            small = jnp.abs(apq) < _EPS
            tau = (aqq - app) / (2.0 * jnp.where(small, 1.0, apq))
            sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
            t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(small, 0.0, t)
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            s = t * c
            # columns p, q of A
            bp = [c * a[i][p] - s * a[i][q] for i in range(3)]
            bq = [s * a[i][p] + c * a[i][q] for i in range(3)]
            b = [[bp[i] if j == p else (bq[i] if j == q else a[i][j])
                  for j in range(3)] for i in range(3)]
            # rows p, q
            rp = [c * b[p][j] - s * b[q][j] for j in range(3)]
            rq = [s * b[p][j] + c * b[q][j] for j in range(3)]
            a = [[rp[j] if i == p else (rq[j] if i == q else b[i][j])
                  for j in range(3)] for i in range(3)]
            # V columns p, q
            vp = [c * v[i][p] - s * v[i][q] for i in range(3)]
            vq = [s * v[i][p] + c * v[i][q] for i in range(3)]
            v = [[vp[i] if j == p else (vq[i] if j == q else v[i][j])
                  for j in range(3)] for i in range(3)]

    ev = [a[0][0], a[1][1], a[2][2]]

    # stable descending sort via compare-swap network on (eig, V-col)
    def cswap(ev, v, i, j):
        sw = ev[i] < ev[j]
        ei = jnp.where(sw, ev[j], ev[i])
        ej = jnp.where(sw, ev[i], ev[j])
        ev = [ei if k == i else (ej if k == j else ev[k])
              for k in range(3)]
        vi = [jnp.where(sw, v[r][j], v[r][i]) for r in range(3)]
        vj = [jnp.where(sw, v[r][i], v[r][j]) for r in range(3)]
        v = [[vi[r] if k == i else (vj[r] if k == j else v[r][k])
              for k in range(3)] for r in range(3)]
        return ev, v

    for (i, j) in ((0, 1), (1, 2), (0, 1)):
        ev, v = cswap(ev, v, i, j)

    detv = (v[0][0] * (v[1][1] * v[2][2] - v[1][2] * v[2][1])
            - v[0][1] * (v[1][0] * v[2][2] - v[1][2] * v[2][0])
            + v[0][2] * (v[1][0] * v[2][1] - v[1][1] * v[2][0]))
    sv = jnp.sign(detv)
    v = [[v[i][j] * sv if j == 2 else v[i][j] for j in range(3)]
         for i in range(3)]

    sigma = [jnp.sqrt(jnp.maximum(e, 0.0)) for e in ev]

    fv = [[sum(f[i][k] * v[k][j] for k in range(3)) for j in range(3)]
          for i in range(3)]
    inv_s0 = 1.0 / jnp.maximum(sigma[0], _EPS)
    u0 = [fv[i][0] * inv_s0 for i in range(3)]
    n0 = jnp.sqrt(u0[0] ** 2 + u0[1] ** 2 + u0[2] ** 2 + 1e-24)
    u0 = [c / jnp.maximum(n0, _EPS) for c in u0]
    d1 = sum(fv[i][1] * u0[i] for i in range(3))
    u1r = [fv[i][1] - d1 * u0[i] for i in range(3)]
    n1 = jnp.sqrt(u1r[0] ** 2 + u1r[1] ** 2 + u1r[2] ** 2 + 1e-24)
    # degenerate fallback: cross(u0, e_x or e_y)
    use_x = jnp.abs(u0[0]) < 0.9
    ax = [jnp.where(use_x, 1.0, 0.0), jnp.where(use_x, 0.0, 1.0),
          jnp.zeros_like(u0[0])]
    alt = [u0[1] * ax[2] - u0[2] * ax[1],
           u0[2] * ax[0] - u0[0] * ax[2],
           u0[0] * ax[1] - u0[1] * ax[0]]
    na = jnp.sqrt(alt[0] ** 2 + alt[1] ** 2 + alt[2] ** 2 + 1e-24)
    alt = [c / jnp.maximum(na, _EPS) for c in alt]
    ok1 = n1 > 1e-6
    inv_n1 = 1.0 / jnp.maximum(n1, _EPS)
    u1 = [jnp.where(ok1, u1r[i] * inv_n1, alt[i]) for i in range(3)]
    u2 = [u0[1] * u1[2] - u0[2] * u1[1],
          u0[2] * u1[0] - u0[0] * u1[2],
          u0[0] * u1[1] - u0[1] * u1[0]]
    u = [[u0[i], u1[i], u2[i]] for i in range(3)]

    detf = (f[0][0] * (f[1][1] * f[2][2] - f[1][2] * f[2][1])
            - f[0][1] * (f[1][0] * f[2][2] - f[1][2] * f[2][0])
            + f[0][2] * (f[1][0] * f[2][1] - f[1][1] * f[2][0]))
    sigma[2] = sigma[2] * jnp.where(detf < 0.0, -1.0, 1.0)
    return u, sigma, v


def _sand_math(inp):
    """(22, n) planes -> (18, n): the full traditional-sand stress chain.

    in: f_trial (9, index i*3+j), f_prev (9), sel, mu, lam, alpha.
    out: f_new (9), stress (9).

    Mirrors core.constitutive.sand_return_mapping +
    kirchoff_stress_drucker_prager exactly (port of
    sand_return_mapping / kirchoff_stress_drucker_prager,
    /root/reference/warp_mpm/mpm_utils.py:362-399,69-84): in (T, 3, 3)
    layout the chain costs ~29 ms for 100k particles (every (T, 3)/
    (T, 3, 3) intermediate tiles its trailing dims to (8, 128) — a
    >40x HBM-padding tax); in plane form it is one VMEM pass."""
    pl_ = lambda i: inp[i:i + 1]
    ft = [[pl_(i * 3 + j) for j in range(3)] for i in range(3)]
    fp = [[pl_(9 + i * 3 + j) for j in range(3)] for i in range(3)]
    sel = pl_(18)
    mu, lam, alpha = pl_(19), pl_(20), pl_(21)

    u, sig, v = _svd3_planes(ft)

    eps = [jnp.log(jnp.maximum(jnp.abs(s), 1e-14)) for s in sig]
    tr = eps[0] + eps[1] + eps[2]
    eh = [e - tr / 3.0 for e in eps]
    ehn = jnp.sqrt(eh[0] ** 2 + eh[1] ** 2 + eh[2] ** 2 + 1e-24)
    delta_gamma = ehn + (3.0 * lam + 2.0 * mu) / (2.0 * mu) * tr * alpha
    scale = delta_gamma / jnp.maximum(ehn, 1e-12)
    h = [eps[i] - eh[i] * scale for i in range(3)]
    exph = [jnp.exp(hi) for hi in h]

    # f_proj = u diag(exph) v^T ; f_cone_tip = u v^T
    def recompose(diag):
        return [[sum(u[i][k] * diag[k] * v[j][k] for k in range(3))
                 for j in range(3)] for i in range(3)]

    f_proj = recompose(exph)
    ones = jnp.ones_like(sig[0])
    f_tip = recompose([ones, ones, ones])
    yielding = delta_gamma > 0
    expand = tr > 0
    f_map = [[jnp.where(yielding,
                        jnp.where(expand, f_tip[i][j], f_proj[i][j]),
                        ft[i][j]) for j in range(3)] for i in range(3)]
    use = sel > 0.5
    f_new = [[jnp.where(use, f_map[i][j], fp[i][j]) for j in range(3)]
             for i in range(3)]

    # Drucker-Prager stress, spectrally: with svd(F_new) = (U, s, V),
    # tau = U diag(center) V^T F_new^T = U diag(center * s) U^T where
    # center_k = (2 mu log s_k + lam sum(log s)) / s_k — i.e.
    # tau = U diag(2 mu log s_k + lam sum(log s)) U^T, a spectral
    # function of F_new F_new^T.  The return map KNOWS log s exactly
    # (h for the cone projection, 0 for the tip, log|s_trial| for the
    # elastic branch), so no second SVD of the recomposed F_new is
    # needed — and the tip case comes out exactly zero instead of the
    # reference's noise-amplified log(1 +- svd eps) (values agree with
    # the (T,3,3) path to ~mu*1e-6; see kirchoff_stress_drucker_prager,
    # /root/reference/warp_mpm/mpm_utils.py:69-84).
    zero = jnp.zeros_like(sig[0])
    # elastic branch: log of the TRIAL singular values without the
    # |.| clamp, matching the reference's log(sig) (NaN for det<0,
    # exactly as the (T,3,3) path)
    log_el = [jnp.log(s) for s in sig]
    logs = [jnp.where(yielding, jnp.where(expand, zero, h[k]),
                      log_el[k]) for k in range(3)]
    log_sum = logs[0] + logs[1] + logs[2]
    diag = [2.0 * mu * logs[k] + lam * log_sum for k in range(3)]
    st = [[sum(u[i][k] * diag[k] * u[j][k] for k in range(3))
           for j in range(3)] for i in range(3)]
    # unselected particles keep F_prev and contribute zero stress (the
    # (T,3,3) path also zeroes them), so U-of-trial is valid wherever
    # the stress survives the mask
    stress = [[jnp.where(use, st[i][j], 0.0)
               for j in range(3)] for i in range(3)]

    outs = [f_new[i][j] for i in range(3) for j in range(3)] \
        + [stress[i][j] for i in range(3) for j in range(3)]
    return jnp.concatenate(outs, axis=0)


def _sand_pallas(inp, block, interpret):
    n = inp.shape[-1]

    def kernel(in_ref, out_ref):
        out_ref[...] = _sand_math(in_ref[...])

    return pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[pl.BlockSpec((22, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((18, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((18, n), jnp.float32),
        interpret=interpret,
    )(inp)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _sand_fused(inp, block, interpret):
    return _sand_pallas(inp, block, interpret)


def _sand_fwd(inp, block, interpret):
    return _sand_pallas(inp, block, interpret), inp


def _sand_bwd(block, interpret, res, g):
    _, vjp = jax.vjp(_sand_math, res)
    return (vjp(g)[0],)


_sand_fused.defvjp(_sand_fwd, _sand_bwd)


def sand_stress_fused(f_trial, f_prev, sel, mu, lam, alpha,
                      block: int = 4096, interpret=None):
    """Fused sand (Drucker-Prager) return map + stress for the
    traditional block: returns (f_new (T,3,3), stress (T,3,3)) — the
    material==2 half of core.stepping.compute_stress in one HBM pass."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    t = f_trial.shape[0]
    pad = (-t) % 128
    tp = t + pad

    def pplane(x, fill=0.0):
        x = jnp.asarray(x, jnp.float32).reshape(-1)
        x = jnp.broadcast_to(x, (t,)) if x.shape[0] == 1 else x
        return jnp.pad(x, (0, pad), constant_values=fill)

    planes = [pplane(f_trial[:, i, j]) for i in range(3)
              for j in range(3)]
    planes += [pplane(f_prev[:, i, j], fill=(1.0 if i == j else 0.0))
               for i in range(3) for j in range(3)]
    planes += [pplane(sel), pplane(mu), pplane(lam),
               pplane(jnp.broadcast_to(jnp.reshape(alpha, ()), (t,)))]
    # identity-pad f_trial's diagonal too: log/1/sigma on zero-padded
    # rows would inf/NaN through the padded lanes (harmless values but
    # XLA may flush NaNs slowly; identity keeps the padded math tame)
    for i in range(3):
        idx = i * 3 + i
        planes[idx] = planes[idx].at[t:].set(1.0) if pad else planes[idx]
    inp = jnp.stack(planes, axis=0)                       # (22, Tp)
    blk = block
    while tp % blk:
        blk //= 2
    out = _sand_fused(inp, blk, interpret)                # (18, Tp)
    out = out[:, :t]
    f_new = out[0:9].T.reshape(t, 3, 3)
    stress = out[9:18].T.reshape(t, 3, 3)
    return f_new, stress


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
