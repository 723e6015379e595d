"""Scalar numpy transliteration of the reference Warp MPM substep.

Independent implementation path (float64, per-particle loops, numpy QR/SVD
with the reference's sign fixes) used as the golden oracle for the
vectorized JAX solver.  Mirrors /root/reference/warp_mpm/mpm_utils.py and
mpm_solver.py math exactly; cloth (anisotropic) + mesh collider +
particle mover + sticky floor + gravity.
"""

import numpy as np


def qr3_fixed(d):
    """np QR + the reference's sign fixes (mpm_utils.py:109-123) + a
    det(Q)=+1 correction (warp's qr3 yields a rotation)."""
    q, r = np.linalg.qr(d)
    if r[0, 0] < 0:
        q = q * np.array([-1, 1, -1])[None, :]
        r[0, :] *= -1
        r[2, 2] *= -1
        # restore consistency: flipping q columns 0,2 requires flipping
        # rows 0,2 of r; row 2 has only r22... the reference's exact fix:
    if r[1, 1] < 0:
        q = q * np.array([1, -1, -1])[None, :]
        r[1, 1] *= -1
        r[1, 2] *= -1
        r[2, 2] *= -1
    if np.linalg.det(q) < 0:
        q[:, 2] *= -1
        r[2, 2] *= -1
    return q, r


def anisotropy_return_mapping(d, gamma, kappa, friction_coeff):
    q, r = qr3_fixed(d)
    r = r.copy()
    if r[2, 2] > 1.0:
        r[2, 2] = 1.0
    else:
        fn = kappa * (1.0 - r[2, 2]) ** 2
        ff = gamma * np.sqrt(r[0, 2] ** 2 + r[1, 2] ** 2)
        if ff > friction_coeff * fn:
            s = friction_coeff * fn / ff
            r[0, 2] *= s
            r[1, 2] *= s
    d3 = q @ np.array([r[0, 2], r[1, 2], r[2, 2]])
    out = d.copy()
    out[:, 2] = d3
    return out


def inverse_lower_triangle(m):
    m11, m21, m22, m31, m32, m33 = m[0, 0], m[1, 0], m[1, 1], m[2, 0], m[2, 1], m[2, 2]
    invdet = 1.0 / (m11 * m22 * m33)
    return invdet * np.array([
        [m22 * m33, 0.0, 0.0],
        [-m21 * m33, m11 * m33, 0.0],
        [m21 * m32 - m31 * m22, -m11 * m32, m11 * m22],
    ])


def anisotropic_stress(r_inv, d, vol, mu, lam, gamma, kappa):
    """mpm_utils.py:101-177. Returns (stress, f1, f2, f3)."""
    i11, i12, i22 = r_inv
    q, r = qr3_fixed(d)

    f11 = r[0, 0] * i11
    f12 = r[0, 0] * i12 + r[0, 1] * i22
    f22 = r[1, 1] * i22
    f2m = np.array([[f11, f12], [0.0, f22]])

    u, s, vt = np.linalg.svd(np.array([[f11, f12, 0], [0, f22, 0], [0, 0, 0]]))
    u2 = u[:2, :2]
    v2 = vt.T[:2, :2]
    rot = u2 @ v2.T
    j = f11 * f22
    iftj = np.array([[f22, 0.0], [-f12, f11]])
    k2 = 2.0 * mu * (f2m - rot) + lam * (j - 1.0) * iftj

    dr = np.zeros((3, 3))
    dr[0, 0], dr[0, 1], dr[1, 1] = k2[0, 0], k2[0, 1], k2[1, 1]
    dr[0, 2] = gamma * r[0, 2]
    dr[1, 2] = gamma * r[1, 2]
    dr[2, 2] = 0.0 if r[2, 2] > 1.0 else -kappa * (1.0 - r[2, 2]) ** 2

    ridt = np.array([
        [f11, 0.0, 0.0],
        [f12, f22, 0.0],
        [r[0, 2], r[1, 2], r[2, 2]],
    ])
    k3 = dr @ ridt
    k3_sym = np.array([
        [k3[0, 0], k3[0, 1], k3[0, 2]],
        [k3[0, 1], k3[1, 1], k3[1, 2]],
        [k3[0, 2], k3[1, 2], k3[2, 2]],
    ])
    p = q @ k3_sym @ inverse_lower_triangle(ridt)
    p1, p2, p3 = p[:, 0], p[:, 1], p[:, 2]
    d3 = d[:, 2]
    f2v = -vol * (i11 * p1 + i12 * p2)
    f3v = -vol * i22 * p2
    f1v = -(f2v + f3v)
    stress = vol * np.outer(p3, d3)
    return stress, f1v, f2v, f3v


def spline_weights(x, inv_dx):
    grid_pos = x * inv_dx
    base = np.floor(grid_pos - 0.5).astype(int)
    fx = grid_pos - base
    wa, wb, wc = 1.5 - fx, fx - 1.0, fx - 0.5
    w = np.stack([0.5 * wa * wa, 0.75 - wb * wb, 0.5 * wc * wc])   # (3off, 3ax)
    dw = np.stack([fx - 1.5, -2.0 * (fx - 1.0), fx - 0.5])
    return base, fx, w, dw


class RefCloth:
    """Reference-semantics cloth substep: elements + vertices only."""

    def __init__(self, verts, faces, n_grid, grid_lim, density, E, nu,
                 gamma, kappa, friction_angle=40.0, thickness=1e-5,
                 gravity=(0.0, -9.8, 0.0), mesh_friction=0.5):
        self.n_grid = n_grid
        self.grid_lim = grid_lim
        self.dx = grid_lim / n_grid
        self.inv_dx = n_grid / grid_lim
        self.faces = faces.astype(int)
        V = verts.shape[0]
        E_n = faces.shape[0]
        self.V, self.E = V, E_n
        self.gravity = np.array(gravity)
        self.mesh_friction = mesh_friction

        d1 = verts[faces[:, 1]] - verts[faces[:, 0]]
        d2 = verts[faces[:, 2]] - verts[faces[:, 0]]
        d3 = np.cross(d1, d2)
        d3 /= np.linalg.norm(d3, axis=1, keepdims=True)
        self.d = np.stack([d1, d2, d3], axis=-1)

        r11 = np.linalg.norm(d1, axis=1)
        r12 = np.sum(d1 * d2, axis=1) / r11
        r22 = np.linalg.norm(d2 - (r12 / r11)[:, None] * d1, axis=1)
        i11, i22 = 1.0 / r11, 1.0 / r22
        self.R_inv = np.stack([i11, -r12 * i11 * i22, i22], -1)

        area = 0.5 * np.linalg.norm(np.cross(d1, d2), axis=1)
        evol = 0.25 * thickness * area
        vvol = np.zeros(V)
        np.add.at(vvol, faces.reshape(-1), np.repeat(evol, 3))
        self.vol = np.concatenate([evol, vvol])

        self.x = np.concatenate([verts[faces].mean(1), verts], 0)
        self.v = np.zeros_like(self.x)
        self.C = np.zeros((E_n + V, 3, 3))
        self.mass = density * self.vol

        self.mu = E / (2 * (1 + nu))
        self.lam = E * nu / ((1 + nu) * (1 - 2 * nu))
        self.gamma, self.kappa = gamma, kappa
        self.friction_coeff = np.tan(friction_angle / 180.0 * np.pi)

    def substep(self, dt, mesh_x=None, mesh_v=None, mesh_faces=None,
                joint_verts_v=None, num_joint_v=0,
                joint_faces_v=None, num_joint_f=0, floor_y=None):
        E_n, V, G = self.E, self.V, self.n_grid
        grid_m = np.zeros((G, G, G))
        grid_v_in = np.zeros((G, G, G, 3))

        # stress
        vertex_force = np.zeros((V, 3))
        stress = np.zeros((E_n, 3, 3))
        for e in range(E_n):
            self.d[e] = anisotropy_return_mapping(
                self.d[e], self.gamma, self.kappa, self.friction_coeff)
            st, f1, f2, f3 = anisotropic_stress(
                self.R_inv[e], self.d[e], self.vol[e], self.mu, self.lam,
                self.gamma, self.kappa)
            stress[e] = st
            vertex_force[self.faces[e, 0]] += f1
            vertex_force[self.faces[e, 1]] += f2
            vertex_force[self.faces[e, 2]] += f3

        # p2g
        P = E_n + V
        for p in range(P):
            base, fx, w, dw = spline_weights(self.x[p], self.inv_dx)
            for i in range(3):
                for j in range(3):
                    for k in range(3):
                        dpos = (np.array([i, j, k]) - fx) * self.dx
                        weight = w[i, 0] * w[j, 1] * w[k, 2]
                        dweight = self.inv_dx * np.array([
                            dw[i, 0] * w[j, 1] * w[k, 2],
                            w[i, 0] * dw[j, 1] * w[k, 2],
                            w[i, 0] * w[j, 1] * dw[k, 2]])
                        if p >= E_n:   # vertex
                            force = weight * vertex_force[p - E_n]
                        else:
                            force = -stress[p] @ dweight
                        v_add = weight * self.mass[p] * (self.v[p] + self.C[p] @ dpos) \
                            + dt * force
                        ii, jj, kk = base + np.array([i, j, k])
                        grid_v_in[ii, jj, kk] += v_add
                        grid_m[ii, jj, kk] += weight * self.mass[p]

        # grid update
        grid_v_out = np.zeros_like(grid_v_in)
        act = grid_m > 1e-15
        grid_v_out[act] = grid_v_in[act] / grid_m[act][:, None] \
            + dt * self.gravity[None, :]

        # mesh collider
        if mesh_x is not None:
            mw = np.zeros((G, G, G))
            mv = np.zeros((G, G, G, 3))
            mn = np.zeros((G, G, G, 3))
            for f in mesh_faces:
                pts = mesh_x[f]
                cen = pts.mean(0)
                vel = mesh_v[f].mean(0)
                nrm = np.cross(pts[1] - pts[0], pts[2] - pts[0])
                nrm /= max(np.linalg.norm(nrm), 1e-12)
                base, fx, w, _ = spline_weights(cen, self.inv_dx)
                if np.all(base >= 0) and np.all(base < G - 3):
                    for i in range(3):
                        for j in range(3):
                            for k in range(3):
                                weight = w[i, 0] * w[j, 1] * w[k, 2]
                                ii, jj, kk = base + np.array([i, j, k])
                                mv[ii, jj, kk] += weight * vel
                                mn[ii, jj, kk] += weight * nrm
                                mw[ii, jj, kk] += weight
            cov = mw > 1e-15
            idx = np.argwhere(cov)
            for ii, jj, kk in idx:
                vmesh = mv[ii, jj, kk] / mw[ii, jj, kk]
                n = mn[ii, jj, kk] / max(np.linalg.norm(mn[ii, jj, kk]), 1e-12)
                v_rel = grid_v_out[ii, jj, kk] - vmesh
                nc = v_rel @ n
                v_proj = v_rel - min(nc, 0.0) * n
                ln = np.linalg.norm(v_proj)
                if nc < 0.0 and ln > 1e-20:
                    v_fric = max(0.0, ln + nc * self.mesh_friction) * v_proj / ln
                else:
                    v_fric = v_proj
                grid_v_out[ii, jj, kk] = v_fric + vmesh

        # particle mover
        if joint_verts_v is not None or joint_faces_v is not None:
            pw = np.zeros((G, G, G))
            pv = np.zeros((G, G, G, 3))

            def add_pts(xs, vs):
                for p in range(xs.shape[0]):
                    base, fx, w, _ = spline_weights(xs[p], self.inv_dx)
                    if np.all(base >= 0) and np.all(base < G - 3):
                        for i in range(3):
                            for j in range(3):
                                for k in range(3):
                                    weight = w[i, 0] * w[j, 1] * w[k, 2]
                                    ii, jj, kk = base + np.array([i, j, k])
                                    pv[ii, jj, kk] += weight * vs[p]
                                    pw[ii, jj, kk] += weight

            if joint_verts_v is not None and num_joint_v:
                add_pts(self.x[E_n:E_n + num_joint_v], joint_verts_v)
            if joint_faces_v is not None and num_joint_f:
                add_pts(self.x[:num_joint_f], joint_faces_v)
            cov = pw > 1e-15
            grid_v_out[cov] = pv[cov] / pw[cov][:, None]

        # sticky floor (surface collider, default sticky)
        if floor_y is not None:
            for gy in range(G):
                if gy * self.dx - floor_y < 0.0:
                    grid_v_out[:, gy, :, :] = 0.0

        # g2p_v (vertices)
        a_min, a_max = 2 * self.dx, self.grid_lim - 2 * self.dx
        new_x = self.x.copy()
        new_v = self.v.copy()
        new_C = self.C.copy()
        gradv_e = np.zeros((E_n, 3, 3))
        for p in range(P):
            base, fx, w, dw = spline_weights(self.x[p], self.inv_dx)
            nv = np.zeros(3)
            nC = np.zeros((3, 3))
            nF = np.zeros((3, 3))
            for i in range(3):
                for j in range(3):
                    for k in range(3):
                        dpos = np.array([i, j, k]) - fx
                        weight = w[i, 0] * w[j, 1] * w[k, 2]
                        gv = grid_v_out[base[0] + i, base[1] + j, base[2] + k]
                        nv += gv * weight
                        nC += np.outer(gv, dpos) * (weight * self.inv_dx * 4.0)
                        dweight = self.inv_dx * np.array([
                            dw[i, 0] * w[j, 1] * w[k, 2],
                            w[i, 0] * dw[j, 1] * w[k, 2],
                            w[i, 0] * w[j, 1] * dw[k, 2]])
                        nF += np.outer(gv, dweight)
            if p >= E_n:
                new_v[p] = nv
                new_x[p] = np.clip(self.x[p] + dt * nv, a_min, a_max)
                new_C[p] = nC
            else:
                new_C[p] = nC
                gradv_e[p] = nF
        # g2p_e (elements) — reads UPDATED vertex x, v
        for e in range(E_n):
            f = self.faces[e] + E_n
            new_v[e] = new_v[f].mean(0)
            new_x[e] = new_x[f].mean(0)
            d1 = new_x[f[1]] - new_x[f[0]]
            d2 = new_x[f[2]] - new_x[f[0]]
            d3 = (np.eye(3) + gradv_e[e] * dt) @ self.d[e][:, 2]
            self.d[e] = np.stack([d1, d2, d3], -1)

        self.x, self.v, self.C = new_x, new_v, new_C
