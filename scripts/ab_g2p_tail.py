"""A/B the g2p tail (advect + F_trial + element/d rebuild) layouts on
the TPU at the demo shape.  Candidates:

  base     current stepping.g2p
  packgat  face-vertex reads as 3 SLICED gathers of the packed rows
           (`out_pack[fi[:, 0], :6]` — lowers to a pathological strided
           gather; kept as the negative result)
  fullrow  face-vertex reads as 3 FULL-ROW gathers of the packed (P,15)
           rows, sliced after the gather — the shipped stepping.g2p
           formulation
  cmaj_d3  d3 advection as 9 lane-full FMAs over (E,) channel-major
           vectors (instead of a (E,3,3)@(E,3) batched matvec that
           lowers to 3-wide lanes)
  both     fullrow + cmaj_d3

Run: python -u scripts/ab_g2p_tail.py
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    from mpmavatar_tpu.utils import compile_cache
    compile_cache.setup()
    import jax.numpy as jnp
    import numpy as np

    from bench import build_cloth
    from mpmavatar_tpu.core import stepping, types

    verts, faces = build_cloth(183, 183)
    n_t = 100000
    G = 250
    cfg = types.MPMStaticConfig(n_elements=len(faces), n_traditional=n_t,
                                n_vertices=len(verts), n_grid=G,
                                grid_lim=2.0, material=2,
                                num_joint_v=256, num_joint_f=128)
    rng = np.random.default_rng(0)
    d, r_inv, evol, vvol = types.cloth_geometry(jnp.asarray(verts),
                                                jnp.asarray(faces))
    sand = (rng.random((n_t, 3)).astype(np.float32)
            * np.asarray([0.8, 0.1, 0.4]) + np.asarray([0.6, 1.6, 0.8]))
    x = jnp.concatenate([jnp.asarray(verts)[faces].mean(1),
                         jnp.asarray(sand), jnp.asarray(verts)], 0)
    vol = jnp.concatenate([evol, jnp.full((n_t,), 1e-7, jnp.float32),
                           vvol])
    state = types.make_state(cfg, x, faces=faces, d=d, R_inv=r_inv,
                             vol=vol)
    model = types.make_model(cfg.n_particles, E=2000.0, nu=0.3)
    P = cfg.n_particles
    dt = 1e-4

    gathered = (
        jnp.asarray(rng.standard_normal((P, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal((P, 3, 3)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((P, 3, 3)).astype(np.float32)),
    )
    grid_dummy = jnp.zeros((1, 3), jnp.float32)

    def timeit(name, fn, *a, reps=30):
        f = jax.jit(fn)
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*a)
        jax.block_until_ready(out)
        # force a real sync through the tunnel
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:10s} {ms:8.3f} ms")
        return out

    def g2p_variant(st, g, packgat=False, fullrow=False, cmaj_d3=False):
        E, T, V = cfg.n_elements, cfg.n_traditional, cfg.n_vertices
        inv_dx, dx = cfg.inv_dx, cfg.dx
        new_v, new_c, grad_v = g
        sel = (st.selection == 0)
        a_min, a_max = dx * 2.0, cfg.grid_lim - dx * 2.0
        new_x = jnp.clip(st.x + dt * new_v, a_min, a_max)
        nonelem = jnp.zeros((P,), bool).at[E:].set(True)
        upd = (sel & nonelem)[:, None]
        old_pack = jnp.concatenate([st.x, st.v, st.C.reshape(P, 9)], -1)
        new_pack = jnp.concatenate([new_x, new_v, new_c.reshape(P, 9)],
                                   -1)
        out_pack = jnp.where(upd, new_pack, old_pack)
        x1 = out_pack[:, 0:3]
        v1 = out_pack[:, 3:6]
        c1 = out_pack[:, 6:15].reshape(P, 3, 3)

        gv9 = grad_v[E:E + T].reshape(T, 9).T
        f9 = st.F.reshape(T, 9).T
        rows = []
        for a in range(3):
            for b in range(3):
                acc = f9[3 * a + b]
                for c in range(3):
                    acc = acc + dt * gv9[3 * a + c] * f9[3 * c + b]
                rows.append(acc)
        f_new = jnp.stack(rows, 0)
        f_new = jnp.where(sel[None, E:E + T], f_new,
                          st.F_trial.reshape(T, 9).T)
        f_trial = f_new.T.reshape(T, 3, 3)

        voff = E + T
        fi = st.faces + voff
        if packgat:
            # sliced gather: `pack[fi, :6]` — measured pathological
            # (195 ms standalone); kept as the negative result
            pa = out_pack[fi[:, 0], :6]
            pb = out_pack[fi[:, 1], :6]
            pc = out_pack[fi[:, 2], :6]
            avg = (pa + pb + pc) / 3.0
            ex, ev = avg[:, 0:3], avg[:, 3:6]
            d1 = pb[:, 0:3] - pa[:, 0:3]
            d2 = pc[:, 0:3] - pa[:, 0:3]
        elif fullrow:
            # full-row gather then slice — matches shipped stepping.g2p
            pa = out_pack[fi[:, 0]]
            pb = out_pack[fi[:, 1]]
            pc = out_pack[fi[:, 2]]
            avg = (pa + pb + pc) / 3.0
            ex, ev = avg[:, 0:3], avg[:, 3:6]
            d1 = (pb - pa)[:, 0:3]
            d2 = (pc - pa)[:, 0:3]
        else:
            xa, xb, xc = x1[fi[:, 0]], x1[fi[:, 1]], x1[fi[:, 2]]
            va, vb, vc = v1[fi[:, 0]], v1[fi[:, 1]], v1[fi[:, 2]]
            ex = (xa + xb + xc) / 3.0
            ev = (va + vb + vc) / 3.0
            d1 = xb - xa
            d2 = xc - xa
        d3_old = st.d[..., :, 2]
        if cmaj_d3:
            gvE = grad_v[:E].reshape(E, 9).T          # (9, E)
            d3o = d3_old.T                             # (3, E)
            d3 = jnp.stack(
                [d3o[a] + dt * (gvE[3 * a + 0] * d3o[0]
                                + gvE[3 * a + 1] * d3o[1]
                                + gvE[3 * a + 2] * d3o[2])
                 for a in range(3)], 0).T
        else:
            d3 = d3_old + dt * jnp.einsum("eab,eb->ea", grad_v[:E],
                                          d3_old)
        new_d = jnp.stack([d1, d2, d3], axis=-1)
        sel_e = sel[:E]
        x1 = x1.at[:E].set(jnp.where(sel_e[:, None], ex, st.x[:E]))
        v1 = v1.at[:E].set(jnp.where(sel_e[:, None], ev, st.v[:E]))
        c1 = c1.at[:E].set(jnp.where(sel_e[:, None, None], new_c[:E],
                                     st.C[:E]))
        d_out = jnp.where(sel_e[:, None, None], new_d, st.d)
        return x1, v1, c1, f_trial, d_out

    base = timeit("base", lambda st, g: stepping.g2p(
        cfg, st, model, grid_dummy, dt, gathered=g), state, gathered)
    for name, kw in [("packgat", dict(packgat=True)),
                     ("fullrow", dict(fullrow=True)),
                     ("cmaj_d3", dict(cmaj_d3=True)),
                     ("both", dict(fullrow=True, cmaj_d3=True))]:
        out = timeit(name, lambda st, g, kw=kw: g2p_variant(st, g, **kw),
                     state, gathered)
        for i, (a, b) in enumerate(zip(base, out)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5,
                                       err_msg=f"{name} out[{i}]")
    print("parity OK")


if __name__ == "__main__":
    main()
