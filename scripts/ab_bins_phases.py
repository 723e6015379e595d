"""Micro-profile of build_bins' internal phases at the demo shape.

Run: python -u scripts/ab_bins_phases.py
"""

import sys
import time

sys.path.insert(0, ".")


def timed(fn, *args, reps=50):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / reps * 1e3


def jax_block(out):
    # host transfer: the tunneled runtime's block_until_ready can return
    # before the computation finishes; a reduction to host cannot.
    import jax.numpy as jnp
    leaves = [a for a in __import__("jax").tree_util.tree_leaves(out)
              if hasattr(a, "dtype")]
    float(jnp.sum(leaves[0].astype(jnp.float32)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpmavatar_tpu.core import types
    from mpmavatar_tpu.ops import column_transfer as ct

    P, K, c_cap, G = 200_000, 96, 3584, 250
    cfg = types.MPMStaticConfig(n_elements=0, n_traditional=P,
                                n_vertices=0, n_grid=G, grid_lim=2.0,
                                material=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.random((P, 3)) * 0.9 + 0.55).astype(np.float32))

    full = jax.jit(lambda x: ct.build_bins(x, cfg, K, c_cap=c_cap))
    print(f"build_bins full      {timed(full, x):7.3f} ms")

    def key_only(x):
        col, sentinel = ct._bin_key(x, cfg, False)
        return col

    print(f"  _bin_key           {timed(jax.jit(key_only), x):7.3f} ms")

    col, _ = ct._bin_key(x, cfg, False)

    def sort1(col):
        iota = jnp.arange(P, dtype=jnp.int32)
        return jax.lax.sort((col, iota), num_keys=1)

    print(f"  sort1              {timed(jax.jit(sort1), col):7.3f} ms")
    sorted_col, perm = jax.jit(sort1)(col)

    def scans(sorted_col):
        iota = jnp.arange(P, dtype=jnp.int32)
        flags = jnp.concatenate([jnp.ones((1,), jnp.int32),
                                 (sorted_col[1:] != sorted_col[:-1])
                                 .astype(jnp.int32)])
        seg_id = jnp.cumsum(flags) - 1
        seg_start = jax.lax.cummax(jnp.where(flags > 0, iota, 0))
        return seg_id, iota - seg_start

    print(f"  scans (cumsum+max) {timed(jax.jit(scans), sorted_col):7.3f} ms")
    seg_id, rank_sorted = jax.jit(scans)(sorted_col)

    def segtables(seg_id, sorted_col):
        first_pos = jnp.searchsorted(seg_id, jnp.arange(c_cap + 1)
                                     ).astype(jnp.int32)
        n_seg = seg_id[-1] + 1
        seg_col = jnp.where(jnp.arange(c_cap) < n_seg,
                            sorted_col[jnp.clip(first_pos[:c_cap], 0,
                                                P - 1)], 2 ** 30)
        seg_count = first_pos[1:] - first_pos[:-1]
        rows_per_seg = (seg_count + K - 1) // K
        row_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                   jnp.cumsum(rows_per_seg)
                                   .astype(jnp.int32)])
        return first_pos, seg_col, seg_count, row_off

    print(f"  seg tables         "
          f"{timed(jax.jit(segtables), seg_id, sorted_col):7.3f} ms")
    first_pos, seg_col, seg_count, row_off = jax.jit(segtables)(
        seg_id, sorted_col)

    def rowtables(first_pos, seg_col, seg_count, row_off, perm):
        r = jnp.arange(c_cap)
        s_of_r = jnp.clip(jnp.searchsorted(row_off, r, side="right") - 1,
                          0, c_cap - 1)
        total_rows = row_off[-1]
        valid_row = r < total_rows
        active_col = jnp.where(valid_row, seg_col[s_of_r], 2 ** 30)
        chunk = r - row_off[s_of_r]
        row_start = first_pos[s_of_r] + chunk * K
        row_count = jnp.where(valid_row,
                              jnp.clip(seg_count[s_of_r] - chunk * K,
                                       0, K), 0)
        slots = jnp.arange(K)
        valid = slots[None, :] < row_count[:, None]
        perm_pad = jnp.concatenate([perm, jnp.full((K,), P, jnp.int32)])
        pid_rows = perm_pad[jnp.clip(row_start, 0, P)[:, None]
                            + slots[None, :]]
        pid = jnp.where(valid, pid_rows, P)
        return active_col, pid, valid

    print(f"  row tables + pid   "
          f"{timed(jax.jit(rowtables), first_pos, seg_col, seg_count, row_off, perm):7.3f} ms")

    def restore(perm, seg_id, rank_sorted, row_off):
        row_of_p = row_off[jnp.clip(seg_id, 0, c_cap - 1)] + rank_sorted // K
        ok = (seg_id < c_cap) & (row_of_p < c_cap)
        rank_capped = jnp.where(ok, rank_sorted % K, K + 1).astype(jnp.int32)
        row_capped = jnp.clip(row_of_p, 0, c_cap - 1).astype(jnp.int32)
        _, rank_of_p, cidx_of_p = jax.lax.sort(
            (perm, rank_capped, row_capped), num_keys=1)
        return rank_of_p, cidx_of_p

    print(f"  restore (sort2)    "
          f"{timed(jax.jit(restore), perm, seg_id, rank_sorted, row_off):7.3f} ms")


if __name__ == "__main__":
    main()
