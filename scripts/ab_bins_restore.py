"""A/B: restore-to-original-order via lax.sort (current) vs scatter.

build_bins' second multi-operand sort exists only to invert the first
sort's permutation; a scatter with unique indices does the same job.
Run: python -u scripts/ab_bins_restore.py
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    P = 200_000
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(P).astype(np.int32))
    rank = jnp.asarray(rng.integers(0, 96, P).astype(np.int32))
    row = jnp.asarray(rng.integers(0, 3584, P).astype(np.int32))

    @jax.jit
    def via_sort(perm, rank, row):
        _, r, c = jax.lax.sort((perm, rank, row), num_keys=1)
        return r, c

    @jax.jit
    def via_scatter(perm, rank, row):
        packed = rank.astype(jnp.int64) << 32 | row.astype(jnp.int64)
        out = jnp.zeros((P,), jnp.int64).at[perm].set(
            packed, unique_indices=True, mode="promise_in_bounds")
        return (out >> 32).astype(jnp.int32), (out & 0xFFFFFFFF).astype(jnp.int32)

    @jax.jit
    def via_scatter2(perm, rank, row):
        both = jnp.stack([rank, row], -1)
        out = jnp.zeros((P, 2), jnp.int32).at[perm].set(
            both, unique_indices=True, mode="promise_in_bounds")
        return out[:, 0], out[:, 1]

    for name, fn in [("sort", via_sort), ("scatter_i64", via_scatter),
                     ("scatter_2col", via_scatter2)]:
        try:
            r, c = fn(perm, rank, row)
            r.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(50):
                r, c = fn(perm, rank, row)
            r.block_until_ready()
            ms = (time.perf_counter() - t0) / 50 * 1e3
            ok = bool(jnp.all(r == via_sort(perm, rank, row)[0]))
            print(f"{name:14s} {ms:7.3f} ms  match={ok}")
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
