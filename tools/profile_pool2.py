"""Scan-repetition (dispatch-immune) timing of scatter and swizzle."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

R_REP = 8


def timeit(fn, *args, reps=3):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def scan_phase(phase, carry_init):
    def once(c, _):
        return phase(c), None

    @jax.jit
    def run(c):
        out, _ = jax.lax.scan(once, c, None, length=R_REP)
        return out

    @jax.jit
    def run1(c):
        return phase(c)

    t_r = timeit(run, carry_init)
    return (t_r - timeit(run1, carry_init)) / (R_REP - 1)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    pool = 1 << 18
    total = 800 * 600 * 4
    ids = jnp.arange(pool, dtype=jnp.uint32)
    ridx = jnp.asarray(np.random.default_rng(0).permutation(total)[:pool],
                       jnp.int32)
    vals = jnp.ones((pool, 3))

    def scat(c):
        idx = (ridx + c[0, 0].astype(jnp.int32)) % total
        return c.at[idx].set(vals, mode="drop")

    log(f"scatter 262k rows: {scan_phase(scat, jnp.zeros((total, 3)))*1e3:.2f} ms/iter")

    def scat_sorted(c):
        idx = ids.astype(jnp.int32) * 7 % total + c[0, 0].astype(jnp.int32) * 0
        return c.at[idx].set(vals, mode="drop")

    log(f"scatter 262k strided rows: {scan_phase(scat_sorted, jnp.zeros((total, 3)))*1e3:.2f} ms/iter")

    from potato_tpu.render.renderer import tile_swizzle_ids

    def swiz(c):
        s = tile_swizzle_ids((ids + c) % jnp.uint32(total), 800, 4)
        return c + s[0] * jnp.uint32(0) + jnp.uint32(1)

    log(f"tile_swizzle_ids: {scan_phase(swiz, jnp.uint32(0))*1e3:.2f} ms/iter")

    # gen-onehot accumulate alternative to scatter: (G, pool, 8) += mask
    G = 8
    buf0 = jnp.zeros((G, pool, 8))
    payload = jnp.ones((pool, 8))
    gen = (ids % jnp.uint32(G)).astype(jnp.int32)

    def acc(b):
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (G, pool), 0)
                  == gen[None, :] + b[0, 0, 0].astype(jnp.int32) * 0)
        return b + onehot[..., None] * payload[None]

    log(f"gen-onehot accumulate (G=8): {scan_phase(acc, buf0)*1e3:.2f} ms/iter")

    # dynamic-slice write alternative: write whole pool rows at lane-major
    # position using where-select into a carried (G*pool, 8) buffer is the
    # same onehot; also try segment write via one-hot matmul skipped.


if __name__ == "__main__":
    main()
