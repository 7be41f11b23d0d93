"""Isolate the regeneration pool's per-iteration overheads: scatter,
refill/raygen, RNG-with-array-salts — by timing stripped variants."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[3] if isinstance(out, tuple) else out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    from potato_tpu.core import rng as prng
    from potato_tpu.render import wavefront as wf
    from potato_tpu.scene import examples

    scene = examples.bunny().build(accel="flash")
    width, height, spp, mb = 800, 600, 4, 8
    seed = jnp.uint32(1)

    # full pool renderer
    fn = wf.build_pool_fn(scene, width, height, spp, mb)
    dt = timeit(fn, scene.tables, scene.camera, seed)
    log(f"pool full: {dt*1e3:.1f} ms")

    # pieces, timed standalone at pool size
    pool = 1 << 18
    ids = jnp.arange(pool, dtype=jnp.uint32)
    bounce = jnp.zeros((pool,), jnp.int32)

    def rng_scalar(s):
        u1, u2 = prng.uniform2(s, prng.bounce_salt(0, prng.STREAM_SCATTER_A), ids)
        return (u1[0] * 255).astype(jnp.uint32) + s

    def rng_array(s):
        u1, u2 = prng.uniform2(
            s, prng.bounce_salt(bounce, prng.STREAM_SCATTER_A), ids)
        return (u1[0] * 255).astype(jnp.uint32) + s

    for name, f in (("uniform2 scalar-salt", rng_scalar),
                    ("uniform2 array-salt ", rng_array)):
        g = jax.jit(f)
        jax.block_until_ready(g(seed))
        t0 = time.perf_counter()
        for i in range(8):
            s = g(jnp.uint32(i))
        np.asarray(s)
        log(f"{name}: {(time.perf_counter()-t0)/8*1e3:.2f} ms/call")

    total = width * height * spp
    color = jnp.zeros((total, 3))
    vals = jnp.ones((pool, 3))
    ridx = jnp.asarray(np.random.default_rng(0).permutation(total)[:pool],
                       jnp.int32)

    def scat(c, i):
        idx = (ridx + i.astype(jnp.int32)) % total
        return c.at[idx].set(vals, mode="drop")

    g = jax.jit(scat)
    c = jax.block_until_ready(g(color, jnp.uint32(0)))
    t0 = time.perf_counter()
    for i in range(8):
        c = g(c, jnp.uint32(i))
    np.asarray(c[0])
    log(f"scatter 262k rows -> (1.92M,3): {(time.perf_counter()-t0)/8*1e3:.2f} ms/call")

    def swiz(i):
        from potato_tpu.render.renderer import tile_swizzle_ids
        return tile_swizzle_ids((ids + i) % jnp.uint32(total), width, spp)

    g = jax.jit(swiz)
    jax.block_until_ready(g(jnp.uint32(0)))
    t0 = time.perf_counter()
    for i in range(8):
        s = g(jnp.uint32(i))
    np.asarray(s[0])
    log(f"tile_swizzle_ids: {(time.perf_counter()-t0)/8*1e3:.2f} ms/call")

    def csum(i):
        r = (ids + i) % jnp.uint32(7) > 3
        return jnp.cumsum(r.astype(jnp.uint32))

    g = jax.jit(csum)
    jax.block_until_ready(g(jnp.uint32(0)))
    t0 = time.perf_counter()
    for i in range(8):
        s = g(jnp.uint32(i))
    np.asarray(s[0])
    log(f"cumsum 262k: {(time.perf_counter()-t0)/8*1e3:.2f} ms/call")


if __name__ == "__main__":
    main()
