"""Kernel cost decomposition on the TPU: fixed per-block cost vs per-visit
cost, and the effect of tile-swizzled ray order on visit counts.

Uses the data-dependent lax.scan repetition trick (profile_phases.py) so
the axon tunnel's dispatch floor and response caching cannot skew results.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    t_1 = timeit(run1, carry_init)
    return (t_r - t_1) / (R_REP - 1)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    from potato_tpu.ops.flash import R as BR, _flash_raw, build_block_queue
    from potato_tpu.render.camera import generate_rays
    from potato_tpu.render.renderer import tile_swizzle_ids
    from potato_tpu.scene import examples

    scene = examples.bunny().build(accel="flash")
    acc = scene.accel
    width, height, spp = 800, 600, 4
    total = width * height * spp
    chunk = 1 << 18
    seed = jnp.uint32(0)

    raw = jnp.arange(chunk, dtype=jnp.uint32)
    ids_lin = raw
    ids_sw = tile_swizzle_ids(raw % jnp.uint32(total), width, spp)

    for label, ids in (("linear ", ids_lin), ("swizzle", ids_sw)):
        rays = jax.jit(lambda i: generate_rays(scene.camera, width, height,
                                               spp, i, seed))(ids)
        rays = jax.block_until_ready(rays)
        tn, tc, te = jax.jit(lambda r: build_block_queue(
            r, acc.tri_cmin, acc.tri_cmax))(rays)
        sn, sc, se = jax.jit(lambda r: build_block_queue(
            r, acc.sph_cmin, acc.sph_cmax))(rays)
        t_visits = int(jnp.sum(tn))
        s_visits = int(jnp.sum(sn))
        nb = chunk // BR
        log(f"{label}: tri visits {t_visits} ({t_visits/nb:.1f}/blk), "
            f"sph visits {s_visits} ({s_visits/nb:.1f}/blk)")

        def kernel_call(tmax, rays=rays):
            out, _, _ = _flash_raw(acc, rays._replace(t_max=tmax))
            return tmax + (out[0] - out[0])

        per = scan_phase(kernel_call, rays.t_max)
        log(f"{label}: queue+kernel(real) {per*1e3:.2f} ms/iter")

        # dead rays => empty queues: pure fixed per-block cost
        def kernel_dead(tmax, rays=rays):
            out, _, _ = _flash_raw(acc, rays._replace(t_max=tmax * 0.0 - 1.0))
            return tmax + (out[0] - out[0])

        per = scan_phase(kernel_dead, rays.t_max)
        log(f"{label}: queue+kernel(all-dead) {per*1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
