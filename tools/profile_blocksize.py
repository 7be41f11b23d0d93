"""Sweep the flash kernel's rays-per-block R: fixed-cost amortization vs
queue specificity, on real bunny camera rays (middle chunk: contains the
bunny) and on the sky/ground chunk 0."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

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
    timeit(run1, carry_init)
    return (t_r - timeit(run1, carry_init)) / (R_REP - 1)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    import potato_tpu.ops.flash as F
    from potato_tpu.render.camera import generate_rays
    from potato_tpu.render.renderer import tile_swizzle_ids
    from potato_tpu.scene import examples

    scene = examples.bunny().build(accel="flash")
    acc = scene.accel
    width, height, spp = 800, 600, 4
    total = width * height * spp
    chunk = 1 << 18
    seed = jnp.uint32(0)

    for chunk_idx in (3,):
        raw = jnp.arange(chunk, dtype=jnp.uint32) + jnp.uint32(chunk_idx * chunk)
        ids = tile_swizzle_ids(raw % jnp.uint32(total), width, spp)
        rays = jax.block_until_ready(jax.jit(
            lambda i: generate_rays(scene.camera, width, height, spp, i,
                                    seed))(ids))
        for R in (512, 1024):
            F.R = R
            tn, _, _ = jax.jit(lambda r: F.build_block_queue(
                r, acc.tri_cmin, acc.tri_cmax, block=R))(rays)
            visits = int(jnp.sum(tn))

            def isect(tmax, rays=rays):
                hit = F.intersect_flash(acc, scene.tables,
                                        rays._replace(t_max=tmax))
                return tmax + (hit.t - hit.t)

            per = scan_phase(isect, rays.t_max)
            log(f"chunk {chunk_idx} R={R}: intersect {per*1e3:.2f} ms/iter, "
                f"tri visits {visits} ({visits/(chunk//R):.1f}/blk)")
    F.R = 512


if __name__ == "__main__":
    main()
