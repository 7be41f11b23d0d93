"""Per-bounce cost + liveness profile of the bunny frame on the TPU.

Answers: how many bounce iterations actually run per chunk, how many lanes
are live at each bounce, and what one bounce iteration costs at each depth
(intersect + shade + integrator glue), so optimization targets the real
time sinks rather than the camera-ray intersect alone.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    from potato_tpu.core import rng as prng
    from potato_tpu.core.types import BIG, RAY_EPSILON, RayBatch
    from potato_tpu.ops.material import eval_material
    from potato_tpu.render.camera import generate_rays
    from potato_tpu.render.renderer import make_intersect_fn, tile_swizzle_ids
    from potato_tpu.scene import examples

    scene = examples.bunny().build(accel="flash")
    width, height, spp, max_bounce = 800, 600, 4, 8
    chunk = 1 << 18
    total = width * height * spp
    seed = jnp.asarray(0, jnp.uint32)
    intersect_fn = make_intersect_fn(scene)

    # chunk 0 rays, tile-swizzled like the real frame
    raw = jnp.arange(chunk, dtype=jnp.uint32)
    ids = tile_swizzle_ids(raw % jnp.uint32(total), width, spp)

    raygen = jax.jit(lambda i, s: generate_rays(scene.camera, width, height,
                                                spp, i, s))
    rays = jax.block_until_ready(raygen(ids, seed))

    # step one bounce manually, reporting live counts and per-depth costs
    isect = jax.jit(lambda r: intersect_fn(scene.tables, r))

    def shade(h, r, bounce):
        u1, u2 = prng.uniform2(seed, prng.bounce_salt(bounce, prng.STREAM_SCATTER_A), ids)
        u3, u4 = prng.uniform2(seed, prng.bounce_salt(bounce, prng.STREAM_SCATTER_B), ids)
        v3 = h.valid[..., None]
        h = h._replace(position=jnp.where(v3, h.position, 0.0),
                       normal=jnp.where(v3, h.normal, jnp.asarray([0., 0., 1.])),
                       t=jnp.where(h.valid, h.t, 1.0))
        return eval_material(scene.tables, h.material, r.direction, h,
                             u1, u2, u3, u4, features=scene.features)

    def next_rays(h, m, r, active):
        nact = active & h.valid & m.scatter.valid
        return RayBatch(
            origin=jnp.where(nact[..., None], h.position, 0.0),
            direction=m.scatter.direction,
            t_min=jnp.full_like(h.t, RAY_EPSILON),
            t_max=jnp.where(nact, BIG, -1.0)), nact

    shade_j = jax.jit(shade, static_argnums=2)
    next_j = jax.jit(next_rays)

    active = jnp.ones((chunk,), bool)
    r = rays
    for bounce in range(max_bounce):
        live = int(jnp.sum(r.t_max > 0))
        dt_i = timeit(isect, r)
        hit = jax.block_until_ready(isect(r))
        dt_s = timeit(shade_j, hit, r, bounce)
        m = jax.block_until_ready(shade_j(hit, r, bounce))
        log(f"bounce {bounce}: live={live:7d} intersect={dt_i*1e3:6.2f}ms "
            f"shade={dt_s*1e3:5.2f}ms")
        r, active = jax.block_until_ready(next_j(hit, m, r, active))
        if live == 0:
            break

    # whole-frame trips: run the scan (fixed 8 bounces) vs while_loop frame
    from potato_tpu.render.renderer import compile_frame
    frame_fn, starts = compile_frame(scene, width, height, spp=spp,
                                     max_bounce=max_bounce)
    out = frame_fn(scene.tables, scene.camera, seed, starts)
    segs = int(np.asarray(jnp.sum(out.segments)))
    dt = timeit(frame_fn, scene.tables, scene.camera, seed, starts)
    log(f"frame: {dt*1e3:.1f} ms, {segs} segments, {segs/dt/1e6:.1f}M rays/s")


if __name__ == "__main__":
    main()
