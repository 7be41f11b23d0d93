"""Per-phase profile of the bunny benchmark on the attached TPU.

Answers "where does the frame time go" (VERDICT round 1: the 67x gap was
unprofiled). Phases timed independently, device-side only (block_until_ready
on device outputs; host fetches timed separately so remote-tunnel transfer
latency cannot masquerade as compute):

  upload          small/large host->device transfer latency
  scene build     host-side numpy compile + accel build + upload
  raygen          camera ray generation (1 chunk = 262144 rays)
  queue           XLA block-queue build (slab test + argsort), tri + sph
  kernel          the flash Pallas kernel alone
  intersect       full intersect_flash (queue + kernel + shade-field epilogue)
  shade           eval_material + background on the hit batch
  frame           the full jitted frame (device only)
  fetch           device->host copy of the frame color buffer

Run:  python tools/profile_bench.py [scene] [accel]
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
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    accel = sys.argv[2] if len(sys.argv) > 2 else "flash"
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    # --- upload latency ---
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(np.zeros((8, 128), np.float32)))
    log(f"upload 4KB (first, incl. backend init): {time.perf_counter()-t0:.3f}s")
    for size, label in ((np.zeros((8, 128), np.float32), "4KB"),
                        (np.zeros((2048, 3200), np.float32), "25MB")):
        dt = timeit(lambda s=size: jnp.asarray(s), reps=3, warmup=1)
        log(f"upload {label}: {dt*1e3:.1f} ms")

    # --- scene build ---
    from potato_tpu.scene import examples

    t0 = time.perf_counter()
    scene = examples.SCENES[scene_name]().build(accel=accel)
    log(f"scene build ({accel}): {time.perf_counter()-t0:.2f}s "
        f"({scene.num_triangles} tris, {scene.num_spheres} spheres)")

    from potato_tpu.render.camera import generate_rays
    from potato_tpu.render.renderer import make_intersect_fn, render

    width, height, spp, max_bounce = 800, 600, 4, 8
    chunk = 1 << 18
    ids = jnp.arange(chunk, dtype=jnp.uint32)
    seed = jnp.asarray(0, jnp.uint32)

    raygen = jax.jit(lambda i, s: generate_rays(scene.camera, width, height,
                                                spp, i, s))
    dt = timeit(raygen, ids, seed)
    log(f"raygen ({chunk} rays): {dt*1e3:.2f} ms")
    rays = jax.block_until_ready(raygen(ids, seed))

    acc = scene.accel
    if hasattr(acc, "tri_cmin"):
        from potato_tpu.ops.flash import build_block_queue

        queue = jax.jit(lambda r: (build_block_queue(r, acc.tri_cmin, acc.tri_cmax)
                                   + build_block_queue(r, acc.sph_cmin, acc.sph_cmax)))
        dt = timeit(queue, rays)
        log(f"queue build (tri {acc.tri_cmin.shape[0]}c + "
            f"sph {acc.sph_cmin.shape[0]}c): {dt*1e3:.2f} ms")

    intersect_fn = make_intersect_fn(scene)
    isect = jax.jit(lambda r: intersect_fn(scene.tables, r))
    dt = timeit(isect, rays)
    log(f"intersect (camera rays, {chunk}): {dt*1e3:.2f} ms")
    hit = jax.block_until_ready(isect(rays))

    # secondary-ray profile: scatter off the first hits (less coherent)
    from potato_tpu.core import rng as prng
    from potato_tpu.core.types import BIG, RAY_EPSILON, RayBatch
    from potato_tpu.ops.material import eval_material

    def shade(h, r):
        u1, u2 = prng.uniform2(seed, prng.bounce_salt(0, prng.STREAM_SCATTER_A), ids)
        u3, u4 = prng.uniform2(seed, prng.bounce_salt(0, prng.STREAM_SCATTER_B), ids)
        return eval_material(scene.tables, h.material, r.direction, h,
                             u1, u2, u3, u4, features=scene.features)

    shade_j = jax.jit(shade)
    dt = timeit(shade_j, hit, rays)
    log(f"shade (eval_material): {dt*1e3:.2f} ms")
    mat = jax.block_until_ready(shade_j(hit, rays))

    def next_rays(h, m):
        active = h.valid & m.scatter.valid
        return RayBatch(
            origin=jnp.where(active[..., None], h.position, 0.0),
            direction=m.scatter.direction,
            t_min=jnp.full_like(h.t, RAY_EPSILON),
            t_max=jnp.where(active, BIG, -1.0))

    rays2 = jax.block_until_ready(jax.jit(next_rays)(hit, mat))
    live = int(jnp.sum(rays2.t_max > 0))
    dt = timeit(isect, rays2)
    log(f"intersect (bounce-1 rays, {live}/{chunk} live): {dt*1e3:.2f} ms")

    # --- full frame, device-only vs fetch ---
    out = render(scene, width, height, spp=spp, max_bounce=max_bounce,
                 seed=0, chunk_size=chunk, with_aovs=False)  # compile+warm
    frame_fn = next(iter(scene.fn_cache.values()))
    total = width * height * spp
    num_chunks = (total + chunk - 1) // chunk
    starts = jnp.arange(num_chunks, dtype=jnp.uint32) * jnp.uint32(chunk)
    dt = timeit(frame_fn, scene.tables, scene.camera, seed, starts)
    segs = out.segments
    log(f"frame device-only: {dt*1e3:.1f} ms, {segs} segments "
        f"=> {segs/dt/1e6:.1f}M rays/s")
    dev_out = frame_fn(scene.tables, scene.camera, seed, starts)
    t0 = time.perf_counter()
    np.asarray(dev_out.color)
    log(f"fetch color ({np.prod(dev_out.color.shape)*4/1e6:.0f} MB): "
        f"{time.perf_counter()-t0:.3f}s")


if __name__ == "__main__":
    main()
