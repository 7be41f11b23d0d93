"""Dispatch-floor-corrected per-phase profile (one TPU process).

The remote-attached TPU has a per-dispatch round-trip latency that floors
any single-call timing (~25 ms observed), so each phase is repeated R times
*inside one jit* via lax.scan with data dependence (no CSE/hoisting) and
the per-iteration cost is (t_R - t_1) / (R - 1).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

R = 8


def timeit(fn, *args, reps=3):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def scan_phase(phase, carry_init):
    """Repeat `phase` R times with a data-dependent carry; returns jit fn."""

    def once(c, _):
        return phase(c), None

    @jax.jit
    def run(c):
        out, _ = jax.lax.scan(once, c, None, length=R)
        return out

    @jax.jit
    def run1(c):
        return phase(c)

    t_r = timeit(run, carry_init)
    t_1 = timeit(run1, carry_init)
    return (t_r - t_1) / (R - 1), t_1


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    from potato_tpu.scene import examples

    t0 = time.perf_counter()
    scene = examples.bunny().build(accel="flash")
    log(f"scene build: {time.perf_counter()-t0:.2f}s")

    from potato_tpu.core import rng as prng
    from potato_tpu.ops.flash import build_block_queue, intersect_flash
    from potato_tpu.ops.material import eval_material
    from potato_tpu.render.camera import generate_rays

    chunk = 1 << 18
    ids = jnp.arange(chunk, dtype=jnp.uint32)
    acc = scene.accel

    # dispatch floor: trivial program
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    log(f"dispatch floor (x+1): {timeit(f, x)*1e3:.2f} ms")

    # raygen: carry = seed
    def raygen_phase(seed):
        rays = generate_rays(scene.camera, 800, 600, 4, ids, seed)
        return seed + rays.origin[0, 0].astype(jnp.uint32)

    per, one = scan_phase(raygen_phase, jnp.uint32(0))
    log(f"raygen: {per*1e3:.2f} ms/iter (single call {one*1e3:.1f} ms)")

    rays = jax.jit(lambda s: generate_rays(scene.camera, 800, 600, 4, ids, s))(
        jnp.uint32(0))
    rays = jax.block_until_ready(rays)

    # threefry alone
    def rng_phase(seed):
        u1, u2 = prng.uniform2(seed, jnp.uint32(1), ids)
        return seed + (u1[0] * 4e9).astype(jnp.uint32)

    per, one = scan_phase(rng_phase, jnp.uint32(0))
    log(f"one uniform2 (262k): {per*1e3:.2f} ms/iter")

    # queue build: carry = t_max offset (data dependence via rays)
    def queue_phase(tmax):
        r = rays._replace(t_max=tmax)
        tn, tc, te = build_block_queue(r, acc.tri_cmin, acc.tri_cmax)
        sn, sc, se = build_block_queue(r, acc.sph_cmin, acc.sph_cmax)
        return tmax + (te[0, 0] - te[0, 0])  # dep on output, value unchanged

    per, one = scan_phase(queue_phase, rays.t_max)
    log(f"queue build (tri+sph): {per*1e3:.2f} ms/iter")

    # full intersect: carry = t_max
    def isect_phase(tmax):
        r = rays._replace(t_max=tmax)
        hit = intersect_flash(acc, scene.tables, r)
        return tmax + (hit.t - hit.t)

    per, one = scan_phase(isect_phase, rays.t_max)
    log(f"intersect_flash total: {per*1e3:.2f} ms/iter")

    hit = jax.block_until_ready(
        jax.jit(lambda r: intersect_flash(acc, scene.tables, r))(rays))

    # shade: carry = seed
    def shade_phase(seed):
        u1, u2 = prng.uniform2(seed, prng.bounce_salt(0, prng.STREAM_SCATTER_A), ids)
        u3, u4 = prng.uniform2(seed, prng.bounce_salt(0, prng.STREAM_SCATTER_B), ids)
        m = eval_material(scene.tables, hit.material, rays.direction, hit,
                          u1, u2, u3, u4, features=scene.features)
        return seed + (m.emit[0, 0] * 255).astype(jnp.uint32)

    per, one = scan_phase(shade_phase, jnp.uint32(0))
    log(f"shade (incl 4x uniform2): {per*1e3:.2f} ms/iter")

    # kernel-only (queue build + pallas launch, no shade epilogue)
    from potato_tpu.ops.flash import _flash_raw

    def kernel_only(tmax):
        out, _, _ = _flash_raw(acc, rays._replace(t_max=tmax))
        return tmax + (out[0] - out[0])

    per, one = scan_phase(kernel_only, rays.t_max)
    log(f"queue+kernel (no shade-gather epilogue): {per*1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
