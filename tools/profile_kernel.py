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

    from potato_tpu.ops.flash import (
        OUT_COLS, R as BR, RAY_COLS, K, _flash_kernel, _pad_queue_rows,
        build_block_queue,
    )
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

        def kernel_call(tmax, tn=tn, tc=tc, te=te, sn=sn, sc=sc, se=se,
                        rays=rays):
            r = rays._replace(t_max=tmax)
            bp = r.origin.shape[0]
            nb = bp // BR
            o, d = r.origin, r.direction
            m = jnp.cross(d, o)
            packed = jnp.concatenate([
                o, d, m, r.t_min[:, None], r.t_max[:, None],
                jnp.zeros((bp, RAY_COLS - 11), jnp.float32)], axis=1)
            tn2, tc2, te2 = _pad_queue_rows([tn, tc, te], nb)
            sn2, sc2, se2 = _pad_queue_rows([sn, sc, se], nb)

            def smem(arr):
                return pl.BlockSpec((8, arr.shape[1]), lambda i: (i // 8, 0),
                                    memory_space=pltpu.SMEM)

            out = pl.pallas_call(
                _flash_kernel,
                grid=(nb,),
                in_specs=[smem(tn2), smem(tc2), smem(te2),
                          smem(sn2), smem(sc2), smem(se2),
                          pl.BlockSpec((BR, RAY_COLS), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((BR, OUT_COLS), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((bp, OUT_COLS), jnp.float32),
                scratch_shapes=[pltpu.VMEM((BR, K), jnp.float32)] * 4 +
                               [pltpu.VMEM((BR, 1), jnp.float32)],
            )(tn2, tc2, te2, sn2, sc2, se2, packed,
              acc.tri_feats, acc.sph_feats)
            return tmax + (out[:, 0] - out[:, 0])

        per = scan_phase(kernel_call, rays.t_max)
        log(f"{label}: kernel(real queues) {per*1e3:.2f} ms/iter")

        # empty queues: pure fixed per-block cost (scratch init, SMEM DMA,
        # winner extraction, grid overhead)
        zero_tn = jnp.zeros_like(tn)
        zero_sn = jnp.zeros_like(sn)
        per = scan_phase(
            lambda tmax: kernel_call(tmax, tn=zero_tn, sn=zero_sn),
            rays.t_max)
        log(f"{label}: kernel(empty queues) {per*1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
