"""Profile the two-level flash kernel on the real chip (round 4).

Measures, on a camera chunk and a bounce-1 chunk of the bunny bench
workload: packed/tail/sphere visit statistics (pair tests per ray), and
per-phase timings via the data-dependent lax.scan repetition trick
(identical repeated dispatches can be response-cached by the axon tunnel;
scan repetition inside one jit gives honest per-iteration numbers).

Run: python tools/profile_flash2.py [chunk_log2=18]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a):
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    jax.block_until_ready(f(*a))
    return time.perf_counter() - t0


def scan_phase(body, init, iters=32):
    """Per-iteration time of `body` via in-jit scan repetition: the carry
    makes iterations data-dependent so nothing collapses or caches."""
    @jax.jit
    def run(c):
        def step(c, _):
            return body(c), None
        out, _ = jax.lax.scan(step, c, None, length=iters)
        return out

    jax.block_until_ready(run(init))
    t0 = time.perf_counter()
    jax.block_until_ready(run(init))
    one = time.perf_counter() - t0

    @jax.jit
    def run1(c):
        return body(c)

    jax.block_until_ready(run1(init))
    t0 = time.perf_counter()
    jax.block_until_ready(run1(init))
    single = time.perf_counter() - t0
    per = (one - single) / (iters - 1)
    return per, single


def main():
    from potato_tpu.cache import enable_persistent_cache

    enable_persistent_cache()
    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    from potato_tpu.core import rng as prng
    from potato_tpu.ops import flash
    from potato_tpu.ops.flash import (
        R, W, build_block_queue, build_packed_queue, intersect_flash,
        _flash_raw,
    )
    from potato_tpu.ops.material import eval_material
    from potato_tpu.render.camera import generate_rays
    from potato_tpu.render.renderer import tile_swizzle_ids
    from potato_tpu.scene import examples

    chunk = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 18)
    t0 = time.perf_counter()
    scene = examples.bunny().build(accel="flash")
    log(f"scene build: {time.perf_counter()-t0:.2f}s")
    acc = scene.accel
    width, height, spp = 800, 600, 4
    total = width * height * spp
    seed = jnp.uint32(0)

    start = jnp.uint32(900_000)  # mid-frame rows: the bunny, not the sky
    raw = jnp.arange(chunk, dtype=jnp.uint32) + start
    ids = tile_swizzle_ids(raw % jnp.uint32(total), width, spp)
    rays = jax.jit(lambda i: generate_rays(scene.camera, width, height,
                                           spp, i, seed))(ids)
    rays = jax.block_until_ready(rays)

    # bounce-1 rays through the real integrator step
    @jax.jit
    def bounce1(rays):
        hit = intersect_flash(acc, scene.tables, rays)
        v1 = hit.valid
        hitc = hit._replace(
            position=jnp.where(v1[:, None], hit.position, 0.0),
            normal=jnp.where(v1[:, None], hit.normal,
                             jnp.asarray([0.0, 0.0, 1.0])),
            uv=jnp.where(v1[:, None], hit.uv, 0.0),
            t=jnp.where(v1, hit.t, 1.0))
        u1, u2 = prng.uniform2(seed, prng.bounce_salt(0, prng.STREAM_SCATTER_A), ids)
        u3, u4 = prng.uniform2(seed, prng.bounce_salt(0, prng.STREAM_SCATTER_B), ids)
        m = eval_material(scene.tables, hitc.material, rays.direction, hitc,
                          u1, u2, u3, u4, features=scene.features)
        active = v1 & m.scatter.valid
        zb = rays.t_min * 0.0
        from potato_tpu.core.types import BIG, RAY_EPSILON, RayBatch
        return RayBatch(
            origin=jnp.where(active[:, None], hitc.position, 0.0),
            direction=m.scatter.direction,
            t_min=zb + RAY_EPSILON,
            t_max=jnp.where(active, zb + BIG, zb - 1.0))

    rays_b1 = jax.block_until_ready(bounce1(rays))

    # ---- visit statistics (host-side, from the queue build) ----
    for label, rr in (("camera", rays), ("bounce1", rays_b1)):
        # fold the small-sphere bound like _flash_raw does
        if acc.num_spheres <= flash.SPH_BRUTE_MAX:
            s_t, _, _ = flash._sphere_brute_xla(scene.tables, rr)
            rr_eff = rr._replace(t_max=jnp.minimum(rr.t_max, s_t))
        else:
            rr_eff = rr
        n_pk, n_tail, _, _, _, _ = build_packed_queue(rr_eff, acc)
        nb = chunk // R
        npk = np.asarray(n_pk)[:, 0]
        ntl = np.asarray(n_tail)[:, 0]
        pair_packed = npk.mean() * 128          # per ray in the block
        pair_tail = ntl.mean() * 128
        log(f"[{label}] packed visits/blk {npk.mean():.2f} (max {npk.max()}), "
            f"tail visits/blk {ntl.mean():.2f} (max {ntl.max()}), "
            f"upper-bound pair tests/ray {pair_packed + pair_tail:.0f} "
            f"(early-termination not counted)")

    # ---- phase timings ----
    f = jax.jit(lambda x: x + 1.0)
    log(f"dispatch floor (x+1): {timeit(f, jnp.zeros((8, 128)))*1e3:.2f} ms")

    def queue_only(tmax):
        n_pk, n_tail, tail_ids, qf_pk, qf_tail, packed = \
            build_packed_queue(rays._replace(t_max=tmax), acc)
        return tmax + (qf_pk[:, :1].sum() - qf_pk[:, :1].sum())

    per, one = scan_phase(queue_only, rays.t_max)
    log(f"queue only (gather DCE'd): {per*1e3:.2f} ms/iter (single {one*1e3:.1f})")

    def queue_gather(tmax):
        n_pk, n_tail, tail_ids, qf_pk, qf_tail, packed = \
            build_packed_queue(rays._replace(t_max=tmax), acc)
        return tmax + (packed[:, 0, :1].sum() * 0.0 + qf_pk[:, :1].sum() * 0.0)

    per, one = scan_phase(queue_gather, rays.t_max)
    log(f"queue + packed gather: {per*1e3:.2f} ms/iter (single {one*1e3:.1f})")

    # epilogue in isolation: precomputed kernel output, vary a data dep
    out0, _, sph0 = jax.jit(lambda r: _flash_raw(acc, r, tables=scene.tables))(rays)
    out0 = jax.block_until_ready(out0)

    def epilogue_phase(carry):
        # emulate intersect_flash's epilogue on precomputed raw records
        import potato_tpu.ops.flash as F
        tp = acc.tri_perm
        ntp = tp.shape[0]
        t = scene.tables
        tri_rows_sh = jnp.concatenate([
            t.tri_na[tp], t.tri_nb[tp], t.tri_nc[tp],
            t.tri_ua[tp], t.tri_ub[tp], t.tri_uc[tp],
            t.tri_pa[tp], t.tri_pb[tp], t.tri_pc[tp],
            t.tri_material[tp][:, None].astype(jnp.float32)], axis=1)
        sp = jnp.arange(t.s_center.shape[0], dtype=jnp.int32)
        sph_rows_sh = jnp.concatenate([
            t.s_center[sp], t.s_radius[sp][:, None],
            jnp.zeros((sp.shape[0], 20), jnp.float32),
            t.s_material[sp][:, None].astype(jnp.float32)], axis=1)
        unified = jnp.concatenate([tri_rows_sh, sph_rows_sh], axis=0)
        out = out0 + carry[None, :] * 0.0
        tr_slot = jnp.clip(out[1].astype(jnp.int32), 0, ntp - 1)
        uslot = tr_slot
        g = unified[uslot]
        return carry + g[:, 0] * 0.0

    per, one = scan_phase(epilogue_phase, rays.t_min * 0.0)
    log(f"unified table + per-ray gather: {per*1e3:.2f} ms/iter (single {one*1e3:.1f})")

    def kernel_phase(tmax):
        out, _, _ = _flash_raw(acc, rays._replace(t_max=tmax),
                               tables=scene.tables)
        return tmax + (out[0] - out[0])

    per, one = scan_phase(kernel_phase, rays.t_max)
    log(f"queue+gather+kernel: {per*1e3:.2f} ms/iter (single {one*1e3:.1f})")

    def full_phase(tmax):
        hit = intersect_flash(acc, scene.tables, rays._replace(t_max=tmax))
        return tmax + (hit.t - hit.t)

    per, one = scan_phase(full_phase, rays.t_max)
    log(f"intersect_flash full: {per*1e3:.2f} ms/iter (single {one*1e3:.1f})")

    def full_b1(tmax):
        hit = intersect_flash(acc, scene.tables, rays_b1._replace(t_max=tmax))
        return tmax + (hit.t - hit.t)

    per, one = scan_phase(full_b1, rays_b1.t_max)
    log(f"intersect_flash bounce1: {per*1e3:.2f} ms/iter (single {one*1e3:.1f})")


if __name__ == "__main__":
    main()
