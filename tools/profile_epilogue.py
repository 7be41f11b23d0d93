"""Decompose intersect_flash's XLA glue: ray packing, queue build, the
shade-table row gathers, and the hit-field math."""

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
    return (t_r - timeit(run1, carry_init)) / (R_REP - 1)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    import numpy as np

    from potato_tpu.ops.flash import build_block_queue
    from potato_tpu.ops.intersect import sphere_hit_fields, triangle_hit_fields
    from potato_tpu.render.camera import generate_rays
    from potato_tpu.render.renderer import tile_swizzle_ids
    from potato_tpu.scene import examples

    scene = examples.bunny().build(accel="flash")
    acc = scene.accel
    t = scene.tables
    width, height, spp = 800, 600, 4
    total = width * height * spp
    chunk = 1 << 18
    seed = jnp.uint32(0)
    raw = jnp.arange(chunk, dtype=jnp.uint32)
    ids = tile_swizzle_ids(raw % jnp.uint32(total), width, spp)
    rays = jax.block_until_ready(jax.jit(
        lambda i: generate_rays(scene.camera, width, height, spp, i,
                                seed))(ids))

    # ray packing (cross + concat)
    def pack(tmax):
        o, d = rays.origin, rays.direction
        m = jnp.cross(d, o)
        packed = jnp.concatenate([o, d, m, rays.t_min[:, None], tmax[:, None],
                                  jnp.zeros((chunk, 5), jnp.float32)], axis=1)
        return tmax + (packed[:, 0] - packed[:, 0])

    log(f"pack: {scan_phase(pack, rays.t_max)*1e3:.2f} ms")

    def queue(tmax):
        r = rays._replace(t_max=tmax)
        tn, tc, te = build_block_queue(r, acc.tri_cmin, acc.tri_cmax)
        sn, sc, se = build_block_queue(r, acc.sph_cmin, acc.sph_cmax)
        return tmax + (te[0, 0] - te[0, 0]) + (se[0, 0] - se[0, 0])

    log(f"queue tri+sph: {scan_phase(queue, rays.t_max)*1e3:.2f} ms")

    # shade-table build (one-time gathers over 5k prims) + row gathers
    tp = acc.tri_perm
    tri_shade = jnp.concatenate([
        t.tri_na[tp], t.tri_nb[tp], t.tri_nc[tp],
        t.tri_ua[tp], t.tri_ub[tp], t.tri_uc[tp],
        t.tri_material[tp][:, None].astype(jnp.float32)], axis=1)
    sp = acc.sph_perm
    sph_shade = jnp.concatenate([
        t.s_center[sp], t.s_radius[sp][:, None],
        t.s_material[sp][:, None].astype(jnp.float32)], axis=1)
    tri_shade = jax.block_until_ready(tri_shade)
    sph_shade = jax.block_until_ready(sph_shade)
    rng = np.random.default_rng(0)
    slots = jnp.asarray(rng.integers(0, tri_shade.shape[0], chunk), jnp.int32)
    s_slots = jnp.asarray(rng.integers(0, sph_shade.shape[0], chunk), jnp.int32)

    def gather_t(c):
        idx = (slots + c.astype(jnp.int32)) % tri_shade.shape[0]
        tg = tri_shade[idx]
        return c + (tg[:, 0] - tg[:, 0]).astype(c.dtype)[0]

    log(f"tri row-gather (262k x 16): {scan_phase(gather_t, jnp.uint32(0))*1e3:.2f} ms")

    def gather_s(c):
        idx = (s_slots + c.astype(jnp.int32)) % sph_shade.shape[0]
        sg = sph_shade[idx]
        return c + (sg[:, 0] - sg[:, 0]).astype(c.dtype)[0]

    log(f"sph row-gather (262k x 5): {scan_phase(gather_s, jnp.uint32(0))*1e3:.2f} ms")

    # hit-field math on gathered rows
    tg = jax.block_until_ready(tri_shade[slots])
    sg = jax.block_until_ready(sph_shade[s_slots])
    u = jnp.full((chunk,), 0.3)
    v = jnp.full((chunk,), 0.3)
    tt = jnp.full((chunk,), 2.0)

    def fields(c):
        o, d = rays.origin, rays.direction
        s_pos, s_nrm, s_uv = sphere_hit_fields(sg[:, 0:3], sg[:, 3], tt + c, o, d)
        t_pos, t_nrm, t_uv = triangle_hit_fields(
            tt + c, u, v, tg[:, 0:3], tg[:, 3:6], tg[:, 6:9],
            tg[:, 9:11], tg[:, 11:13], tg[:, 13:15], o, d)
        return c + (s_pos[0, 0] - s_pos[0, 0]) + (t_pos[0, 0] - t_pos[0, 0])

    log(f"hit-field math: {scan_phase(fields, jnp.float32(0))*1e3:.2f} ms")


if __name__ == "__main__":
    main()
