"""Measure cluster-visit statistics at candidate granularities (CPU, numpy).

Decides the flash2 kernel design: for ray-block sizes RS in {128, 256, 512}
and sub-cluster widths W in {16, 32, 64, 128}, computes how many W-wide
sub-clusters a block of RS consecutive (tile-swizzled) rays enters, for
bunny camera rays and for bounce-1 rays. Pair tests per ray = W x entered;
packed 128-lane visits per block = ceil(entered * W / 128) under perfect
front-to-back packing.

Run: JAX_PLATFORMS=cpu python tools/stats_clusters.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
for k in list(os.environ):
    if k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "PJRT_")):
        os.environ.pop(k)

import numpy as np


def hier_split(pmin, pmax, leaf):
    """Recursive longest-axis median split to exact `leaf`-size chunks.
    Returns the permutation (hierarchical order)."""
    n = pmin.shape[0]
    centroid = 0.5 * (pmin + pmax)
    chunks = []

    def split(idx, nc):
        if nc == 1:
            chunks.append(idx)
            return
        cen = centroid[idx]
        axis = int(np.argmax(cen.max(axis=0) - cen.min(axis=0)))
        left_c = nc // 2
        k = left_c * leaf
        part = np.argpartition(cen[:, axis], k)
        split(idx[part[:k]], left_c)
        split(idx[part[k:]], nc - left_c)

    split(np.arange(n, dtype=np.int64), max((n + leaf - 1) // leaf, 1))
    return np.concatenate(chunks)


def cluster_aabbs(pmin, pmax, order, w):
    n = order.shape[0]
    c = (n + w - 1) // w
    pad = c * w - n
    bmin = np.concatenate([pmin[order], np.full((pad, 3), np.inf)])
    bmax = np.concatenate([pmax[order], np.full((pad, 3), -np.inf)])
    return bmin.reshape(c, w, 3).min(1), bmax.reshape(c, w, 3).max(1)


def slab_entered(o, d, tmin, tmax, cmin, cmax):
    """(B,) rays x (C,) boxes -> (B, C) entered bool."""
    lo = np.broadcast_to(tmin[:, None], (o.shape[0], cmin.shape[0])).copy()
    hi = np.broadcast_to(tmax[:, None], lo.shape).copy()
    for a in range(3):
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / d[:, a]
            t0 = (cmin[None, :, a] - o[:, a, None]) * inv[:, None]
            t1 = (cmax[None, :, a] - o[:, a, None]) * inv[:, None]
        near = np.fmin(t0, t1)   # fmin/fmax ignore NaN (reference semantics)
        far = np.fmax(t0, t1)
        lo = np.fmax(lo, near)
        hi = np.fmin(hi, far)
    return hi >= lo


def main():
    import jax
    import jax.numpy as jnp

    from potato_tpu.render.camera import generate_rays
    from potato_tpu.render.renderer import tile_swizzle_ids
    from potato_tpu.scene import examples
    from potato_tpu.ops.intersect import intersect_brute_force
    from potato_tpu.ops.material import eval_material
    from potato_tpu.core import rng as prng

    width, height, spp = 800, 600, 4
    scene = examples.bunny().build(accel="none")
    tables = scene.tables

    T = scene.num_triangles
    pa = np.asarray(tables.tri_pa, np.float64)[:T]
    pb = np.asarray(tables.tri_pb, np.float64)[:T]
    pc = np.asarray(tables.tri_pc, np.float64)[:T]
    tri_min = np.minimum(np.minimum(pa, pb), pc)
    tri_max = np.maximum(np.maximum(pa, pb), pc)

    # hierarchical order at the finest granularity; coarser widths reuse it
    order16 = hier_split(tri_min, tri_max, 16)

    # --- rays: a representative sample of swizzled chunks ---
    total = width * height * spp
    rng = np.random.default_rng(0)
    # sample 24 chunk starts of 2^15 rays across the frame
    starts = np.sort(rng.choice(total // (1 << 15), 6, replace=False)) << 15
    ids = np.concatenate([np.arange(s, s + (1 << 15)) for s in starts])
    ids = np.asarray(tile_swizzle_ids(jnp.asarray(ids % total, jnp.uint32),
                                      width, spp))
    seed = jnp.asarray(0, jnp.uint32)
    rays = generate_rays(scene.camera, width, height, spp,
                         jnp.asarray(ids, jnp.uint32), seed)
    o = np.asarray(rays.origin, np.float32)
    d = np.asarray(rays.direction, np.float32)
    tmin = np.asarray(rays.t_min, np.float32)
    tmax = np.asarray(rays.t_max, np.float32)

    # --- bounce-1 rays from the real integrator step (brute intersect) ---
    B = o.shape[0]
    bif = jax.jit(intersect_brute_force)
    parts = [bif(tables, jax.tree_util.tree_map(lambda a: a[i:i + 32768], rays))
             for i in range(0, B, 32768)]
    hit = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *parts)
    u1, u2 = prng.uniform2(seed, prng.bounce_salt(0, prng.STREAM_SCATTER_A),
                           jnp.asarray(ids, jnp.uint32))
    u3, u4 = prng.uniform2(seed, prng.bounce_salt(0, prng.STREAM_SCATTER_B),
                           jnp.asarray(ids, jnp.uint32))
    v1 = hit.valid
    hitc = hit._replace(
        position=jnp.where(v1[..., None], hit.position, 0.0),
        normal=jnp.where(v1[..., None], hit.normal,
                         jnp.asarray([0.0, 0.0, 1.0])),
        uv=jnp.where(v1[..., None], hit.uv, 0.0),
        t=jnp.where(v1, hit.t, 1.0))
    mat = eval_material(tables, hitc.material, rays.direction, hitc,
                        u1, u2, u3, u4, features=scene.features)
    active = np.asarray(v1 & mat.scatter.valid)
    o2 = np.asarray(jnp.where(active[:, None], hitc.position, 0.0), np.float32)
    d2 = np.asarray(mat.scatter.direction, np.float32)
    tmin2 = np.full(B, 1e-3, np.float32)
    tmax2 = np.where(active, 3e38, -1.0).astype(np.float32)

    print(f"camera rays: {B}, bounce-1 live: {active.mean():.3f}")

    for label, (oo, dd, t0_, t1_) in [
            ("camera", (o, d, tmin, tmax)),
            ("bounce1", (o2, d2, tmin2, tmax2))]:
        print(f"\n=== {label} rays ===")
        print(f"{'W':>4} {'RS':>4} {'C':>5} {'ent/blk':>8} {'pair/ray':>9} "
              f"{'packed(4W/128)':>14} {'max_ent':>8} {'max_packed':>10}")
        for w in (16, 32, 64, 128):
            cmin, cmax = cluster_aabbs(tri_min, tri_max, order16, w)
            ent = slab_entered(oo, dd, t0_, t1_, cmin, cmax)  # (B, C)
            for rs in (128, 256, 512):
                nb = B // rs
                blk = ent.reshape(nb, rs, -1).any(axis=1)   # (NB, C)
                cnt = blk.sum(axis=1)
                pair = cnt.mean() * w * 512 / rs  # per 512 rays, /512... per ray:
                pair_per_ray = cnt.mean() * w / rs * 1.0
                packed = np.ceil(cnt * w / 128).astype(int)
                print(f"{w:>4} {rs:>4} {cmin.shape[0]:>5} {cnt.mean():>8.2f} "
                      f"{cnt.mean() * w:>9.1f} "
                      f"{packed.mean():>14.2f} {cnt.max():>8} {packed.max():>10}")


if __name__ == "__main__":
    main()
