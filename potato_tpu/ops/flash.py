"""Flash intersector: streaming per-block closest-hit with O(1) epilogue.

Third-generation TPU replacement for the reference's recursive BVH walk
(src/bvh.rs:93-119), designed from profiling the earlier kernels on v5e:

- ops/pallas_intersect.py walks every Morton cluster per ray block with a
  per-cluster winner extraction (~10 extra VPU ops x cluster) and culls in
  Morton order (no front-to-back shrink) -> 58 ms / 256k camera rays.
- ops/grouped.py pays a per-visit winner extraction AND drains visits
  through a scalar SMEM queue at 64-ray granularity -> 46 ms.

This kernel keeps the two good ideas (XLA-built front-to-back cluster
lists, group-level early termination) and removes both per-visit costs:

1. **Queues in XLA, one list per 512-ray block.** The dense slab test of
   all rays x all cluster AABBs (tavianator slab method,
   src/utility.rs:137-155) reduces per block to a front-to-back list of
   entered clusters — fully fused VPU work, no divergence. A retired block
   (all lanes t_max < t_min) gets an empty list and costs nothing.
2. **Per-lane-column running best.** Each visit updates a (512, 128)
   column-best (t, u, v, slot) with one compare + four selects — the
   winner across columns is extracted ONCE per block, not per visit. The
   per-visit epilogue is 5 ops instead of ~15.
3. **Front-to-back early termination.** A per-ray running best t is
   maintained (one lane-reduce per visit); a visit whose entry t exceeds
   every live ray's best is skipped — the reference's t_max-shrinking
   ordered descent (src/bvh.rs:106-112) at block granularity. Because the
   list is sorted by entry t, one skip means all remaining visits skip.

The pair tests replicate ops/intersect.py bit-for-bit (same SMOL cutoff,
same root selection) and are property-tested against brute force in
tests/test_flash.py (interpret mode on CPU, compiled Mosaic on TPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from potato_tpu.core.types import BIG, SMOL, HitBatch, RayBatch
from potato_tpu.ops.grouped import (
    K,
    RAY_COLS,
    _pad_queue_rows,
    _pad_rays,
    build_grouped_accel,
    slab_test,
)
from potato_tpu.ops.intersect import sphere_hit_fields, triangle_hit_fields

R = 512        # rays per block (one grid step)
OUT_COLS = 8   # tri: t u v slot | sph: t slot | pad(2)


class FlashAccel(NamedTuple):
    """Morton-clustered primitive tables (same layout as GroupedAccel)."""

    tri_feats: jnp.ndarray    # (16, Ct*K) f32, cluster-ordered
    tri_perm: jnp.ndarray     # (Ct*K,) int32 packed slot -> original tri id
    tri_cmin: jnp.ndarray     # (Ct,3) f32 cluster AABBs
    tri_cmax: jnp.ndarray     # (Ct,3)
    sph_feats: jnp.ndarray    # (8, Cs*K) f32, cluster-ordered
    sph_perm: jnp.ndarray     # (Cs*K,) int32
    sph_cmin: jnp.ndarray     # (Cs,3)
    sph_cmax: jnp.ndarray     # (Cs,3)
    world_min: jnp.ndarray    # (3,)
    world_max: jnp.ndarray    # (3,)
    num_triangles: int
    num_spheres: int


def build_flash_accel(tables, num_spheres: int, num_triangles: int) -> FlashAccel:
    """Same host-side Morton clustering as the grouped intersector."""
    return FlashAccel(*build_grouped_accel(tables, num_spheres, num_triangles))


def build_block_queue(rays: RayBatch, cmin, cmax, block: int = R):
    """Per `block`-ray block: front-to-back list of clusters any ray enters.

    Returns (counts (NB,1) i32, ids (NB,C) i32, entry (NB,C) f32): the
    first counts[b] entries of ids[b] are cluster indices sorted by
    block-min entry t; the tail is padding (entry = BIG).
    """
    b = rays.origin.shape[0]
    nb = b // block
    c = cmin.shape[0]
    entered, lo = slab_test(rays, cmin, cmax)

    entry = jnp.min(jnp.where(entered, lo, jnp.inf).reshape(nb, block, c),
                    axis=1)                                 # (NB, C)
    counts = jnp.sum(jnp.any(entered.reshape(nb, block, c), axis=1),
                     axis=1).astype(jnp.int32)
    ids = jnp.argsort(entry, axis=1).astype(jnp.int32)      # inf sorts last
    entry_sorted = jnp.take_along_axis(entry, ids, axis=1)
    entry_sorted = jnp.where(jnp.isfinite(entry_sorted), entry_sorted, BIG)
    return counts[:, None], ids, entry_sorted


# ------------------------------------------------------------------ kernel


def _flash_kernel(tn_ref, tcodes_ref, tentry_ref, sn_ref, scodes_ref,
                  sentry_ref, rays_ref, tri_ref, sph_ref, out_ref,
                  colt, colu, colv, cols, rbest):
    """One 512-ray block: drain its tri + sphere cluster lists."""
    # SMEM blocks carry 8 queue rows per DMA (Mosaic requires the
    # second-to-last block dim to be a multiple of 8; a (1, L) block on a
    # (NB, L) array does not lower — the round-1 bench regression).
    row = pl.program_id(0) % 8
    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    dx = rays_ref[:, 3:4]
    dy = rays_ref[:, 4:5]
    dz = rays_ref[:, 5:6]
    mx = rays_ref[:, 6:7]
    my = rays_ref[:, 7:8]
    mz = rays_ref[:, 8:9]
    t_min = rays_ref[:, 9:10]
    t_max = rays_ref[:, 10:11]

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)
    lane_f = lane.astype(jnp.float32)

    # ---------------- triangle phase ----------------
    colt[:] = jnp.full((R, K), BIG, jnp.float32)
    colu[:] = jnp.zeros((R, K), jnp.float32)
    colv[:] = jnp.zeros((R, K), jnp.float32)
    cols[:] = jnp.zeros((R, K), jnp.float32)
    rbest[:] = jnp.full((R, 1), BIG, jnp.float32)

    def tri_body(j, _):
        # early termination: skip once every live lane's best hit precedes
        # this cluster's entry (list is front-to-back sorted)
        far = jnp.max(jnp.minimum(rbest[:], t_max))

        @pl.when(tentry_ref[row, j] < far)
        def _():
            ci = tcodes_ref[row, j]
            sl = pl.ds(pl.multiple_of(ci * K, K), K)
            nx = tri_ref[0:1, sl]
            ny = tri_ref[1:2, sl]
            nz = tri_ref[2:3, sl]
            a1x = tri_ref[3:4, sl]
            a1y = tri_ref[4:5, sl]
            a1z = tri_ref[5:6, sl]
            cax = tri_ref[6:7, sl]
            cay = tri_ref[7:8, sl]
            caz = tri_ref[8:9, sl]
            a2x = tri_ref[9:10, sl]
            a2y = tri_ref[10:11, sl]
            a2z = tri_ref[11:12, sl]
            bax = tri_ref[12:13, sl]
            bay = tri_ref[13:14, sl]
            baz = tri_ref[14:15, sl]
            s_t = tri_ref[15:16, sl]

            # Cramer's-rule Moller-Trumbore on the moment form (m = d x o);
            # identical math to ops/intersect.py
            det = dx * nx + dy * ny + dz * nz                 # (R, K)
            o_n = ox * nx + oy * ny + oz * nz
            u_num = (dx * a1x + dy * a1y + dz * a1z
                     - (mx * cax + my * cay + mz * caz))
            v_num = (dx * a2x + dy * a2y + dz * a2z
                     + (mx * bax + my * bay + mz * baz))
            t_num = s_t - o_n

            det_ok = jnp.abs(det) >= SMOL
            inv_det = jnp.where(det_ok, 1.0, 0.0) / jnp.where(det_ok, det, 1.0)
            tt = t_num * inv_det
            tu = u_num * inv_det
            tv = v_num * inv_det
            valid = (det_ok & (tt >= t_min) & (tt <= t_max)
                     & (tu >= 0.0) & (tv >= 0.0) & (tu + tv <= 1.0))
            key = jnp.where(valid, tt, BIG)

            improve = key < colt[:]
            colt[:] = jnp.where(improve, key, colt[:])
            colu[:] = jnp.where(improve, tu, colu[:])
            colv[:] = jnp.where(improve, tv, colv[:])
            cols[:] = jnp.where(improve, ci * K + lane_f, cols[:])
            rbest[:] = jnp.minimum(rbest[:],
                                   jnp.min(key, axis=1, keepdims=True))

        return 0

    jax.lax.fori_loop(0, tn_ref[row, 0], tri_body, 0)

    # one winner extraction per block (not per visit): rbest is the min of
    # colt's columns; pick the lowest winning lane, payload via masked sums
    tri_t = rbest[:]
    at_min = colt[:] == tri_t
    win = jnp.min(jnp.where(at_min, lane, jnp.int32(1 << 30)),
                  axis=1, keepdims=True)
    mask = at_min & (lane == win)
    out_ref[:, 0:1] = tri_t
    out_ref[:, 1:2] = jnp.sum(jnp.where(mask, colu[:], 0.0), axis=1,
                              keepdims=True)
    out_ref[:, 2:3] = jnp.sum(jnp.where(mask, colv[:], 0.0), axis=1,
                              keepdims=True)
    out_ref[:, 3:4] = jnp.sum(jnp.where(mask, cols[:], 0.0), axis=1,
                              keepdims=True)
    out_ref[:, 6:8] = jnp.zeros((R, 2), jnp.float32)

    # ---------------- sphere phase ----------------
    colt[:] = jnp.full((R, K), BIG, jnp.float32)
    cols[:] = jnp.zeros((R, K), jnp.float32)
    rbest[:] = jnp.full((R, 1), BIG, jnp.float32)

    def sph_body(j, _):
        # a sphere cluster is also dead once the TRIANGLE hit is closer
        far = jnp.max(jnp.minimum(jnp.minimum(rbest[:], tri_t), t_max))

        @pl.when(sentry_ref[row, j] < far)
        def _():
            ci = scodes_ref[row, j]
            sl = pl.ds(pl.multiple_of(ci * K, K), K)
            cx = sph_ref[0:1, sl]
            cy = sph_ref[1:2, sl]
            cz = sph_ref[2:3, sl]
            cc = sph_ref[3:4, sl]
            ok_lane = sph_ref[4:5, sl]

            # half-b quadratic, two-root select (src/hittable.rs:39-63)
            a_coef = dx * dx + dy * dy + dz * dz
            inv_a = 1.0 / a_coef
            o2 = ox * ox + oy * oy + oz * oz
            d_o = dx * ox + dy * oy + dz * oz
            half_b = d_o - (dx * cx + dy * cy + dz * cz)
            c_coef = o2 - 2.0 * (ox * cx + oy * cy + oz * cz) + cc
            delta = half_b * half_b - a_coef * c_coef
            sph_ok = (delta > 0.0) & (ok_lane > 0.5)
            sqrt_delta = jnp.sqrt(jnp.where(sph_ok, delta, 1.0))
            tt0 = (-half_b - sqrt_delta) * inv_a
            tt1 = (-half_b + sqrt_delta) * inv_a
            t0_ok = (tt0 >= t_min) & (tt0 <= t_max)
            t1_ok = (tt1 >= t_min) & (tt1 <= t_max)
            st = jnp.where(t0_ok, tt0, tt1)
            valid = sph_ok & (t0_ok | t1_ok)
            key = jnp.where(valid, st, BIG)

            improve = key < colt[:]
            colt[:] = jnp.where(improve, key, colt[:])
            cols[:] = jnp.where(improve, ci * K + lane_f, cols[:])
            rbest[:] = jnp.minimum(rbest[:],
                                   jnp.min(key, axis=1, keepdims=True))

        return 0

    jax.lax.fori_loop(0, sn_ref[row, 0], sph_body, 0)

    sph_t = rbest[:]
    at_min = colt[:] == sph_t
    win = jnp.min(jnp.where(at_min, lane, jnp.int32(1 << 30)),
                  axis=1, keepdims=True)
    mask = at_min & (lane == win)
    out_ref[:, 4:5] = sph_t
    out_ref[:, 5:6] = jnp.sum(jnp.where(mask, cols[:], 0.0), axis=1,
                              keepdims=True)


def intersect_flash(accel: FlashAccel, tables, rays: RayBatch,
                    interpret: bool = False) -> HitBatch:
    """Closest hit over all scene primitives via the flash kernel."""
    padded, b = _pad_rays(rays, R)
    bp = padded.origin.shape[0]
    nb = bp // R

    o = padded.origin
    d = padded.direction
    m = jnp.cross(d, o)
    packed = jnp.concatenate([
        o, d, m, padded.t_min[:, None], padded.t_max[:, None],
        jnp.zeros((bp, RAY_COLS - 11), jnp.float32)], axis=1)

    tn, tcodes, tentry = build_block_queue(padded, accel.tri_cmin,
                                           accel.tri_cmax)
    sn, scodes, sentry = build_block_queue(padded, accel.sph_cmin,
                                           accel.sph_cmax)
    tn, tcodes, tentry = _pad_queue_rows([tn, tcodes, tentry], nb)
    sn, scodes, sentry = _pad_queue_rows([sn, scodes, sentry], nb)

    def smem(arr):
        # 8 queue rows per SMEM block (Mosaic 8-sublane divisibility rule);
        # the kernel picks its row via program_id % 8.
        return pl.BlockSpec((8, arr.shape[1]), lambda i: (i // 8, 0),
                            memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        _flash_kernel,
        grid=(nb,),
        in_specs=[smem(tn), smem(tcodes), smem(tentry),
                  smem(sn), smem(scodes), smem(sentry),
                  pl.BlockSpec((R, RAY_COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, OUT_COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, OUT_COLS), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, K), jnp.float32),
                        pltpu.VMEM((R, K), jnp.float32),
                        pltpu.VMEM((R, K), jnp.float32),
                        pltpu.VMEM((R, K), jnp.float32),
                        pltpu.VMEM((R, 1), jnp.float32)],
        interpret=interpret,
    )(tn, tcodes, tentry, sn, scodes, sentry, packed,
      accel.tri_feats, accel.sph_feats)
    out = jax.lax.stop_gradient(out[:b])

    # ---- packed shade tables (built from `tables` inside the trace so
    # gradients flow to vertex attributes / material ids' gathers) ----
    tp = accel.tri_perm
    tri_shade = jnp.concatenate([
        tables.tri_na[tp], tables.tri_nb[tp], tables.tri_nc[tp],
        tables.tri_ua[tp], tables.tri_ub[tp], tables.tri_uc[tp],
        tables.tri_material[tp][:, None].astype(jnp.float32)], axis=1)
    sp = accel.sph_perm
    sph_shade = jnp.concatenate([
        tables.s_center[sp], tables.s_radius[sp][:, None],
        tables.s_material[sp][:, None].astype(jnp.float32)], axis=1)

    tr_t = out[:, 0]
    tr_u = out[:, 1]
    tr_v = out[:, 2]
    tr_slot = jnp.clip(out[:, 3].astype(jnp.int32), 0, tp.shape[0] - 1)
    tr_hit = tr_t < BIG
    s_t = out[:, 4]
    s_hit = s_t < BIG
    s_slot = jnp.clip(out[:, 5].astype(jnp.int32), 0, sp.shape[0] - 1)

    tg = tri_shade[tr_slot]   # ONE row gather per type instead of ~7
    sg = sph_shade[s_slot]

    o = rays.origin
    d = rays.direction
    sphere_wins = s_hit & (~tr_hit | (s_t <= tr_t))
    s_t_safe = jnp.where(s_hit, s_t, 1.0)
    tr_t_safe = jnp.where(tr_hit, tr_t, 1.0)

    s_pos, s_nrm, s_uv = sphere_hit_fields(sg[:, 0:3], sg[:, 3], s_t_safe, o, d)
    t_pos, t_nrm, t_uv = triangle_hit_fields(
        tr_t_safe, tr_u, tr_v,
        tg[:, 0:3], tg[:, 3:6], tg[:, 6:9],
        tg[:, 9:11], tg[:, 11:13], tg[:, 13:15],
        o, d)

    sw3 = sphere_wins[:, None]
    material = jnp.where(sphere_wins, sg[:, 4], tg[:, 15]).astype(jnp.int32)
    return HitBatch(
        t=jnp.where(sphere_wins, s_t, tr_t),
        position=jnp.where(sw3, s_pos, t_pos),
        normal=jnp.where(sw3, s_nrm, t_nrm),
        uv=jnp.where(sw3, s_uv, t_uv),
        material=material,
        valid=s_hit | tr_hit,
    )
