"""Grouped-traversal intersector: XLA cluster selection + Pallas pair kernels.

The TPU-shaped replacement for the reference's per-ray recursive BVH walk
(src/bvh.rs:93-119). Pointer-chasing traversal is hostile to a vector
machine, so the walk is split into two phases, each on the unit that is
good at it:

1. **Cluster selection (XLA, dense)** — primitives are Morton-ordered and
   cut into clusters of 128 (LBVH leaves). Every ray slab-tests every
   cluster AABB as one dense, fully-fused VPU computation; rays are then
   grouped 64-wide and each group reduces to a front-to-back list of
   clusters any of its rays enters. This *is* the traversal — computed for
   all rays at once with zero divergence, instead of per-ray node visits.
2. **Pair testing (Pallas)** — a kernel walks each group's cluster list
   (dynamic `fori`/`while` trip count — skipped clusters cost nothing) and
   intersects the group's 64 rays against the cluster's 128 primitives as
   one (64, 128) VPU tile, keeping the per-ray closest hit in registers.
   The walk stops early once every ray's best hit is closer than the next
   cluster's entry t — the reference's t_max-shrinking ordered descent
   (src/bvh.rs:106-112) at group granularity.

Ray coherence (live-first + origin-Morton + direction-octant sorting,
render/renderer.py) keeps each group's cluster-list union close to a single
ray's list, and packs retired lanes into groups whose list is empty.

The pair tests replicate ops/intersect.py's math bit-for-bit (same SMOL
cutoff, same root selection) and are property-tested against brute force in
tests/test_grouped.py (interpret mode on CPU, compiled Mosaic on TPU).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from potato_tpu.core.types import BIG, SMOL, HitBatch, RayBatch
from potato_tpu.ops.intersect import sphere_hit_fields, triangle_hit_fields

GROUP = 64            # rays per culling group (sublane-dim multiple of 8)
GROUPS_PER_STEP = 16  # groups per grid step (amortizes per-step overhead)
BLOCK = GROUP * GROUPS_PER_STEP
K = 128               # primitives per cluster (one lane tile)
TRI_FEATURES = 16     # n(3) a_x_ca(3) ca(3) ba_x_a(3) ba(3) a.n(1)
SPH_FEATURES = 8      # c(3) |c|^2-r^2(1) valid(1)


class GroupedAccel(NamedTuple):
    """Morton-clustered primitive tables + cluster AABBs (device arrays)."""

    tri_feats: jnp.ndarray    # (TRI_FEATURES, Ct*K) f32, cluster-ordered
    tri_perm: jnp.ndarray     # (Ct*K,) int32 packed slot -> original tri id
    tri_cmin: jnp.ndarray     # (Ct,3) f32 cluster AABBs
    tri_cmax: jnp.ndarray     # (Ct,3)
    sph_feats: jnp.ndarray    # (SPH_FEATURES, Cs*K) f32, cluster-ordered
    sph_perm: jnp.ndarray     # (Cs*K,) int32
    sph_cmin: jnp.ndarray     # (Cs,3)
    sph_cmax: jnp.ndarray     # (Cs,3)
    world_min: jnp.ndarray    # (3,) f32 scene bounds (ray-sort quantization)
    world_max: jnp.ndarray    # (3,)
    num_triangles: int
    num_spheres: int


def _morton_cluster(pmin: np.ndarray, pmax: np.ndarray):
    """Order primitives by centroid Morton code; return (order, cmin, cmax)."""
    from potato_tpu.scene.bvh import morton_codes

    n = pmin.shape[0]
    centroid = (0.5 * (pmin + pmax)).astype(np.float32)
    order = np.argsort(morton_codes(centroid, centroid.min(0), centroid.max(0)),
                       kind="stable").astype(np.int32)
    c = max((n + K - 1) // K, 1)
    pad = c * K - n
    bmin = np.concatenate([pmin[order], np.full((pad, 3), np.inf, np.float32)])
    bmax = np.concatenate([pmax[order], np.full((pad, 3), -np.inf, np.float32)])
    cmin = np.nan_to_num(bmin.reshape(c, K, 3).min(axis=1), posinf=3e38)
    cmax = np.nan_to_num(bmax.reshape(c, K, 3).max(axis=1), neginf=-3e38)
    return order, pad, cmin.astype(np.float32), cmax.astype(np.float32)


def build_grouped_accel(tables, num_spheres: int, num_triangles: int) -> GroupedAccel:
    """Host-side (cold path) build, vectorized numpy — the LBVH analogue of
    the reference's main-thread Bvh::new (src/bvh.rs:70-91)."""
    # --- triangles ---
    T = num_triangles
    pa = np.asarray(tables.tri_pa, np.float64)[:T].reshape(-1, 3)
    pb = np.asarray(tables.tri_pb, np.float64)[:T].reshape(-1, 3)
    pc = np.asarray(tables.tri_pc, np.float64)[:T].reshape(-1, 3)
    if T == 0:  # degenerate placeholder (never hit: n = 0 -> det 0)
        pa = pb = pc = np.zeros((1, 3))
        T = 1
    tri_min = np.minimum(np.minimum(pa, pb), pc).astype(np.float32)
    tri_max = np.maximum(np.maximum(pa, pb), pc).astype(np.float32)
    order, pad, tri_cmin, tri_cmax = _morton_cluster(tri_min, tri_max)
    tri_perm = np.concatenate([order, np.zeros(pad, np.int32)])

    tp = tri_perm.shape[0]
    tf = np.zeros((TRI_FEATURES, tp), np.float64)
    pa_o, pb_o, pc_o = pa[order], pb[order], pc[order]
    ba = pa_o - pb_o
    ca = pa_o - pc_o
    n = np.cross(ba, ca)
    tf[0:3, :T] = n.T
    tf[3:6, :T] = np.cross(pa_o, ca).T
    tf[6:9, :T] = ca.T
    tf[9:12, :T] = np.cross(ba, pa_o).T
    tf[12:15, :T] = ba.T
    tf[15, :T] = np.einsum("td,td->t", pa_o, n)
    # padding slots keep n = 0 -> det 0 -> never valid

    # --- spheres ---
    S = num_spheres
    c = np.asarray(tables.s_center, np.float64)[:S].reshape(-1, 3)
    r = np.asarray(tables.s_radius, np.float64)[:S].reshape(-1)
    if S == 0:
        c = np.zeros((1, 3))
        r = np.zeros((1,))
        S = 1
    r3 = np.abs(r)[:, None].astype(np.float32)
    sorder, spad, sph_cmin, sph_cmax = _morton_cluster(
        c.astype(np.float32) - r3, c.astype(np.float32) + r3)
    sph_perm = np.concatenate([sorder, np.zeros(spad, np.int32)])
    sp = sph_perm.shape[0]
    sf = np.zeros((SPH_FEATURES, sp), np.float64)
    c_o, r_o = c[sorder], r[sorder]
    sf[0:3, :S] = c_o.T
    sf[3, :S] = np.einsum("sd,sd->s", c_o, c_o) - r_o * r_o
    sf[4, :S] = 1.0  # validity lane (pad spheres invalid)

    wmin = np.minimum(tri_cmin.min(0), sph_cmin.min(0))
    wmax = np.maximum(tri_cmax.max(0), sph_cmax.max(0))

    return GroupedAccel(
        tri_feats=jnp.asarray(tf, jnp.float32),
        tri_perm=jnp.asarray(tri_perm),
        tri_cmin=jnp.asarray(tri_cmin), tri_cmax=jnp.asarray(tri_cmax),
        sph_feats=jnp.asarray(sf, jnp.float32),
        sph_perm=jnp.asarray(sph_perm),
        sph_cmin=jnp.asarray(sph_cmin), sph_cmax=jnp.asarray(sph_cmax),
        world_min=jnp.asarray(np.nan_to_num(wmin, posinf=0.0), jnp.float32),
        world_max=jnp.asarray(np.nan_to_num(wmax, neginf=1.0), jnp.float32),
        num_triangles=num_triangles, num_spheres=num_spheres,
    )


# ------------------------------------------------------- cluster selection


def select_clusters(rays: RayBatch, cmin, cmax):
    """Per 64-ray group: front-to-back list of clusters any ray enters.

    Dense slab test of every ray against every cluster AABB (the
    tavianator slab method of src/utility.rs:137-155, vectorized over the
    full (rays x clusters) grid), reduced over each group of 64 rays.
    Returns (counts (G,1) i32, ids (G,C) i32, entry (G,C) f32) where
    ids[:, :counts] are cluster indices sorted by group-min entry t.
    """
    b = rays.origin.shape[0]
    g = b // GROUP
    c = cmin.shape[0]

    # Unroll the 3 axes so every intermediate is a lane-friendly (B, C)
    # tile: per-ray scalars broadcast down sublanes, per-cluster bounds
    # across lanes. (A (B, C, 3) formulation puts the reduction on a
    # 3-wide lane dim — catastrophic layout on TPU.)
    lo = jnp.broadcast_to(rays.t_min[:, None], (b, c))
    hi = jnp.broadcast_to(rays.t_max[:, None], (b, c))
    for a in range(3):
        inv_d = (1.0 / rays.direction[:, a])[:, None]      # (B, 1)
        oa = rays.origin[:, a][:, None]
        t0 = (cmin[None, :, a] - oa) * inv_d               # (B, C)
        t1 = (cmax[None, :, a] - oa) * inv_d
        lo = jnp.maximum(lo, jnp.minimum(t0, t1))
        hi = jnp.minimum(hi, jnp.maximum(t0, t1))
    entered = hi >= lo

    # group reduce over the 64-sublane ray axis
    entry = jnp.min(jnp.where(entered, lo, jnp.inf).reshape(g, GROUP, c),
                    axis=1)                                 # (G, C)
    counts = jnp.sum(jnp.any(entered.reshape(g, GROUP, c), axis=1),
                     axis=1).astype(jnp.int32)
    ids = jnp.argsort(entry, axis=1).astype(jnp.int32)      # inf sorts last
    entry_sorted = jnp.take_along_axis(entry, ids, axis=1)
    # keep SMEM payloads finite
    entry_sorted = jnp.where(jnp.isfinite(entry_sorted), entry_sorted, BIG)
    return counts[:, None], ids, entry_sorted


# ------------------------------------------------------------------ kernels


def _tri_kernel(counts_ref, ids_ref, entry_ref, o_ref, d_ref, m_ref,
                tmin_ref, tmax_ref, feats_ref, out_ref):
    """Per 64-ray group: walk its entered-cluster list front-to-back,
    intersecting 128 triangles per visit as one (64, 128) tile."""
    for g in range(GROUPS_PER_STEP):
        r0 = g * GROUP
        ox = o_ref[r0:r0 + GROUP, 0:1]
        oy = o_ref[r0:r0 + GROUP, 1:2]
        oz = o_ref[r0:r0 + GROUP, 2:3]
        dx = d_ref[r0:r0 + GROUP, 0:1]
        dy = d_ref[r0:r0 + GROUP, 1:2]
        dz = d_ref[r0:r0 + GROUP, 2:3]
        mx = m_ref[r0:r0 + GROUP, 0:1]
        my = m_ref[r0:r0 + GROUP, 1:2]
        mz = m_ref[r0:r0 + GROUP, 2:3]
        t_min = tmin_ref[r0:r0 + GROUP, 0:1]
        t_max = tmax_ref[r0:r0 + GROUP, 0:1]

        n_visit = counts_ref[g, 0]
        zero = jnp.zeros((GROUP, 1), jnp.float32)
        init = (jnp.int32(0), jnp.full((GROUP, 1), BIG, jnp.float32),
                zero, zero, zero, jnp.float32(BIG))

        def cond(carry, _g=g):
            j, best_t, _u, _v, _s, far = carry
            # stop once every ray's best hit is nearer than the next
            # cluster's entry t (ordered-descent early out, bvh.rs:106-112)
            return (j < n_visit) & (entry_ref[_g, j] < far)

        def body(carry, _g=g):
            j, best_t, best_u, best_v, best_slot, _far = carry
            ci = ids_ref[_g, j]
            sl = pl.ds(pl.multiple_of(ci * K, K), K)
            nx = feats_ref[0:1, sl]
            ny = feats_ref[1:2, sl]
            nz = feats_ref[2:3, sl]
            a1x = feats_ref[3:4, sl]
            a1y = feats_ref[4:5, sl]
            a1z = feats_ref[5:6, sl]
            cax = feats_ref[6:7, sl]
            cay = feats_ref[7:8, sl]
            caz = feats_ref[8:9, sl]
            a2x = feats_ref[9:10, sl]
            a2y = feats_ref[10:11, sl]
            a2z = feats_ref[11:12, sl]
            bax = feats_ref[12:13, sl]
            bay = feats_ref[13:14, sl]
            baz = feats_ref[14:15, sl]
            s_t = feats_ref[15:16, sl]

            # Cramer's-rule Moller-Trumbore on the moment form
            # (m = d x o): identical math to ops/intersect.py
            det = dx * nx + dy * ny + dz * nz                    # (64, 128)
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

            # branchless per-row winner: unique min-mask + sum-extractions
            # (Mosaic has no per-lane gather)
            cand_t = jnp.min(key, axis=1, keepdims=True)          # (64, 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
            at_min = key == cand_t
            win_lane = jnp.min(jnp.where(at_min, lane, jnp.int32(1 << 30)),
                               axis=1, keepdims=True)
            mask = at_min & (lane == win_lane)
            cand_u = jnp.sum(jnp.where(mask, tu, 0.0), axis=1, keepdims=True)
            cand_v = jnp.sum(jnp.where(mask, tv, 0.0), axis=1, keepdims=True)

            improve = cand_t < best_t
            best_t = jnp.where(improve, cand_t, best_t)
            best_u = jnp.where(improve, cand_u, best_u)
            best_v = jnp.where(improve, cand_v, best_v)
            slot = (ci * K + win_lane).astype(jnp.float32)
            best_slot = jnp.where(improve, slot, best_slot)
            return (j + 1, best_t, best_u, best_v, best_slot,
                    jnp.max(best_t))

        _, best_t, best_u, best_v, best_slot, _ = jax.lax.while_loop(
            cond, body, init)
        out_ref[r0:r0 + GROUP, 0:1] = best_t
        out_ref[r0:r0 + GROUP, 1:2] = best_u
        out_ref[r0:r0 + GROUP, 2:3] = best_v
        out_ref[r0:r0 + GROUP, 3:4] = best_slot


def _sph_kernel(counts_ref, ids_ref, entry_ref, o_ref, d_ref,
                tmin_ref, tmax_ref, feats_ref, out_ref):
    """Sphere analogue of _tri_kernel (half-b quadratic, two-root select —
    reference src/hittable.rs:39-63)."""
    for g in range(GROUPS_PER_STEP):
        r0 = g * GROUP
        ox = o_ref[r0:r0 + GROUP, 0:1]
        oy = o_ref[r0:r0 + GROUP, 1:2]
        oz = o_ref[r0:r0 + GROUP, 2:3]
        dx = d_ref[r0:r0 + GROUP, 0:1]
        dy = d_ref[r0:r0 + GROUP, 1:2]
        dz = d_ref[r0:r0 + GROUP, 2:3]
        t_min = tmin_ref[r0:r0 + GROUP, 0:1]
        t_max = tmax_ref[r0:r0 + GROUP, 0:1]

        a_coef = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a_coef
        o2 = ox * ox + oy * oy + oz * oz
        d_o = dx * ox + dy * oy + dz * oz

        n_visit = counts_ref[g, 0]
        init = (jnp.int32(0), jnp.full((GROUP, 1), BIG, jnp.float32),
                jnp.zeros((GROUP, 1), jnp.float32), jnp.float32(BIG))

        def cond(carry, _g=g):
            j, _t, _i, far = carry
            return (j < n_visit) & (entry_ref[_g, j] < far)

        def body(carry, _g=g):
            j, best_t, best_idx, _far = carry
            ci = ids_ref[_g, j]
            sl = pl.ds(pl.multiple_of(ci * K, K), K)
            cx = feats_ref[0:1, sl]
            cy = feats_ref[1:2, sl]
            cz = feats_ref[2:3, sl]
            cc = feats_ref[3:4, sl]
            ok_lane = feats_ref[4:5, sl]

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

            cand = jnp.min(key, axis=1, keepdims=True)
            lane = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
            at_min = key == cand
            win_lane = jnp.min(jnp.where(at_min, lane, jnp.int32(1 << 30)),
                               axis=1, keepdims=True)
            improve = cand < best_t
            best_t = jnp.where(improve, cand, best_t)
            best_idx = jnp.where(
                improve, (ci * K + win_lane).astype(jnp.float32), best_idx)
            return j + 1, best_t, best_idx, jnp.max(best_t)

        _, best_t, best_idx, _ = jax.lax.while_loop(cond, body, init)
        out_ref[r0:r0 + GROUP, 0:1] = best_t
        out_ref[r0:r0 + GROUP, 1:2] = best_idx


def _pad_rays(rays: RayBatch, block: int):
    b = rays.origin.shape[0]
    bp = ((b + block - 1) // block) * block
    if bp == b:
        return rays, b
    pad = bp - b

    def padf(a, fill):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])

    return RayBatch(
        origin=padf(rays.origin, 0.0),
        direction=padf(rays.direction, 1.0),
        t_min=padf(rays.t_min, 0.0),
        t_max=padf(rays.t_max, -1.0),  # t_max < t_min: pad rays hit nothing
    ), b


def intersect_grouped(accel: GroupedAccel, tables, rays: RayBatch,
                      interpret: bool = False) -> HitBatch:
    """Closest hit over all scene primitives via the grouped kernels."""
    padded, b = _pad_rays(rays, BLOCK)
    bp = padded.origin.shape[0]
    grid = (bp // BLOCK,)

    o = padded.origin
    d = padded.direction
    m = jnp.cross(d, o)
    tmin = padded.t_min[:, None]
    tmax = padded.t_max[:, None]

    ray_spec = pl.BlockSpec((BLOCK, 3), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((BLOCK, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def smem(width):
        return pl.BlockSpec((GROUPS_PER_STEP, width), lambda i: (i, 0),
                            memory_space=pltpu.SMEM)

    # --- triangles ---
    t_counts, t_ids, t_entry = select_clusters(padded, accel.tri_cmin,
                                               accel.tri_cmax)
    ct = accel.tri_cmin.shape[0]
    tri_out = pl.pallas_call(
        _tri_kernel,
        grid=grid,
        in_specs=[smem(1), smem(ct), smem(ct), ray_spec, ray_spec, ray_spec,
                  scalar_spec, scalar_spec, table_spec],
        out_specs=pl.BlockSpec((BLOCK, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 4), jnp.float32),
        interpret=interpret,
    )(t_counts, t_ids, t_entry, o, d, m, tmin, tmax, accel.tri_feats)
    tri_out = jax.lax.stop_gradient(tri_out)

    # --- spheres ---
    s_counts, s_ids, s_entry = select_clusters(padded, accel.sph_cmin,
                                               accel.sph_cmax)
    cs = accel.sph_cmin.shape[0]
    sph_out = pl.pallas_call(
        _sph_kernel,
        grid=grid,
        in_specs=[smem(1), smem(cs), smem(cs), ray_spec, ray_spec,
                  scalar_spec, scalar_spec, table_spec],
        out_specs=pl.BlockSpec((BLOCK, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 2), jnp.float32),
        interpret=interpret,
    )(s_counts, s_ids, s_entry, o, d, tmin, tmax, accel.sph_feats)
    sph_out = jax.lax.stop_gradient(sph_out)

    # ---- combine + assemble hit fields (XLA; per-ray only) ----
    tr_t = tri_out[:b, 0]
    tr_u = tri_out[:b, 1]
    tr_v = tri_out[:b, 2]
    tr_slot = tri_out[:b, 3].astype(jnp.int32)
    tr_hit = tr_t < BIG
    t_best = accel.tri_perm[jnp.clip(tr_slot, 0, accel.tri_perm.shape[0] - 1)]

    s_t = sph_out[:b, 0]
    s_hit = s_t < BIG
    s_slot = jnp.clip(sph_out[:b, 1].astype(jnp.int32), 0,
                      accel.sph_perm.shape[0] - 1)
    s_best = accel.sph_perm[s_slot]

    o = rays.origin
    d = rays.direction
    sphere_wins = s_hit & (~tr_hit | (s_t <= tr_t))
    s_t_safe = jnp.where(s_hit, s_t, 1.0)
    tr_t_safe = jnp.where(tr_hit, tr_t, 1.0)

    sc = tables.s_center[s_best]
    sr = tables.s_radius[s_best]
    s_pos, s_nrm, s_uv = sphere_hit_fields(sc, sr, s_t_safe, o, d)
    s_mat = tables.s_material[s_best]

    t_pos, t_nrm, t_uv = triangle_hit_fields(
        tr_t_safe, tr_u, tr_v,
        tables.tri_na[t_best], tables.tri_nb[t_best], tables.tri_nc[t_best],
        tables.tri_ua[t_best], tables.tri_ub[t_best], tables.tri_uc[t_best],
        o, d)
    t_mat = tables.tri_material[t_best]

    sw3 = sphere_wins[:, None]
    return HitBatch(
        t=jnp.where(sphere_wins, s_t, tr_t),
        position=jnp.where(sw3, s_pos, t_pos),
        normal=jnp.where(sw3, s_nrm, t_nrm),
        uv=jnp.where(sw3, s_uv, t_uv),
        material=jnp.where(sphere_wins, s_mat, t_mat),
        valid=s_hit | tr_hit,
    )
