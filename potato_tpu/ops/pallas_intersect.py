"""Pallas fused intersection kernels.

Why a kernel: the XLA dense intersector materializes O(B x T) pair
intermediates in HBM (ops/dense.py) — at bunny scale that is GBs per
bounce and dominates runtime. Here the whole primitive table lives in
VMEM, each grid step streams a block of rays through it, and only the
per-ray winning hit (t, u, v, index) is ever written — zero per-pair HBM
traffic. Layout:

- triangles are pre-packed as 16 feature lanes (the bilinear weights of
  ops/dense.py): n, a x ca, ca, ba x a, ba, a.n — transposed to (16, Tp)
  so each feature row broadcasts against a ray block on the VPU,
- spheres pack as (5, Sp): center, |c|^2 - r^2, plus a validity lane,
- cluster culling (triangles): the kernel walks Morton clusters and skips
  a whole cluster when no ray in the block enters its AABB — scalar
  @pl.when branch, real work skipped, the TPU-shaped analogue of a BVH
  visit (per-block, not per-lane, so all compute stays dense).

The kernels are exact replicas of the XLA math (same SMOL/root-selection
semantics) and are property-tested against brute force in
tests/test_pallas.py (interpret mode on CPU, compiled on TPU).
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

RAY_BLOCK = 256          # rays per grid step (bounds VMEM: R x K pair tiles)
TRI_FEATURES = 16        # n(3) a_x_ca(3) ca(3) ba_x_a(3) ba(3) s_t(1)
SPH_FEATURES = 8         # c(3) cc_minus_r2(1) pad(4)


class PallasAccel(NamedTuple):
    """VMEM-resident primitive tables + cluster metadata."""

    tri_feats: jnp.ndarray     # (TRI_FEATURES, Tp) f32, cluster-ordered
    tri_perm: jnp.ndarray      # (Tp,) int32: packed slot -> original tri id
    cluster_bounds: jnp.ndarray  # (8, C) f32 rows: min xyz, max xyz, pad
    sph_feats: jnp.ndarray     # (SPH_FEATURES, Sp) f32
    num_triangles: int
    num_spheres: int
    cluster_size: int


def build_pallas_accel(tables, num_spheres: int, num_triangles: int,
                       cluster_size: int = 256) -> PallasAccel:
    """Pack primitive features, Morton-ordering triangles into clusters."""
    from potato_tpu.scene.bvh import morton_codes

    K = int(cluster_size)

    pa = np.asarray(tables.tri_pa, np.float64)[:num_triangles] if num_triangles else np.zeros((0, 3))
    pb = np.asarray(tables.tri_pb, np.float64)[:num_triangles] if num_triangles else np.zeros((0, 3))
    pc = np.asarray(tables.tri_pc, np.float64)[:num_triangles] if num_triangles else np.zeros((0, 3))

    T = pa.shape[0]
    if T:
        tri_min = np.minimum(np.minimum(pa, pb), pc)
        tri_max = np.maximum(np.maximum(pa, pb), pc)
        centroid = (0.5 * (tri_min + tri_max)).astype(np.float32)
        order = np.argsort(morton_codes(centroid, centroid.min(0), centroid.max(0)),
                           kind="stable").astype(np.int32)
    else:
        order = np.zeros(0, np.int32)

    C = max((T + K - 1) // K, 1)
    Tp = C * K
    perm = np.concatenate([order, np.zeros(Tp - T, np.int32)])

    feats = np.zeros((TRI_FEATURES, Tp), np.float64)
    if T:
        pa_o, pb_o, pc_o = pa[order], pb[order], pc[order]
        ba = pa_o - pb_o
        ca = pa_o - pc_o
        n = np.cross(ba, ca)
        feats[0:3, :T] = n.T
        feats[3:6, :T] = np.cross(pa_o, ca).T
        feats[6:9, :T] = ca.T
        feats[9:12, :T] = np.cross(ba, pa_o).T
        feats[12:15, :T] = ba.T
        feats[15, :T] = np.einsum("td,td->t", pa_o, n)
        # padding slots keep n = 0 -> det 0 -> never valid

        bmin = np.concatenate([tri_min[order], np.full((Tp - T, 3), np.inf)])
        bmax = np.concatenate([tri_max[order], np.full((Tp - T, 3), -np.inf)])
        cmin = bmin.reshape(C, K, 3).min(axis=1)
        cmax = bmax.reshape(C, K, 3).max(axis=1)
    else:
        cmin = np.full((C, 3), np.inf)
        cmax = np.full((C, 3), -np.inf)

    # (C, 8) scalar rows consumed from SMEM: min xyz, max xyz, pad — scalar
    # loads broadcast against the ray block, so no lane-aligned dynamic
    # vector load is needed per cluster
    bounds = np.zeros((C, 8), np.float32)
    bounds[:, 0:3] = np.nan_to_num(cmin, posinf=3e38, neginf=-3e38)
    bounds[:, 3:6] = np.nan_to_num(cmax, posinf=3e38, neginf=-3e38)

    c = np.asarray(tables.s_center, np.float64)[:num_spheres] if num_spheres else np.zeros((0, 3))
    r = np.asarray(tables.s_radius, np.float64)[:num_spheres] if num_spheres else np.zeros((0,))
    S = c.shape[0]
    Sp = max(((S + 127) // 128) * 128, 128)
    sf = np.zeros((SPH_FEATURES, Sp), np.float64)
    if S:
        sf[0:3, :S] = c.T
        sf[3, :S] = np.einsum("sd,sd->s", c, c) - r * r
    sf[4, :S] = 1.0  # validity lane (pad spheres invalid)

    return PallasAccel(
        tri_feats=jnp.asarray(feats, jnp.float32),
        tri_perm=jnp.asarray(perm),
        cluster_bounds=jnp.asarray(bounds),
        sph_feats=jnp.asarray(sf, jnp.float32),
        num_triangles=num_triangles,
        num_spheres=num_spheres,
        cluster_size=K,
    )


# ------------------------------------------------------------------ kernel


def _tri_kernel(o_ref, d_ref, m_ref, tmin_ref, tmax_ref, feats_ref,
                bounds_ref, out_ref, *, num_clusters: int, cluster_size: int):
    """Per ray block: walk clusters, intersect resident triangle features,
    keep the packed best (t, u, v, slot) per ray."""
    K = cluster_size
    R = o_ref.shape[0]

    ox = o_ref[:, 0:1]
    oy = o_ref[:, 1:2]
    oz = o_ref[:, 2:3]
    dx = d_ref[:, 0:1]
    dy = d_ref[:, 1:2]
    dz = d_ref[:, 2:3]
    mx = m_ref[:, 0:1]
    my = m_ref[:, 1:2]
    mz = m_ref[:, 2:3]
    t_min = tmin_ref[:, 0:1]
    t_max = tmax_ref[:, 0:1]

    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    best0 = jnp.full((R, 1), BIG, jnp.float32)
    zero = jnp.zeros((R, 1), jnp.float32)

    def visit(ci, carry):
        best_t, best_u, best_v, best_slot = carry

        # does ANY ray in the block enter cluster ci's AABB? slab test of
        # the ray block against one box read as SMEM scalars; the scalar
        # branch below skips the whole cluster's intersection work on miss.
        tx0 = (bounds_ref[ci, 0] - ox) * inv_dx
        ty0 = (bounds_ref[ci, 1] - oy) * inv_dy
        tz0 = (bounds_ref[ci, 2] - oz) * inv_dz
        tx1 = (bounds_ref[ci, 3] - ox) * inv_dx
        ty1 = (bounds_ref[ci, 4] - oy) * inv_dy
        tz1 = (bounds_ref[ci, 5] - oz) * inv_dz
        lo = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                     jnp.minimum(ty0, ty1)),
                         jnp.minimum(tz0, tz1))
        hi = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                     jnp.maximum(ty0, ty1)),
                         jnp.maximum(tz0, tz1))
        # shrink to the block's best-so-far: a cluster farther than every
        # ray's current hit can be skipped too (front-to-back analogue)
        entered = jnp.any((jnp.minimum(hi, jnp.minimum(t_max, best_t))
                           >= jnp.maximum(lo, t_min)))

        def do_cluster(carry):
            best_t, best_u, best_v, best_slot = carry
            sl = pl.ds(pl.multiple_of(ci * K, 128), K)
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

            det = dx * nx + dy * ny + dz * nz                    # (R, K)
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

            # branchless per-row winner extraction — Mosaic has no per-lane
            # gather, so select via a unique min-mask + sum-reductions
            cand_t = jnp.min(key, axis=1, keepdims=True)          # (R, 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
            at_min = key == cand_t
            win_lane = jnp.min(jnp.where(at_min, lane, jnp.int32(1 << 30)),
                               axis=1, keepdims=True)
            mask = at_min & (lane == win_lane)                    # unique
            cand_u = jnp.sum(jnp.where(mask, tu, 0.0), axis=1, keepdims=True)
            cand_v = jnp.sum(jnp.where(mask, tv, 0.0), axis=1, keepdims=True)

            improve = cand_t < best_t
            best_t = jnp.where(improve, cand_t, best_t)
            best_u = jnp.where(improve, cand_u, best_u)
            best_v = jnp.where(improve, cand_v, best_v)
            slot = (ci * K + win_lane).astype(jnp.float32)
            best_slot = jnp.where(improve, slot, best_slot)
            return best_t, best_u, best_v, best_slot

        return jax.lax.cond(entered, do_cluster, lambda c: c,
                            (best_t, best_u, best_v, best_slot))

    best_t, best_u, best_v, best_slot = jax.lax.fori_loop(
        0, num_clusters, visit, (best0, zero, zero, zero))

    out_ref[:, 0:1] = best_t
    out_ref[:, 1:2] = best_u
    out_ref[:, 2:3] = best_v
    out_ref[:, 3:4] = best_slot


def _sph_kernel(o_ref, d_ref, tmin_ref, tmax_ref, feats_ref, out_ref, *,
                num_tiles: int, tile: int):
    """Dense sphere pass: all spheres vs the ray block, tiled over spheres."""
    R = o_ref.shape[0]
    ox = o_ref[:, 0:1]
    oy = o_ref[:, 1:2]
    oz = o_ref[:, 2:3]
    dx = d_ref[:, 0:1]
    dy = d_ref[:, 1:2]
    dz = d_ref[:, 2:3]
    t_min = tmin_ref[:, 0:1]
    t_max = tmax_ref[:, 0:1]

    a_coef = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a_coef
    o2 = ox * ox + oy * oy + oz * oz
    d_o = dx * ox + dy * oy + dz * oz

    def visit(si, carry):
        best_t, best_idx = carry
        sl = pl.ds(pl.multiple_of(si * tile, 128), tile)
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
        t0 = (-half_b - sqrt_delta) * inv_a
        t1 = (-half_b + sqrt_delta) * inv_a
        t0_ok = (t0 >= t_min) & (t0 <= t_max)
        t1_ok = (t1 >= t_min) & (t1 <= t_max)
        st = jnp.where(t0_ok, t0, t1)
        valid = sph_ok & (t0_ok | t1_ok)
        key = jnp.where(valid, st, BIG)

        cand = jnp.min(key, axis=1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
        at_min = key == cand
        win_lane = jnp.min(jnp.where(at_min, lane, jnp.int32(1 << 30)),
                           axis=1, keepdims=True)
        improve = cand < best_t
        best_t = jnp.where(improve, cand, best_t)
        best_idx = jnp.where(improve, (si * tile + win_lane).astype(jnp.float32),
                             best_idx)
        return best_t, best_idx

    best_t, best_idx = jax.lax.fori_loop(
        0, num_tiles, visit,
        (jnp.full((R, 1), BIG, jnp.float32), jnp.zeros((R, 1), jnp.float32)))
    out_ref[:, 0:1] = best_t
    out_ref[:, 1:2] = best_idx


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


def intersect_pallas(accel: PallasAccel, tables, rays: RayBatch,
                     interpret: bool = False) -> HitBatch:
    """Closest hit via the fused Pallas kernels (triangles + spheres)."""
    padded, b = _pad_rays(rays, RAY_BLOCK)
    bp = padded.origin.shape[0]
    grid = (bp // RAY_BLOCK,)

    o = padded.origin
    d = padded.direction
    m = jnp.cross(d, o)
    tmin = padded.t_min[:, None]
    tmax = padded.t_max[:, None]

    ray_spec = pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    Tp = accel.tri_feats.shape[1]
    num_clusters = Tp // accel.cluster_size
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    tri_out = pl.pallas_call(
        partial(_tri_kernel, num_clusters=num_clusters,
                cluster_size=accel.cluster_size),
        grid=grid,
        in_specs=[ray_spec, ray_spec, ray_spec, scalar_spec, scalar_spec,
                  table_spec, smem_spec],
        out_specs=pl.BlockSpec((RAY_BLOCK, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 4), jnp.float32),
        interpret=interpret,
    )(o, d, m, tmin, tmax, accel.tri_feats, accel.cluster_bounds)

    Sp = accel.sph_feats.shape[1]
    sph_tile = min(Sp, 512)
    sph_out = pl.pallas_call(
        partial(_sph_kernel, num_tiles=Sp // sph_tile, tile=sph_tile),
        grid=grid,
        in_specs=[ray_spec, ray_spec, scalar_spec, scalar_spec, table_spec],
        out_specs=pl.BlockSpec((RAY_BLOCK, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 2), jnp.float32),
        interpret=interpret,
    )(o, d, tmin, tmax, accel.sph_feats)

    # ---- combine + assemble fields (XLA; per-ray only) ----
    tr_t = tri_out[:b, 0]
    tr_u = tri_out[:b, 1]
    tr_v = tri_out[:b, 2]
    tr_slot = tri_out[:b, 3].astype(jnp.int32)
    tr_hit = tr_t < BIG
    t_best = accel.tri_perm[jnp.clip(tr_slot, 0, accel.tri_perm.shape[0] - 1)]

    s_t = sph_out[:b, 0]
    s_hit = s_t < BIG
    s_best = jnp.clip(sph_out[:b, 1].astype(jnp.int32), 0,
                      max(accel.num_spheres - 1, 0))

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
