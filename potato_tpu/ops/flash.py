"""Flash intersector: streaming per-block closest-hit with O(1) epilogue.

The TPU-shaped replacement for the reference's per-ray recursive BVH walk
(src/bvh.rs:93-119). Pointer-chasing traversal is hostile to a vector
machine, so the walk is split into two phases, each on the unit that is
good at it:

1. **Queues in XLA, one list per 512-ray block.** Primitives are
   median-split into clusters of 128 (LBVH leaves, the analogue of the
   reference's recursive median split src/bvh.rs:36-67 cut off at
   128-primitive leaves). The dense slab test of all rays x all cluster
   AABBs (tavianator slab method, src/utility.rs:137-155) reduces per
   block to a front-to-back list of entered clusters — fully fused VPU
   work, no divergence. A retired block (all lanes t_max < t_min) gets an
   empty list and costs nothing.
2. **Per-lane-column running best.** Each visit updates a (512, 128)
   column-best (t, u, v, slot) with one compare + four selects — the
   winner across columns is extracted ONCE per block, not per visit.
3. **Front-to-back early termination.** A per-ray running best t is
   maintained (one lane-reduce per visit); a visit whose entry t exceeds
   every live ray's best is skipped — the reference's t_max-shrinking
   ordered descent (src/bvh.rs:106-112) at block granularity. Because the
   list is sorted by entry t, one skip means all remaining visits skip.

Two earlier kernel generations (a flat per-cluster walk and a 64-ray
visit-queue kernel) were profiled on v5e at 58 ms and 46 ms per 256k
camera rays respectively and superseded by this design; their unique
pieces (cluster build, slab test, padding) live here now.

The pair tests replicate ops/intersect.py bit-for-bit (same SMOL cutoff,
same root selection) and are property-tested against brute force in
tests/test_flash.py (interpret mode on CPU, compiled Mosaic on TPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from potato_tpu.core.types import BIG, SMOL, HitBatch, RayBatch
from potato_tpu.ops.intersect import sphere_hit_fields, triangle_hit_fields

R = 512        # rays per block (one grid step)
K = 128        # primitives per cluster (one lane tile)
RAY_COLS = 16  # o(3) d(3) m(3) tmin tmax pad(5),  m = d x o
OUT_COLS = 8   # tri: t u v slot | sph: t slot | pad(2)
# watertight edge-function features: gU eU gV eV gW eW (3 each) n(3) s_t(1)
TRI_FEATURES = 24     # 22 used, padded to a sublane multiple
SPH_FEATURES = 8      # c(3) |c|^2-r^2(1) valid(1)


class FlashAccel(NamedTuple):
    """Morton-clustered primitive tables + cluster AABBs (device arrays)."""

    tri_feats: jnp.ndarray    # (TRI_FEATURES, Ct*K) f32, cluster-ordered
    tri_perm: jnp.ndarray     # (Ct*K,) int32 packed slot -> original tri id
    tri_cmin: jnp.ndarray     # (Ct,3) f32 cluster AABBs
    tri_cmax: jnp.ndarray     # (Ct,3)
    sph_feats: jnp.ndarray    # (SPH_FEATURES, Cs*K) f32, cluster-ordered
    sph_perm: jnp.ndarray     # (Cs*K,) int32
    sph_cmin: jnp.ndarray     # (Cs,3)
    sph_cmax: jnp.ndarray     # (Cs,3)
    world_min: jnp.ndarray    # (3,) f32 scene bounds
    world_max: jnp.ndarray    # (3,)
    num_triangles: int
    num_spheres: int


def _morton_cluster(pmin: np.ndarray, pmax: np.ndarray):
    """Median-split primitives into ceil(n/K) clusters of K; return
    (order, pad, cmin, cmax).

    The BVH-leaf analogue of the reference's recursive median split
    (src/bvh.rs:36-67), cut off at K-primitive leaves: recursively split on
    the longest centroid axis, giving each side a whole number of clusters.
    Replaces plain Morton slicing (round 1), whose fixed-stride cuts of the
    Z-curve left clusters ~2x looser — cluster tightness directly sets how
    many clusters a ray enters, the kernel's unit of work.
    """
    n = pmin.shape[0]
    centroid = (0.5 * (pmin + pmax)).astype(np.float32)
    c = max((n + K - 1) // K, 1)

    chunks = []

    def split(idx: np.ndarray, nc: int):
        if nc == 1:
            chunks.append(idx)
            return
        cen = centroid[idx]
        axis = int(np.argmax(cen.max(axis=0) - cen.min(axis=0)))
        left_c = nc // 2
        k = left_c * K  # left side gets exactly left_c full clusters
        part = np.argpartition(cen[:, axis], k)
        split(idx[part[:k]], left_c)
        split(idx[part[k:]], nc - left_c)

    split(np.arange(n, dtype=np.int32), c)
    order = np.concatenate(chunks).astype(np.int32)

    pad = c * K - n
    bmin = np.concatenate([pmin[order], np.full((pad, 3), np.inf, np.float32)])
    bmax = np.concatenate([pmax[order], np.full((pad, 3), -np.inf, np.float32)])
    cmin = np.nan_to_num(bmin.reshape(c, K, 3).min(axis=1), posinf=3e38)
    cmax = np.nan_to_num(bmax.reshape(c, K, 3).max(axis=1), neginf=-3e38)
    return order, pad, cmin.astype(np.float32), cmax.astype(np.float32)


def build_flash_accel(tables, num_spheres: int, num_triangles: int) -> FlashAccel:
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
    # Watertight Moller-Trumbore in bilinear form: the Woop 2013 sheared
    # 2D edge function for edge (P, Q) equals (up to a positive per-ray
    # scale) U = d.(P x Q) + (d x o).(P - Q), a dot of per-ray [d, m] with
    # per-triangle [P x Q, P - Q]. Two triangles sharing an edge traverse
    # it in opposite directions, and these features are EXACT negations in
    # f64 (and stay so through the f32 cast), so the kernel's U values are
    # exact floating-point negations even under FMA contraction — the
    # watertight no-leak guarantee without any per-ray shear frame.
    # Padding slots are all-zero: U = V = W = 0 exactly => det 0, rejected.
    ba = pa_o - pb_o
    ca = pa_o - pc_o
    n = np.cross(ba, ca)
    tf[0:3, :T] = np.cross(pc_o, pb_o).T      # gU, edge (c, b): weights pa
    tf[3:6, :T] = (pc_o - pb_o).T             # eU
    tf[6:9, :T] = np.cross(pa_o, pc_o).T      # gV, edge (a, c): weights pb
    tf[9:12, :T] = (pa_o - pc_o).T            # eV
    tf[12:15, :T] = np.cross(pb_o, pa_o).T    # gW, edge (b, a): weights pc
    tf[15:18, :T] = (pb_o - pa_o).T           # eW
    tf[18:21, :T] = n.T                       # plane normal (t numerator)
    tf[21, :T] = np.einsum("td,td->t", pa_o, n)   # s_t = a . n

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

    # The kernel carries the winning primitive slot (cluster*K + lane) in an
    # f32 scratch lane; slots above 2^24 are not exactly representable and
    # would silently shade the wrong primitive.
    if tri_perm.shape[0] >= (1 << 24) or sph_perm.shape[0] >= (1 << 24):
        raise ValueError(
            "flash intersector carries primitive slots in f32: "
            f"padded counts (tris {tri_perm.shape[0]}, spheres "
            f"{sph_perm.shape[0]}) must stay below 2^24")

    wmin = np.minimum(tri_cmin.min(0), sph_cmin.min(0))
    wmax = np.maximum(tri_cmax.max(0), sph_cmax.max(0))

    return FlashAccel(
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


def slab_test(rays: RayBatch, cmin, cmax):
    """Dense slab test of every ray against every cluster AABB.

    The tavianator method of src/utility.rs:137-155, vectorized over the
    full (rays x clusters) grid. Unrolls the 3 axes so every intermediate
    is a lane-friendly (B, C) tile: per-ray scalars broadcast down
    sublanes, per-cluster bounds across lanes. (A (B, C, 3) formulation
    puts the reduction on a 3-wide lane dim — catastrophic layout on TPU.)

    NaN-robust: a zero direction component with the origin exactly on a
    cluster bound yields 0 * inf = NaN; such an axis is treated as
    non-constraining (cluster kept), matching the reference's
    NaN-ignoring Rust f64::min/max. Conservative — an extra visit is
    allowed, a missed hit is not.

    Returns (entered (B, C) bool, lo (B, C) f32 entry distance).
    """
    b = rays.origin.shape[0]
    c = cmin.shape[0]
    lo = jnp.broadcast_to(rays.t_min[:, None], (b, c))
    hi = jnp.broadcast_to(rays.t_max[:, None], (b, c))
    for a in range(3):
        inv_d = (1.0 / rays.direction[:, a])[:, None]      # (B, 1)
        oa = rays.origin[:, a][:, None]
        t0 = (cmin[None, :, a] - oa) * inv_d               # (B, C)
        t1 = (cmax[None, :, a] - oa) * inv_d
        near = jnp.minimum(t0, t1)
        far = jnp.maximum(t0, t1)
        lo = jnp.maximum(lo, jnp.where(jnp.isnan(near), -jnp.inf, near))
        hi = jnp.minimum(hi, jnp.where(jnp.isnan(far), jnp.inf, far))
    return hi >= lo, lo


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


def _pad_queue_rows(arrs, s):
    """Pad the step axis to a multiple of 8 (SMEM blocks carry 8 rows)."""
    sp = ((s + 7) // 8) * 8
    if sp == s:
        return arrs
    return [jnp.concatenate(
        [a, jnp.zeros((sp - s,) + a.shape[1:], a.dtype)]) for a in arrs]


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


def _make_flash_kernel(ct: int):
    """Kernel factory: `ct` = number of triangle clusters (static), the
    split point inside the merged queue rows."""

    def _flash_kernel(qi_ref, qf_ref, rays_ref, tri_ref, sph_ref, out_ref,
                      colt, colu, colv, cols, rbest):
        return _flash_kernel_body(ct, qi_ref, qf_ref, rays_ref, tri_ref,
                                  sph_ref, out_ref, colt, colu, colv, cols,
                                  rbest)

    return _flash_kernel


def _flash_kernel_body(ct, qi_ref, qf_ref, rays_ref, tri_ref, sph_ref,
                       out_ref, colt, colu, colv, cols, rbest):
    """One 512-ray block: drain its tri + sphere cluster lists.

    Queue rows are merged into two SMEM arrays (int: [tn, sn, tcodes(ct),
    scodes], float: [tentry(ct), sentry]) so each grid step issues 2 SMEM
    block DMAs instead of 6.
    """
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

    # ---------------- sphere phase (first) ----------------
    # Spheres run before triangles so every lane's sphere hit bounds the
    # triangle walk: a tile of rays that all hit the ground sphere skips
    # every triangle cluster behind it (the reference's t_max-shrinking
    # ordered descent, src/bvh.rs:106-112, across primitive types).
    #
    # Both phases are fully guarded on their visit count: a block whose
    # queue is empty (sky tiles, retired-ray tiles) writes its miss
    # defaults and does NO (R, K)-wide work — no scratch init, no winner
    # extraction. Payload scratch (colu/colv/cols) is never initialized at
    # all: lanes the masked-sum extraction reads are exactly the lanes a
    # visit wrote, and when a phase finds no hit (t stays BIG) the
    # extracted garbage payload is discarded downstream (hit.valid False
    # => the integrator's sanitize pass masks every field).
    n_sph = qi_ref[row, 1]

    @pl.when(n_sph == 0)
    def _():
        out_ref[:, 4:5] = jnp.full((R, 1), BIG, jnp.float32)
        out_ref[:, 5:6] = jnp.zeros((R, 1), jnp.float32)

    def sph_body(j, _):
        far = jnp.max(jnp.minimum(rbest[:], t_max))

        @pl.when(qf_ref[row, ct + j] < far)
        def _():
            ci = qi_ref[row, 2 + ct + j]
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

    @pl.when(n_sph > 0)
    def _():
        colt[:] = jnp.full((R, K), BIG, jnp.float32)
        rbest[:] = jnp.full((R, 1), BIG, jnp.float32)
        jax.lax.fori_loop(0, n_sph, sph_body, 0)

        s_t = rbest[:]
        at_min = colt[:] == s_t
        win = jnp.min(jnp.where(at_min, lane, jnp.int32(1 << 30)),
                      axis=1, keepdims=True)
        mask = at_min & (lane == win)
        out_ref[:, 4:5] = s_t
        out_ref[:, 5:6] = jnp.sum(jnp.where(mask, cols[:], 0.0), axis=1,
                                  keepdims=True)

    out_ref[:, 6:8] = jnp.zeros((R, 2), jnp.float32)
    sph_t = out_ref[:, 4:5]

    # ---------------- triangle phase ----------------
    n_tri = qi_ref[row, 0]

    @pl.when(n_tri == 0)
    def _():
        out_ref[:, 0:1] = jnp.full((R, 1), BIG, jnp.float32)
        out_ref[:, 1:4] = jnp.zeros((R, 3), jnp.float32)

    def tri_body(j, _):
        # early termination: skip once every live lane's best hit (its
        # sphere hit included) precedes this cluster's entry (list is
        # front-to-back sorted)
        far = jnp.max(jnp.minimum(jnp.minimum(rbest[:], sph_t), t_max))

        @pl.when(qf_ref[row, j] < far)
        def _():
            ci = qi_ref[row, 2 + j]
            sl = pl.ds(pl.multiple_of(ci * K, K), K)

            # Watertight Moller-Trumbore (Woop, Benthin & Wald 2013 edge
            # tests; BASELINE north-star upgrade over the reference's
            # Cramer form, src/hittable.rs:65-108) in bilinear form: the
            # sheared 2D edge function of edge (P, Q) is, up to one
            # positive per-ray scale, U = d.(PxQ) + m.(P-Q) with m = dxo.
            # Adjacent triangles carry exactly-negated (PxQ, P-Q) features
            # for their shared edge (build_flash_accel), and negation
            # commutes with correctly-rounded FMA arithmetic, so their U
            # values are exact fp negations: a ray crossing the shared
            # edge is accepted by at least one triangle, whatever the
            # compiler's contraction policy.
            U = (dx * tri_ref[0:1, sl] + dy * tri_ref[1:2, sl]
                 + dz * tri_ref[2:3, sl] + mx * tri_ref[3:4, sl]
                 + my * tri_ref[4:5, sl] + mz * tri_ref[5:6, sl])
            V = (dx * tri_ref[6:7, sl] + dy * tri_ref[7:8, sl]
                 + dz * tri_ref[8:9, sl] + mx * tri_ref[9:10, sl]
                 + my * tri_ref[10:11, sl] + mz * tri_ref[11:12, sl])
            W = (dx * tri_ref[12:13, sl] + dy * tri_ref[13:14, sl]
                 + dz * tri_ref[14:15, sl] + mx * tri_ref[15:16, sl]
                 + my * tri_ref[16:17, sl] + mz * tri_ref[17:18, sl])
            det = U + V + W
            same_sign = (((U >= 0.0) & (V >= 0.0) & (W >= 0.0))
                         | ((U <= 0.0) & (V <= 0.0) & (W <= 0.0)))
            det_ok = det != 0.0
            inv_det = jnp.where(det_ok, 1.0, 0.0) / jnp.where(det_ok, det,
                                                              1.0)
            # t from the plane equation: t = (o.n - s_t) / det, since
            # det = U+V+W = -d.n exactly in real arithmetic
            o_n = (ox * tri_ref[18:19, sl] + oy * tri_ref[19:20, sl]
                   + oz * tri_ref[20:21, sl])
            tt = (o_n - tri_ref[21:22, sl]) * inv_det
            tu = V * inv_det   # pb weight
            tv = W * inv_det   # pc weight
            valid = (det_ok & same_sign & (tt >= t_min) & (tt <= t_max))
            key = jnp.where(valid, tt, BIG)

            improve = key < colt[:]
            colt[:] = jnp.where(improve, key, colt[:])
            colu[:] = jnp.where(improve, tu, colu[:])
            colv[:] = jnp.where(improve, tv, colv[:])
            cols[:] = jnp.where(improve, ci * K + lane_f, cols[:])
            rbest[:] = jnp.minimum(rbest[:],
                                   jnp.min(key, axis=1, keepdims=True))

        return 0

    @pl.when(n_tri > 0)
    def _():
        colt[:] = jnp.full((R, K), BIG, jnp.float32)
        rbest[:] = jnp.full((R, 1), BIG, jnp.float32)
        jax.lax.fori_loop(0, n_tri, tri_body, 0)

        # one winner extraction per block (not per visit): rbest is the min
        # of colt's columns; pick the lowest winning lane, payload via
        # masked sums
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


def _flash_raw(accel: FlashAccel, rays: RayBatch, interpret: bool = False):
    """Queue build + kernel launch; returns the raw (B, OUT_COLS) hit
    records (before the shade-table epilogue) and the unpadded count."""
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
    ct = accel.tri_cmin.shape[0]
    # merge the six per-block queue arrays into two (one int, one float):
    # 2 SMEM block DMAs per grid step instead of 6
    qi = jnp.concatenate([tn, sn, tcodes, scodes], axis=1)
    qf = jnp.concatenate([tentry, sentry], axis=1)
    qi, qf = _pad_queue_rows([qi, qf], nb)

    def smem(arr):
        # 8 queue rows per SMEM block (Mosaic 8-sublane divisibility rule);
        # the kernel picks its row via program_id % 8.
        return pl.BlockSpec((8, arr.shape[1]), lambda i: (i // 8, 0),
                            memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        _make_flash_kernel(ct),
        grid=(nb,),
        in_specs=[smem(qi), smem(qf),
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
    )(qi, qf, packed, accel.tri_feats, accel.sph_feats)
    return out, b


def intersect_flash(accel: FlashAccel, tables, rays: RayBatch,
                    interpret: bool = False) -> HitBatch:
    """Closest hit over all scene primitives via the flash kernel."""
    out, b = _flash_raw(accel, rays, interpret)
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
