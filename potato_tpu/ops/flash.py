"""Flash intersector: two-level hierarchical block traversal.

The TPU-shaped replacement for the reference's per-ray recursive BVH walk
(src/bvh.rs:93-119). Pointer-chasing traversal is hostile to a vector
machine, so the walk is split into phases, each on the unit that is good
at it:

1. **Two-level cluster hierarchy.** Primitives are median-split into
   parent clusters of K=128 (the analogue of the reference's recursive
   median split src/bvh.rs:36-67), and each parent into 8 children of
   W=16 — the leaf granularity that sets pair-test volume. Measured on
   the bunny workload (tools/stats_clusters.py): a 512-ray block enters
   ~3.7 16-wide children (camera) / ~1.6 (bounce) vs ~3.6 128-wide
   parents — an ~8x pair-test reduction at equal visit cost.

2. **Queues in XLA, one list per 512-ray block.** A dense per-ray slab
   test (tavianator method, src/utility.rs:137-155) marks the parent
   clusters any ray of the block enters; a conservative interval slab of
   the block's ray BUNDLE (origin box x direction box x t range) then
   refines entered parents to child granularity — near-exact for
   coherent camera tiles, degrading to whole-parent visits for
   incoherent post-bounce bundles. The nearest packed-capacity children,
   selected front-to-back with top_k, are recorded as SMEM child ids;
   the KERNEL assembles each visit's (128, F) feature tile from 8 W-row
   dynamic slices of the VMEM-resident table (an XLA-side gather shipped
   every capacity slot's tile per block, sentinels included). Parents
   owning children beyond the capacity (rare) are visited whole
   afterwards, where front-to-back early termination usually skips
   them. This is the reference's ordered t_max-shrinking descent
   (src/bvh.rs:93-119) rebuilt at block granularity.

3. **Per-prim-row running best.** Each visit updates a (128, 512)
   prim-by-ray best (t, slot) with one compare + two selects — the
   winner across prim rows is extracted ONCE per block. Barycentrics are
   NOT tracked per pair: the epilogue re-derives (u, v) for the single
   winning triangle per ray from its gathered corners. The transposed
   (prims, rays) orientation keeps every operand the custom call pins to
   row-major layout lane-major in rays — see _process_block.

4. **Front-to-back early termination.** A per-ray running best t is
   maintained; a visit whose entry t exceeds every live ray's best is
   skipped — and because lists are sorted by entry t, one skip means all
   remaining visits skip.

5. **Small sphere sets never enter the kernel.** Scenes with <=
   SPH_BRUTE_MAX spheres (bunny: 1 ground sphere) get an exact,
   differentiable XLA sphere test whose result is folded into t_max
   before the queue build — sphere-first culling (a tile of rays that
   all hit the ground skips every triangle cluster behind it) at zero
   kernel cost. Larger sets (more_balls: 3721) keep the in-kernel
   sphere phase over 128-wide sphere clusters.

Sphere pair tests replicate ops/intersect.py's half-b quadratic and root
selection; triangle pair tests run the watertight bilinear edge-function
form (det != 0 acceptance — see _tri_visit) rather than ops/intersect.py's
Cramer form with its SMOL cutoff, so agreement with the brute-force oracle
is at the ~0.5% level on degenerate-adjacent rays, not bit-for-bit.
Property-tested against brute force in tests/test_flash.py (interpret mode
on CPU, compiled Mosaic on TPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from potato_tpu.core.types import BIG, HitBatch, RayBatch
from potato_tpu.ops.intersect import sphere_hit_t

import os as _os

R = int(_os.environ.get("POTATO_R", "512"))  # rays per block (one grid step)
K = 128        # primitives per parent cluster (one lane tile)
W = int(_os.environ.get("POTATO_W", "16"))  # primitives per child cluster
               # (packing granularity; sweepable for experiments)
CPP = K // W   # children per parent

TOP_P = int(_os.environ.get("POTATO_TOP_P", "2"))
               # packed-visit capacity per block (<= TOP_P*CPP nearest
               # children pack into <= TOP_P 128-prim visits; overflow
               # falls back to whole-parent tail visits). Swept on v5e
               # both in r4 (XLA-side packed gather: 6..1 -> 165/151/128/
               # 126/128 ms frames) and again in r5 after the in-kernel
               # child assembly (2/3/4/6/8 -> 139/206/235/277/311 ms per
               # 4-frame dispatch, POTATO_TOP_P env sweep): 2 wins
               # decisively both times — extra capacity inflates the
               # top_k width and the unrolled guarded-visit chain far
               # faster than it drains the overflow tail.
SPH_BRUTE_MAX = int(_os.environ.get("POTATO_SPH_BRUTE_MAX", "16"))
               # sphere count at/below which spheres are tested in XLA
RAY_COLS = 8   # o(3) d(3) tmin tmax;  m = d x o is derived in-kernel
               # (9 ops on (1, R) rows — cheaper than shipping 3 more
               # rows per ray and padding the operand to 16)
OUT_COLS = 8   # tri: t slot | sph: t slot | pad(4)
# watertight edge-function features: gU eU gV eV gW eW (3 each) n(3) s_t(1)
# = rows 0..21; row 22,23 pad; row 24 = global primitive slot (f32);
# padded to 32 rows (Mosaic sublane tile)
F_ROWS = 32
SLOT_ROW = 24
SPH_FEATURES = 8      # c(3) |c|^2-r^2(1) valid(1)


class FlashAccel(NamedTuple):
    """Two-level cluster tables + AABBs (device arrays)."""

    tri_flat: jnp.ndarray     # (Cp*K + W, F_ROWS) f32, fine (child) order,
                              # prim-major, + W all-zero pad rows (the
                              # packed-visit sentinel child: det 0, slot 0,
                              # never wins) — see build_flash_accel
    tri_perm: jnp.ndarray     # (Cp*K,) int32 fine slot -> original tri id
    tri_cmin: jnp.ndarray     # (Cp,3) f32 parent AABBs
    tri_cmax: jnp.ndarray     # (Cp,3)
    tri_cmin16: jnp.ndarray   # (Cp*CPP,3) f32 child AABBs
    tri_cmax16: jnp.ndarray   # (Cp*CPP,3)
    sph_feats: jnp.ndarray    # (Cs*K, SPH_FEATURES) f32, cluster-ordered
    sph_perm: jnp.ndarray     # (Cs*K,) int32
    sph_cmin: jnp.ndarray     # (Cs,3)
    sph_cmax: jnp.ndarray     # (Cs,3)
    # hybrid sphere split (scenes with > SPH_BRUTE_MAX spheres): the
    # SPH_BRUTE_MAX LARGEST spheres are always resolved by the exact,
    # differentiable XLA test and their bound folded into t_max BEFORE
    # the queue build — more_balls' radius-1000 ground sphere then culls
    # every cluster behind the ground for every ray, camera and bounce
    # alike. Only the remaining (small) spheres live in kernel clusters.
    sph_brute: jnp.ndarray         # (SB,) int32 original sphere ids
    sph_brute_center: jnp.ndarray  # (SB,3) f32 baked (tables-free path)
    sph_brute_radius: jnp.ndarray  # (SB,) f32
    # unified shade table, baked at build time (one row gather per ray in
    # the epilogue instead of a 10-gather table build per intersect call):
    # tri rows [na nb nc | ua ub uc | pa pb pc | mat] then sphere rows
    # [center radius 0...| mat] — sphere rows in ORIGINAL table order when
    # the accel uses the XLA sphere path (num_spheres <= SPH_BRUTE_MAX),
    # sph_perm order otherwise. Baking means vertex attributes and
    # material ids are geometry constants of the accel (like every other
    # accel's tables); none of the optimizer's DIFFERENTIABLE_FIELDS live
    # here, so gradients are unaffected.
    shade: jnp.ndarray        # (Cp*K + Ssh, 25) f32
    world_min: jnp.ndarray    # (3,) f32 scene bounds
    world_max: jnp.ndarray    # (3,)
    num_triangles: int
    num_spheres: int


def _median_split_order(pmin: np.ndarray, pmax: np.ndarray, leaf: int):
    """Recursive longest-axis median split into exact `leaf`-size chunks
    (the last chunk may be short). Returns the permutation.

    The BVH analogue of the reference's recursive median split
    (src/bvh.rs:36-67) cut off at `leaf`-primitive leaves.
    """
    n = pmin.shape[0]
    centroid = (0.5 * (pmin + pmax)).astype(np.float32)
    chunks = []

    def split(idx: np.ndarray, nc: int):
        if nc == 1:
            chunks.append(idx)
            return
        cen = centroid[idx]
        axis = int(np.argmax(cen.max(axis=0) - cen.min(axis=0)))
        left_c = nc // 2
        k = left_c * leaf  # left side gets exactly left_c full chunks
        part = np.argpartition(cen[:, axis], k)
        split(idx[part[:k]], left_c)
        split(idx[part[k:]], nc - left_c)

    split(np.arange(n, dtype=np.int32), max((n + leaf - 1) // leaf, 1))
    return np.concatenate(chunks).astype(np.int32)


def _aabbs_of(pmin, pmax, order, width, total):
    """(C, 3) AABBs of `width`-wide chunks of the padded order; padding
    slots (order shorter than total) contribute empty boxes."""
    n = order.shape[0]
    bmin = np.concatenate(
        [pmin[order], np.full((total - n, 3), np.inf, np.float32)])
    bmax = np.concatenate(
        [pmax[order], np.full((total - n, 3), -np.inf, np.float32)])
    c = total // width
    cmin = np.nan_to_num(bmin.reshape(c, width, 3).min(axis=1), posinf=3e38)
    cmax = np.nan_to_num(bmax.reshape(c, width, 3).max(axis=1), neginf=-3e38)
    return cmin.astype(np.float32), cmax.astype(np.float32)


def _hier_cluster(pmin: np.ndarray, pmax: np.ndarray):
    """Hierarchical order: parents of K, each split into CPP children of W.

    Parent p owns fine slots [p*K, (p+1)*K); child c owns [c*W, (c+1)*W).
    Only the LAST parent can be short (global padding sits at the end), so
    the alignment invariants hold for every parent/child.
    Returns (order, total_slots, parent cmin/cmax, child cmin/cmax).
    """
    n = pmin.shape[0]
    order = _median_split_order(pmin, pmax, K)
    # refine each exact-K parent chunk into W-wide children
    refined = []
    for p in range(0, n, K):
        chunk = order[p:p + K]
        sub = _median_split_order(pmin[chunk], pmax[chunk], W)
        refined.append(chunk[sub])
    order = np.concatenate(refined).astype(np.int32) if refined else order
    cp = max((n + K - 1) // K, 1)
    total = cp * K
    cmin, cmax = _aabbs_of(pmin, pmax, order, K, total)
    cmin16, cmax16 = _aabbs_of(pmin, pmax, order, W, total)
    return order, total, cmin, cmax, cmin16, cmax16


def build_flash_accel(tables, num_spheres: int, num_triangles: int) -> FlashAccel:
    """Host-side (cold path) build, vectorized numpy — the analogue of the
    reference's main-thread Bvh::new (src/bvh.rs:70-91)."""
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
    order, total, tri_cmin, tri_cmax, tri_cmin16, tri_cmax16 = \
        _hier_cluster(tri_min, tri_max)
    tri_perm = np.concatenate(
        [order, np.zeros(total - order.shape[0], np.int32)])

    tf = np.zeros((F_ROWS, total), np.float64)
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
    nt = order.shape[0]
    ba = pa_o - pb_o
    ca = pa_o - pc_o
    n = np.cross(ba, ca)
    tf[0:3, :nt] = np.cross(pc_o, pb_o).T      # gU, edge (c, b): weights pa
    tf[3:6, :nt] = (pc_o - pb_o).T             # eU
    tf[6:9, :nt] = np.cross(pa_o, pc_o).T      # gV, edge (a, c): weights pb
    tf[9:12, :nt] = (pa_o - pc_o).T            # eV
    tf[12:15, :nt] = np.cross(pb_o, pa_o).T    # gW, edge (b, a): weights pc
    tf[15:18, :nt] = (pb_o - pa_o).T           # eW
    tf[18:21, :nt] = n.T                       # plane normal (t numerator)
    tf[21, :nt] = np.einsum("td,td->t", pa_o, n)   # s_t = a . n
    # row SLOT_ROW carries each column's global fine slot as f32 so the
    # kernel's winning-slot select needs no per-visit id reconstruction
    # (for a tail visit of parent p this equals p*K + lane; for a packed
    # visit it is gathered along with the features)
    tf[SLOT_ROW, :] = np.arange(total, dtype=np.float64)
    tf = tf.astype(np.float32)

    # Transposed (prim-major) layouts: the kernel computes on (prims,
    # rays) tiles so that every pallas operand's mandated row-major layout
    # puts rays/prims on the LANE axis — harmonious with the lane-major
    # {0,1} layout XLA picks for the integrator's (B, 3) ray state. (A
    # rays-major kernel interface made layout assignment flip the whole
    # bounce loop's state to {1,0:T(8,128)} — 3 useful lanes of 128.)
    tf = np.ascontiguousarray(tf.T)            # (total, F_ROWS)
    # + W all-zero pad rows: the sentinel child (id = total//W) that fills
    # unused packed-visit slots resolves to these (det 0, never wins)
    tf = np.concatenate([tf, np.zeros((W, F_ROWS), np.float32)])

    # --- spheres (single-level clusters of K, as before) ---
    S = num_spheres
    c = np.asarray(tables.s_center, np.float64)[:S].reshape(-1, 3)
    r = np.asarray(tables.s_radius, np.float64)[:S].reshape(-1)
    if S == 0:
        c = np.zeros((1, 3))
        r = np.zeros((1,))
        S = 1
    if num_spheres > SPH_BRUTE_MAX:
        # hybrid split: the SPH_BRUTE_MAX largest spheres go to the
        # exact XLA path (stable order by descending radius); the rest
        # stay in kernel clusters
        by_radius = np.argsort(-np.abs(r), kind="stable")
        brute_ids = np.sort(by_radius[:SPH_BRUTE_MAX]).astype(np.int32)
        kern_ids = np.sort(by_radius[SPH_BRUTE_MAX:]).astype(np.int32)
    else:
        brute_ids = np.zeros((0,), np.int32)
        kern_ids = np.arange(S, dtype=np.int32)
    ck = c[kern_ids]
    rk = r[kern_ids]
    r3 = np.abs(rk)[:, None].astype(np.float32)
    smin = ck.astype(np.float32) - r3
    smax = ck.astype(np.float32) + r3
    sorder = _median_split_order(smin, smax, K)
    stotal = max((kern_ids.shape[0] + K - 1) // K, 1) * K
    sph_cmin, sph_cmax = _aabbs_of(smin, smax, sorder, K, stotal)
    sph_perm = np.concatenate(
        [kern_ids[sorder],
         np.zeros(stotal - sorder.shape[0], np.int32)]).astype(np.int32)
    sf = np.zeros((SPH_FEATURES, stotal), np.float64)
    c_o, r_o = ck[sorder], rk[sorder]
    ns = sorder.shape[0]
    sf[0:3, :ns] = c_o.T
    sf[3, :ns] = np.einsum("sd,sd->s", c_o, c_o) - r_o * r_o
    sf[4, :ns] = 1.0  # validity lane (pad spheres invalid)

    # The kernel carries the winning primitive slot in an f32 scratch lane;
    # slots above 2^24 are not exactly representable and would silently
    # shade the wrong primitive.
    if total >= (1 << 24) or stotal >= (1 << 24):
        raise ValueError(
            "flash intersector carries primitive slots in f32: "
            f"padded counts (tris {total}, spheres {stotal}) "
            "must stay below 2^24")

    wmin = np.minimum(tri_cmin.min(0), sph_cmin.min(0))
    wmax = np.maximum(tri_cmax.max(0), sph_cmax.max(0))

    # --- baked unified shade table (see FlashAccel.shade) ---
    tpm = np.concatenate([order, np.zeros(total - order.shape[0], np.int32)])
    g = lambda name: np.asarray(getattr(tables, name), np.float32)
    tri_shade = np.concatenate([
        g("tri_na")[tpm], g("tri_nb")[tpm], g("tri_nc")[tpm],
        g("tri_ua")[tpm], g("tri_ub")[tpm], g("tri_uc")[tpm],
        g("tri_pa")[tpm], g("tri_pb")[tpm], g("tri_pc")[tpm],
        np.asarray(tables.tri_material)[tpm][:, None].astype(np.float32)],
        axis=1)
    if num_spheres <= SPH_BRUTE_MAX:
        spm = np.arange(np.asarray(tables.s_center).shape[0])
    else:
        # kernel-ordered rows [0, stotal), then the brute set's rows
        spm = np.concatenate(
            [kern_ids[sorder],
             np.zeros(stotal - sorder.shape[0], np.int32),
             brute_ids]).astype(np.int32)
    sph_shade = np.concatenate([
        g("s_center")[spm], g("s_radius")[spm][:, None],
        np.zeros((spm.shape[0], 20), np.float32),
        np.asarray(tables.s_material)[spm][:, None].astype(np.float32)],
        axis=1)
    shade = np.concatenate([tri_shade, sph_shade], axis=0)

    return FlashAccel(
        tri_flat=jnp.asarray(tf),
        tri_perm=jnp.asarray(tri_perm),
        tri_cmin=jnp.asarray(tri_cmin), tri_cmax=jnp.asarray(tri_cmax),
        tri_cmin16=jnp.asarray(tri_cmin16), tri_cmax16=jnp.asarray(tri_cmax16),
        sph_feats=jnp.asarray(sf.T, jnp.float32),
        sph_perm=jnp.asarray(sph_perm),
        sph_cmin=jnp.asarray(sph_cmin), sph_cmax=jnp.asarray(sph_cmax),
        sph_brute=jnp.asarray(brute_ids),
        sph_brute_center=jnp.asarray(c[brute_ids].astype(np.float32)),
        sph_brute_radius=jnp.asarray(r[brute_ids].astype(np.float32)),
        shade=jnp.asarray(shade),
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
    # one stable pair sort (inf sorts last) — argsort + take_along_axis
    # was ~15 us/pass of scalarized gather on the 30-cluster more_balls
    # sphere queue (same fix as the triangle overflow tail)
    entry_sorted, ids = jax.lax.sort(
        (entry, jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[None],
                                 (nb, c))),
        dimension=1, is_stable=True, num_keys=1)
    entry_sorted = jnp.where(jnp.isfinite(entry_sorted), entry_sorted, BIG)
    return counts[:, None], ids, entry_sorted


def _block_ray_bounds(rays: RayBatch, nb: int, block: int):
    """Per-block conservative ray bundle: origin box, direction box and t
    interval over the LIVE rays of each block (dead lanes, t_max < t_min,
    are excluded so retired rays never widen the bundle).

    Only r3-proven shapes: (B, 3) -> (NB, block, 3) major-dim reshapes and
    reductions — no minor-dim relayouts (the earlier per-ray lanes-major
    child test spawned an async-copy storm inside the bounce while_loop
    that tripled frame time).
    """
    live = rays.t_max >= rays.t_min   # (B,)
    big = jnp.float32(3e38)

    # Per-COMPONENT (B,) reductions: reshaping the (B, 3) arrays to
    # (NB, block, 3) is bitcast-free only in the row-major {1,0} layout,
    # and XLA's layout assignment then flips the whole bounce loop's ray
    # state to {1,0:T(8,128)} — 3 useful lanes out of 128 on EVERY
    # elementwise op (measured: 12x slowdown of the shade fusions, 2.5x
    # on the frame). (B,) vectors reshape to (NB, block) cheaply and
    # constrain nothing.
    # reshape to (NB, block//128, 128): the minor (.., 128) axis matches
    # the lane tile of the (B,) T(1024) layout, so the reshape stays a
    # view and the block reduction is a native sublane+lane reduce (the
    # flat (NB, block) reshape relayouts every component — measured
    # ~0.3 ms per bounce pass across the 14 reductions)
    def mn(x):
        return jnp.min(jnp.where(live, x, big).reshape(nb, block // 128, 128),
                       axis=(1, 2))

    def mx(x):
        return jnp.max(jnp.where(live, x, -big).reshape(nb, block // 128, 128),
                       axis=(1, 2))

    omin = jnp.stack([mn(rays.origin[:, a]) for a in range(3)], axis=1)
    omax = jnp.stack([mx(rays.origin[:, a]) for a in range(3)], axis=1)
    dmin = jnp.stack([mn(rays.direction[:, a]) for a in range(3)], axis=1)
    dmax = jnp.stack([mx(rays.direction[:, a]) for a in range(3)], axis=1)
    t0 = mn(rays.t_min)
    t1 = mx(rays.t_max)
    return omin, omax, dmin, dmax, t0, t1


def _interval_slab(bounds, cmin, cmax):
    """Conservative slab test of each block's ray BUNDLE against every box.

    Interval arithmetic over the bundle (origin box x direction box x t
    interval): if ANY live ray of the block can enter the box, the box is
    kept. An axis whose direction interval straddles zero is treated as
    non-constraining (conservative). Tight for coherent camera tiles
    (point origin, narrow cone); loose for post-bounce tiles, where it
    degrades toward whole-parent visits — the r3 behavior, not worse.

    bounds: _block_ray_bounds output; cmin/cmax (C, 3) global boxes.
    Returns (entered (NB, C), entry (NB, C) conservative entry t).
    """
    omin, omax, dmin, dmax, tlo, thi = bounds
    nbk = omin.shape[0]
    c = cmin.shape[0]
    lo = jnp.broadcast_to(tlo[:, None], (nbk, c))
    hi = jnp.broadcast_to(thi[:, None], (nbk, c))
    for a in range(3):
        # interval quotient ( [cmin,cmax] - [omin,omax] ) / [dmin,dmax]:
        # evaluate all four corner quotients against both d endpoints and
        # take the envelope; a zero-straddling direction interval makes
        # the axis unconstrained.
        num_lo = cmin[None, :, a] - omax[:, a, None]        # (NB, C)
        num_hi = cmax[None, :, a] - omin[:, a, None]
        straddle = (dmin[:, a, None] <= 0.0) & (dmax[:, a, None] >= 0.0)
        inv1 = 1.0 / jnp.where(dmin[:, a, None] == 0.0, 1.0, dmin[:, a, None])
        inv2 = 1.0 / jnp.where(dmax[:, a, None] == 0.0, 1.0, dmax[:, a, None])
        q = [num_lo * inv1, num_lo * inv2, num_hi * inv1, num_hi * inv2]
        near = jnp.minimum(jnp.minimum(q[0], q[1]), jnp.minimum(q[2], q[3]))
        far = jnp.maximum(jnp.maximum(q[0], q[1]), jnp.maximum(q[2], q[3]))
        near = jnp.where(straddle | jnp.isnan(near), -jnp.inf, near)
        far = jnp.where(straddle | jnp.isnan(far), jnp.inf, far)
        lo = jnp.maximum(lo, near)
        hi = jnp.minimum(hi, far)
    return hi >= lo, lo


def build_packed_queue(rays: RayBatch, accel: FlashAccel, block: int = R):
    """Two-level front-to-back queue per block.

    Returns (n_pk (NB,1), n_tail (NB,1), tail_ids (NB, tail_cap),
    qf_pk (NB, p_eff), qf_tail (NB, tail_cap), child_ids (NB, cap_c))
    where p_eff = min(TOP_P, #parents) and cap_c = p_eff * CPP.
    """
    b = rays.origin.shape[0]
    nb = b // block
    cp = accel.tri_cmin.shape[0]
    csub = accel.tri_cmin16.shape[0]
    p_eff = min(TOP_P, cp)
    cap_c = p_eff * CPP          # children coverable by packed visits
    nsub = (accel.tri_flat.shape[0] - W) // W

    # exact per-ray parent test in the r3-proven (B, Cp) layout, reduced
    # to block granularity by a major-dim reshape (free — minor-dim
    # relayouts inside the bounce while_loop spawn an async-copy storm)
    entered_p, lo_p = slab_test(rays, accel.tri_cmin, accel.tri_cmax)
    entb = entered_p.reshape(nb, block, cp)
    blk_any = jnp.any(entb, axis=1)                         # (NB, Cp)
    blk_lo = jnp.min(jnp.where(entb, lo_p.reshape(nb, block, cp), jnp.inf),
                     axis=1)
    entry_p = jnp.where(blk_any, blk_lo, jnp.inf)

    # conservative child refinement at BLOCK granularity: interval slab of
    # the block's ray bundle vs all child AABBs — tiny (NB, Csub) arrays.
    # A child counts only if its parent was per-ray entered; its entry is
    # the tighter of the interval bound and the parent's exact entry.
    bounds = _block_ray_bounds(rays, nb, block)
    ent_c, lo_c = _interval_slab(bounds, accel.tri_cmin16, accel.tri_cmax16)
    child_ok = ent_c & jnp.repeat(blk_any, CPP, axis=1)
    centry = jnp.where(
        child_ok, jnp.maximum(lo_c, jnp.repeat(entry_p, CPP, axis=1)),
        jnp.inf)                                            # (NB, Csub)
    # nearest cap_c children front-to-back via top_k (a full argsort of
    # the (NB, Csub) matrix was ~0.4 ms per bounce pass — 2 of the top-5
    # ops in the frame profile; only the nearest cap_c entries matter)
    neg_entry, top_idx = jax.lax.top_k(-centry, cap_c)      # (NB, cap_c)
    centry_sorted = -neg_entry                              # ascending
    cid_sorted = top_idx.astype(jnp.int32)
    n_c = jnp.minimum(jnp.sum(child_ok, axis=1).astype(jnp.int32), cap_c)

    live = jnp.arange(cap_c, dtype=jnp.int32)[None, :] < n_c[:, None]
    gidx = jnp.where(live, cid_sorted, nsub)                # sentinel row
    n_pk = (n_c + CPP - 1) // CPP
    qf_pk = centry_sorted[:, ::CPP]                         # (NB, p_eff)
    qf_pk = jnp.where(jnp.isfinite(qf_pk), qf_pk, BIG)

    # coarse tail for correctness under overflow: any parent owning an
    # entered child that did NOT fit in the packed capacity is visited
    # whole (front-to-back, after the packed visits, where early
    # termination usually skips it). Ties at the cutoff may re-test a
    # packed child's parent — idempotent, never wrong.
    if csub > cap_c:
        thr = centry_sorted[:, -1:]                         # (NB, 1)
        overflow = child_ok & (centry >= thr)
        par_over = jnp.any(overflow.reshape(nb, cp, CPP), axis=2)
        tail_entry = jnp.where(par_over, entry_p, jnp.inf)
        # ONE stable multi-operand sort carrying the ids alongside the
        # keys: the previous argsort + two take_along_axis cost 4.3 ms per
        # frame (two of the top-6 ops in the r5 trace — take_along_axis on
        # a (NB, Cp) matrix lowers to an ~8 ns/element scalarized gather),
        # while lax.sort permutes the id operand in the sort network
        # itself for ~0.1 ms. is_stable keeps tie order identical to the
        # stable argsort: bit-identical images.
        tail_sorted, tail_ids = jax.lax.sort(
            (tail_entry,
             jnp.broadcast_to(jnp.arange(cp, dtype=jnp.int32)[None],
                              (nb, cp))),
            dimension=1, is_stable=True, num_keys=1)
        qf_tail = jnp.where(jnp.isfinite(tail_sorted), tail_sorted, BIG)
        n_tail = jnp.sum(par_over, axis=1).astype(jnp.int32)
    else:
        tail_ids = jnp.zeros((nb, 0), jnp.int32)
        qf_tail = jnp.zeros((nb, 0), jnp.float32)
        n_tail = jnp.zeros((nb,), jnp.int32)

    # No feature gather here: the kernel assembles each packed visit's
    # (K, F_ROWS) tile itself from 8 W-row dynamic slices of the
    # VMEM-resident feature table, driven by these SMEM child ids
    # (sentinel = nsub points at the table's zero pad rows: det 0, slot 0,
    # never wins). The r4 design gathered (NB, p_eff*K, F_ROWS) tiles in
    # XLA and DMA'd them per block — ~3.7 ms/frame of gather plus a
    # per-slot shipping cost (~13 ms/frame/slot at r4 capacities) that
    # made sentinel rows as expensive as real ones and forced TOP_P down
    # to 2. In-kernel assembly reads only VMEM and scales with the VISITS
    # TAKEN, not the static capacity.
    return n_pk[:, None], n_tail[:, None], tail_ids, qf_pk, qf_tail, gidx


# ------------------------------------------------------------------ kernel


class _KCfg(NamedTuple):
    """Static kernel configuration (python ints/bools, fixed per trace)."""

    v_cap: int        # packed visit capacity (p_eff)
    tail_cap: int     # coarse tail capacity (Cp - p_eff)
    has_sph: bool     # in-kernel sphere phase present
    cs: int           # sphere cluster count (0 if not has_sph)

    @property
    def qi_child_off(self):
        # [n_pk, n_tail, n_sph, child ids..., tail ids..., sph ids...]
        return 3

    @property
    def qi_tail_off(self):
        return 3 + self.v_cap * CPP

    @property
    def qi_sph_off(self):
        return self.qi_tail_off + self.tail_cap

    @property
    def qf_tail_off(self):
        return self.v_cap  # [packed entries, tail entries, sph entries]

    @property
    def qf_sph_off(self):
        return self.v_cap + self.tail_cap


G = 8  # ray blocks (queues) per grid step. The pipeline's per-step cost
       # (operand DMA descriptors + semaphore waits) measured ~5-10 us —
       # comparable to a whole block's visit compute after the two-level
       # queue cut visits ~3x — so each grid step drains G blocks
       # back-to-back, amortizing the step cost 8x. Scratch is reused
       # sequentially across the G sub-blocks.


def _make_flash_kernel(cfg: _KCfg):
    def _flash_kernel(qi_ref, qf_ref, rays_ref, tri_ref,
                      sph_ref, out_ref, colt, cols, rbest):
        prim = jax.lax.broadcasted_iota(jnp.int32, (K, R), 0)
        for g in range(G):
            _process_block(cfg, g, prim, qi_ref, qf_ref, rays_ref,
                           tri_ref, sph_ref, out_ref, colt,
                           cols, rbest)

    return _flash_kernel


def _process_block(cfg: _KCfg, g: int, prim, qi_ref, qf_ref, rays_ref,
                   tri_ref, sph_ref, out_ref, colt, cols, rbest):
    """One 512-ray block (sub-block g of the grid step): drain packed child
    visits, then coarse tail parents, then (optionally) sphere clusters.

    TRANSPOSED orientation: every tile is (primitives, rays) — ray columns
    of the (RAY_COLS, G*R) operand broadcast across sublanes, per-prim
    feature columns broadcast across lanes. This puts rays/prims on the
    LANE axis of every operand the custom call pins to row-major layout,
    so XLA's layout assignment keeps the integrator's ray state in its
    natural lane-major {0,1} layout. (The rays-major interface made the
    whole bounce loop flip to {1,0:T(8,128)} — 3 useful lanes of 128 on
    every elementwise op, a 2.5x frame regression.)

    Queue rows are merged into two SMEM arrays (int: [n_pk, n_tail, n_sph,
    tail ids, sph ids], float: [packed entries, tail entries, sph
    entries]) so each grid step issues 2 SMEM block DMAs — one (G, width)
    row block each, row g belonging to sub-block g (G = 8 also satisfies
    Mosaic's 8-sublane SMEM block rule; a (1, L) block does not lower —
    the round-1 bench regression).
    """
    row = g
    r0 = g * R
    rs = slice(r0, r0 + R)
    ox = rays_ref[0:1, rs]
    oy = rays_ref[1:2, rs]
    oz = rays_ref[2:3, rs]
    dx = rays_ref[3:4, rs]
    dy = rays_ref[4:5, rs]
    dz = rays_ref[5:6, rs]
    t_min = rays_ref[6:7, rs]
    t_max = rays_ref[7:8, rs]
    # m = d x o, derived here instead of shipped: the same per-ray m
    # feeds every triangle's edge functions, so the watertight
    # exact-negation argument (shared-edge features negate exactly,
    # and negation commutes with any fixed contraction of U) is
    # unaffected by WHERE m is computed.
    mx = dy * oz - dz * oy
    my = dz * ox - dx * oz
    mz = dx * oy - dy * ox

    prim_f = prim.astype(jnp.float32)

    # ---------------- sphere phase (first) ----------------
    # Spheres run before triangles so every lane's sphere hit bounds the
    # triangle walk (the reference's t_max-shrinking ordered descent,
    # src/bvh.rs:106-112, across primitive types). Scenes with few spheres
    # never reach this phase: their sphere bound arrives pre-folded into
    # t_max by the XLA-side brute test (cfg.has_sph False).
    #
    # All phases are fully guarded on their visit count: a block whose
    # queues are empty (sky tiles, retired-ray tiles) writes its miss
    # defaults and does NO (K, R)-wide work. Payload scratch (cols) is
    # never initialized: lanes the masked-sum extraction reads are exactly
    # the lanes a visit wrote, and when a phase finds no hit (t stays BIG)
    # the extracted garbage payload is discarded downstream (hit.valid
    # False => the integrator's sanitize pass masks every field).
    if cfg.has_sph:
        n_sph = qi_ref[row, 2]

        @pl.when(n_sph == 0)
        def _():
            out_ref[2:3, rs] = jnp.full((1, R), BIG, jnp.float32)
            out_ref[3:4, rs] = jnp.zeros((1, R), jnp.float32)

        def sph_body(j, _):
            far = jnp.max(jnp.minimum(rbest[:], t_max))

            @pl.when(qf_ref[row, cfg.qf_sph_off + j] < far)
            def _():
                ci = qi_ref[row, cfg.qi_sph_off + j]
                sl = pl.ds(pl.multiple_of(ci * K, K), K)
                cx = sph_ref[sl, 0:1]
                cy = sph_ref[sl, 1:2]
                cz = sph_ref[sl, 2:3]
                cc = sph_ref[sl, 3:4]
                ok_lane = sph_ref[sl, 4:5]

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
                cols[:] = jnp.where(improve, ci * K + prim_f, cols[:])
                rbest[:] = jnp.minimum(rbest[:],
                                       jnp.min(key, axis=0, keepdims=True))

            return 0

        @pl.when(n_sph > 0)
        def _():
            colt[:] = jnp.full((K, R), BIG, jnp.float32)
            rbest[:] = jnp.full((1, R), BIG, jnp.float32)
            jax.lax.fori_loop(0, n_sph, sph_body, 0)

            s_t = rbest[:]
            at_min = colt[:] == s_t
            win = jnp.min(jnp.where(at_min, prim, jnp.int32(1 << 30)),
                          axis=0, keepdims=True)
            mask = at_min & (prim == win)
            out_ref[2:3, rs] = s_t
            out_ref[3:4, rs] = jnp.sum(jnp.where(mask, cols[:], 0.0), axis=0,
                                       keepdims=True)

        sph_t = out_ref[2:3, rs]
    else:
        out_ref[2:3, rs] = jnp.full((1, R), BIG, jnp.float32)
        out_ref[3:4, rs] = jnp.zeros((1, R), jnp.float32)
        sph_t = None

    out_ref[4:8, rs] = jnp.zeros((4, R), jnp.float32)

    # ---------------- triangle phases ----------------
    n_pk = qi_ref[row, 0]
    n_tail = qi_ref[row, 1]

    def tri_visit(tile, r0: int = 0, rows: int = K):
        """One (rows, F_ROWS) feature tile against all R rays, updating
        prim rows [r0, r0 + rows) of the running best (r0/rows static).

        Watertight Moller-Trumbore (Woop, Benthin & Wald 2013 edge tests;
        BASELINE north-star upgrade over the reference's Cramer form,
        src/hittable.rs:65-108) in bilinear form: the sheared 2D edge
        function of edge (P, Q) is, up to one positive per-ray scale,
        U = d.(PxQ) + m.(P-Q) with m = dxo. Adjacent triangles carry
        exactly-negated (PxQ, P-Q) features for their shared edge
        (build_flash_accel), and negation commutes with correctly-rounded
        FMA arithmetic, so their U values are exact fp negations: a ray
        crossing the shared edge is accepted by at least one triangle,
        whatever the compiler's contraction policy. Barycentrics are not
        computed here — the epilogue re-derives them for the winner only.
        """
        U = (dx * tile[:, 0:1] + dy * tile[:, 1:2] + dz * tile[:, 2:3]
             + mx * tile[:, 3:4] + my * tile[:, 4:5] + mz * tile[:, 5:6])
        V = (dx * tile[:, 6:7] + dy * tile[:, 7:8] + dz * tile[:, 8:9]
             + mx * tile[:, 9:10] + my * tile[:, 10:11] + mz * tile[:, 11:12])
        Wf = (dx * tile[:, 12:13] + dy * tile[:, 13:14] + dz * tile[:, 14:15]
              + mx * tile[:, 15:16] + my * tile[:, 16:17] + mz * tile[:, 17:18])
        det = U + V + Wf
        same_sign = (((U >= 0.0) & (V >= 0.0) & (Wf >= 0.0))
                     | ((U <= 0.0) & (V <= 0.0) & (Wf <= 0.0)))
        det_ok = det != 0.0
        inv_det = jnp.where(det_ok, 1.0, 0.0) / jnp.where(det_ok, det, 1.0)
        # t from the plane equation: t = (o.n - s_t) / det, since
        # det = U+V+W = -d.n exactly in real arithmetic
        o_n = (ox * tile[:, 18:19] + oy * tile[:, 19:20] + oz * tile[:, 20:21])
        tt = (o_n - tile[:, 21:22]) * inv_det
        valid = (det_ok & same_sign & (tt >= t_min) & (tt <= t_max))
        key = jnp.where(valid, tt, BIG)

        improve = key < colt[r0:r0 + rows, :]
        colt[r0:r0 + rows, :] = jnp.where(improve, key,
                                          colt[r0:r0 + rows, :])
        cols[r0:r0 + rows, :] = jnp.where(
            improve,
            jnp.broadcast_to(tile[:, SLOT_ROW:SLOT_ROW + 1], (rows, R)),
            cols[r0:r0 + rows, :])
        rbest[:] = jnp.minimum(rbest[:],
                               jnp.min(key, axis=0, keepdims=True))

    def tri_far():
        fb = jnp.minimum(rbest[:], t_max)
        if sph_t is not None:
            fb = jnp.minimum(fb, sph_t)
        return jnp.max(fb)

    @pl.when((n_pk == 0) & (n_tail == 0))
    def _():
        out_ref[0:1, rs] = jnp.full((1, R), BIG, jnp.float32)
        out_ref[1:2, rs] = jnp.zeros((1, R), jnp.float32)

    @pl.when((n_pk > 0) | (n_tail > 0))
    def _():
        colt[:] = jnp.full((K, R), BIG, jnp.float32)
        rbest[:] = jnp.full((1, R), BIG, jnp.float32)

        # Packed visits: statically unrolled over the (small, static)
        # capacity, each guarded BOTH on the count and on front-to-back
        # early termination (skip once every live lane's best hit, sphere
        # bound included, precedes this visit's entry). The guards NEST so
        # tri_far() — a vector->scalar reduction — is only evaluated for
        # visit slots below the count (~1.4 of the capacity on the bunny
        # camera pass), not for every unrolled slot. The (K, F_ROWS) tile
        # is assembled HERE from 8 W-row dynamic slices of the
        # VMEM-resident feature table (child ids from SMEM): a visit that
        # is skipped reads nothing, so capacity slots cost only SMEM
        # width — unlike the r4 XLA-side gather, which shipped every
        # slot's (K, F_ROWS) tile (sentinels included) into the kernel
        # per block (~13 ms/frame/slot).
        for j in range(cfg.v_cap):
            @pl.when(j < n_pk)
            def _(j=j):
                @pl.when(qf_ref[row, j] < tri_far())
                def _(j=j):
                    # one (W, F_ROWS) subtile per child, updating its own
                    # W prim rows of the running best — no (K, F_ROWS)
                    # concat materialization
                    for k in range(CPP):
                        ci = qi_ref[row, cfg.qi_child_off + j * CPP + k]
                        tri_visit(
                            tri_ref[pl.ds(pl.multiple_of(ci * W, W), W), :],
                            r0=k * W, rows=W)

        if cfg.tail_cap > 0:
            def tail_body(j, _):
                @pl.when(qf_ref[row, cfg.qf_tail_off + j] < tri_far())
                def _():
                    p = qi_ref[row, cfg.qi_tail_off + j]
                    sl = pl.ds(pl.multiple_of(p * K, K), K)
                    tri_visit(tri_ref[sl, :])

                return 0

            jax.lax.fori_loop(0, n_tail, tail_body, 0)

        # one winner extraction per block (not per visit): rbest is the min
        # of colt's sublane columns; pick the lowest winning prim row,
        # payload via masked sums
        tri_t = rbest[:]
        at_min = colt[:] == tri_t
        win = jnp.min(jnp.where(at_min, prim, jnp.int32(1 << 30)),
                      axis=0, keepdims=True)
        mask = at_min & (prim == win)
        out_ref[0:1, rs] = tri_t
        out_ref[1:2, rs] = jnp.sum(jnp.where(mask, cols[:], 0.0), axis=0,
                                   keepdims=True)


def _sphere_brute_xla(centers, radii, rays: RayBatch):
    """Exact closest sphere hit over a (small) sphere set, in XLA.

    Fully differentiable (unlike the kernel phase whose outputs are
    detached): center/radius gradients flow through the winning t.
    Returns (s_t (B,), s_slot (B,) int32 index into `centers`,
    s_hit (B,) bool).
    """
    st, s_valid = sphere_hit_t(
        centers[None, :, :], radii[None, :],
        rays.origin[:, None, :], rays.direction[:, None, :],
        rays.t_min[:, None], rays.t_max[:, None])
    key = jnp.where(s_valid, st, BIG)
    # min + argmin as pure reductions: a take_along_axis here is a (B,)
    # permutation gather per bounce pass (~0.26 ms per 2^15 chunk — more
    # than the whole sphere test); sphere_hit_t already returns BIG for
    # invalid lanes, so s_t < BIG doubles as the hit mask.
    s_t = jnp.min(key, axis=1)
    s_best = jnp.argmin(key, axis=1).astype(jnp.int32)
    s_hit = s_t < BIG
    return s_t, s_best, s_hit


def _flash_raw(accel: FlashAccel, rays: RayBatch, interpret: bool = False,
               tables=None):
    """Queue build + kernel launch; returns (out (OUT_COLS, B) raw hit
    records, rows [tri_t, tri_slot, sph_t, sph_slot, 0...], unpadded count b,
    xla-sphere tuple or None).

    When the scene's sphere count is <= SPH_BRUTE_MAX (and `tables` is
    provided), spheres are resolved by an exact XLA test whose bound is
    folded into t_max before the queue build — triangle clusters behind
    the nearest sphere hit are never visited.
    """
    padded, b = _pad_rays(rays, R * G)  # G queue rows per grid step
    bp = padded.origin.shape[0]
    nb = bp // R

    # XLA-brute sphere set: ALL spheres when the scene is small, the
    # SPH_BRUTE_MAX largest when it is not (hybrid split — see
    # FlashAccel.sph_brute). Either way their closest-hit bound folds
    # into t_max BEFORE the queue build, so clusters behind them are
    # never visited.
    sph_kernel = accel.num_spheres > SPH_BRUTE_MAX
    sph_xla = None
    if not sph_kernel and tables is not None:
        s_t, s_slot, s_hit = _sphere_brute_xla(tables.s_center,
                                               tables.s_radius, padded)
        sph_xla = (s_t[:b], s_slot[:b], s_hit[:b])
        # detached fold: the queue build and kernel are not differentiated
        # (kernel outputs are stop_gradient'ed); gradients reach the
        # sphere through the epilogue's use of s_t itself
        padded = padded._replace(
            t_max=jnp.minimum(padded.t_max, jax.lax.stop_gradient(s_t)))
    elif sph_kernel and accel.sph_brute.shape[0] > 0:
        # hybrid: tables (differentiable) when available, baked constants
        # otherwise (the tables-free tooling path)
        if tables is not None:
            centers = tables.s_center[accel.sph_brute]
            radii = tables.s_radius[accel.sph_brute]
        else:
            centers = accel.sph_brute_center
            radii = accel.sph_brute_radius
        s_t, s_slot, s_hit = _sphere_brute_xla(centers, radii, padded)
        sph_xla = (s_t[:b], s_slot[:b], s_hit[:b])
        padded = padded._replace(
            t_max=jnp.minimum(padded.t_max, jax.lax.stop_gradient(s_t)))

    # Assemble the TRANSPOSED (RAY_COLS, B) kernel operand from component
    # vectors: with rays on the LANE axis, pallas's mandated row-major
    # layout on this operand coincides with the lane-major {0,1} layout
    # XLA naturally picks for the integrator's ray state, so stacking the
    # (B,) rows is a free concatenation — no layout-assignment conflict.
    # (The rays-major (B, RAY_COLS) interface made XLA flip the whole
    # bounce loop's ray state to {1,0:T(8,128)} — 3 useful lanes of 128 —
    # a ~2.5x frame regression.)
    o0, o1, o2 = (padded.origin[:, a] for a in range(3))
    d0, d1, d2 = (padded.direction[:, a] for a in range(3))
    packed_rays = jnp.stack(
        [o0, o1, o2, d0, d1, d2, padded.t_min, padded.t_max], axis=0)

    n_pk, n_tail, tail_ids, qf_pk, qf_tail, child_ids = \
        build_packed_queue(padded, accel)
    cp = accel.tri_cmin.shape[0]
    p_eff = min(TOP_P, cp)

    if sph_kernel:
        sn, scodes, sentry = build_block_queue(padded, accel.sph_cmin,
                                               accel.sph_cmax)
        cs = accel.sph_cmin.shape[0]
    else:
        sn = jnp.zeros((nb, 1), jnp.int32)
        scodes = jnp.zeros((nb, 0), jnp.int32)
        sentry = jnp.zeros((nb, 0), jnp.float32)
        cs = 0

    # tail exists only when the child set can exceed the packed capacity
    cfg = _KCfg(v_cap=p_eff, tail_cap=tail_ids.shape[1], has_sph=sph_kernel,
                cs=cs)

    # merge per-block queue arrays into two (one int, one float): 2 SMEM
    # block DMAs per grid step
    qi = jnp.concatenate([n_pk, n_tail, sn, child_ids, tail_ids, scodes],
                         axis=1)
    qf = jnp.concatenate([qf_pk, qf_tail, sentry], axis=1)
    qi, qf = _pad_queue_rows([qi, qf], nb)

    def smem(arr):
        # one (G, width) row block per grid step — row g belongs to
        # sub-block g (G = 8 also satisfies Mosaic's 8-sublane SMEM rule)
        return pl.BlockSpec((G, arr.shape[1]), lambda i: (i, 0),
                            memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        _make_flash_kernel(cfg),
        grid=(nb // G,),
        in_specs=[smem(qi), smem(qf),
                  pl.BlockSpec((RAY_COLS, G * R), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((OUT_COLS, G * R), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT_COLS, bp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K, R), jnp.float32),
                        pltpu.VMEM((K, R), jnp.float32),
                        pltpu.VMEM((1, R), jnp.float32)],
        interpret=interpret,
    )(*jax.tree_util.tree_map(
        # The kernel's outputs are detached (intersect_flash stop_gradients
        # them), so detaching its INPUTS is mathematically identical — and
        # necessary: pallas_call has no JVP rule, and under jax.grad of a
        # render whose rays depend on scene parameters (e.g. a fuzz/IOR
        # gradient moving bounce directions) the queue arrays would carry
        # tangents straight into the kernel and fail to trace.
        jax.lax.stop_gradient,
        (qi, qf, packed_rays, accel.tri_flat, accel.sph_feats)))
    return out, b, sph_xla


def intersect_flash(accel: FlashAccel, tables, rays: RayBatch,
                    interpret: bool = False) -> HitBatch:
    """Closest hit over all scene primitives via the flash kernel.

    Gradient conventions: the kernel's outputs (t and winning slots) are
    detached (stop_gradient), and the geometry/attribute shade table is
    baked into the accel (constant). Scene-parameter gradients — every
    optimizer field in diff/optimize.py DIFFERENTIABLE_FIELDS (atlas,
    colors, material params, background) — flow through the material/
    texture evaluation downstream of the HitBatch, which only needs the
    hit's VALUES (uv, normal, material id), not their derivatives; the
    XLA sphere test's t additionally carries center/radius gradients.
    Not differentiable: d(hit decision)/d(geometry) — same as every
    accel here. Pinned vs finite differences on both brute and flash in
    tests/test_gradients.py.
    """
    out, b, sph_xla = _flash_raw(accel, rays, interpret, tables=tables)
    out = jax.lax.stop_gradient(out[:, :b])   # (OUT_COLS, B): rows are
    # contiguous lane-major (B,) vectors — free to slice downstream

    ntp = accel.tri_perm.shape[0]
    nsp = accel.shade.shape[0] - ntp
    unified = accel.shade

    tr_t = out[0]
    tr_slot = jnp.clip(out[1].astype(jnp.int32), 0, ntp - 1)
    tr_hit = tr_t < BIG
    sph_kernel = accel.num_spheres > SPH_BRUTE_MAX
    if sph_kernel:
        stotal = accel.sph_perm.shape[0]
        k_t = out[2]
        k_slot = jnp.clip(out[3].astype(jnp.int32), 0, stotal - 1)
        k_hit = k_t < BIG
        if sph_xla is None:
            s_t, s_slot, s_hit = k_t, k_slot, k_hit
        else:
            # hybrid: the XLA-tested largest spheres vs the kernel's small
            # ones; XLA rows sit after the kernel-ordered rows in `shade`
            x_t, x_idx, x_hit = sph_xla
            x_wins = x_hit & (~k_hit | (x_t <= k_t))
            s_t = jnp.where(x_wins, x_t, k_t)
            s_slot = jnp.where(x_wins, stotal + x_idx, k_slot)
            s_hit = x_hit | k_hit
    else:
        s_t, s_slot, s_hit = sph_xla

    o = rays.origin
    d = rays.direction
    sphere_wins = s_hit & (~tr_hit | (s_t <= tr_t))
    uslot = jnp.where(sphere_wins, ntp + s_slot, tr_slot)
    # ONE per-ray row gather, transposed to (26, B) THROUGH A DOT with a
    # constant selector so every downstream value is a full-lane (B,)
    # row. Two traps this dodges (both measured):
    # - working on (B, 25) column slices anchors the whole bounce loop's
    #   ray state to {1,0:T(8,128)} — 3 useful lanes of 128, 2.5x frame;
    # - a plain .T is absorbed as a LAYOUT, and every row extraction
    #   then reads stride-25 elements (~32 ms/frame across ~9 rows).
    # The dot forces one real materialization in row-contiguous layout on
    # the MXU (52 MFLOP — trivial); the selector is (26, 25) rather than
    # square identity so the algebraic simplifier cannot fold it back
    # into a transpose.
    g = unified[uslot]                      # (B, 25) {1,0}
    sel = jnp.concatenate(
        [jnp.eye(25, dtype=jnp.float32), jnp.zeros((1, 25), jnp.float32)])
    gt = jax.lax.dot_general(sel, g, (((1,), (1,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST)  # (26, B)
    # HIGHEST: the TPU's default matmul precision truncates operands to
    # bf16 — silent corruption of normals/corners; with exact 0/1
    # selector entries and full precision the products are exact.

    s_t_safe = jnp.where(s_hit, s_t, 1.0)
    tr_t_safe = jnp.where(tr_hit, tr_t, 1.0)

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    # ---- triangle fields: re-derive (u, v) for the winner only ----
    # Cramer triple products (ops/intersect.py triangle_hit_t): u weights
    # pb, v weights pc. ~40 flops per ray — vastly cheaper than tracking
    # u,v per pair test in the kernel. Degenerate/garbage rows (miss
    # lanes) guard det == 0. All component-wise (B,) math.
    pax, pay, paz = gt[15], gt[16], gt[17]
    bax, bay, baz = pax - gt[18], pay - gt[19], paz - gt[20]
    cax, cay, caz = pax - gt[21], pay - gt[22], paz - gt[23]
    pox, poy, poz = pax - ox, pay - oy, paz - oz
    # ca x d
    cdx = cay * dz - caz * dy
    cdy = caz * dx - cax * dz
    cdz = cax * dy - cay * dx
    det = bax * cdx + bay * cdy + baz * cdz
    det_ok = det != 0.0
    inv_det = jnp.where(det_ok, 1.0, 0.0) / jnp.where(det_ok, det, 1.0)
    tr_u = (pox * cdx + poy * cdy + poz * cdz) * inv_det
    # ba x pa_o
    bpx = bay * poz - baz * poy
    bpy = baz * pox - bax * poz
    bpz = bax * poy - bay * pox
    tr_v = (dx * bpx + dy * bpy + dz * bpz) * inv_det
    tw = 1.0 - tr_u - tr_v

    t_nx, t_ny, t_nz = (tw * gt[0] + tr_u * gt[3] + tr_v * gt[6],
                        tw * gt[1] + tr_u * gt[4] + tr_v * gt[7],
                        tw * gt[2] + tr_u * gt[5] + tr_v * gt[8])
    t_uu = tw * gt[9] + tr_u * gt[11] + tr_v * gt[13]
    t_uvv = tw * gt[10] + tr_u * gt[12] + tr_v * gt[14]

    # ---- sphere fields (component-wise; reference src/hittable.rs:59-62,
    # equirect UV src/utility.rs:93-100 via core.math on the final (B,3)) --
    cx, cy, cz, radius = gt[0], gt[1], gt[2], gt[3]
    safe_r = jnp.where(radius == 0.0, 1.0, radius)

    t_sel = jnp.where(sphere_wins, s_t_safe, tr_t_safe)
    px = ox + t_sel * dx
    py = oy + t_sel * dy
    pz = oz + t_sel * dz
    s_nx = (px - cx) / safe_r
    s_ny = (py - cy) / safe_r
    s_nz = (pz - cz) / safe_r

    nx = jnp.where(sphere_wins, s_nx, t_nx)
    ny = jnp.where(sphere_wins, s_ny, t_ny)
    nz = jnp.where(sphere_wins, s_nz, t_nz)

    from potato_tpu.core import math as pmath

    s_uv = pmath.equirect_uv(jnp.stack([s_nx, s_ny, s_nz], axis=-1))
    uu = jnp.where(sphere_wins, s_uv[:, 0], t_uu)
    vv = jnp.where(sphere_wins, s_uv[:, 1], t_uvv)

    material = gt[24].astype(jnp.int32)
    return HitBatch(
        t=jnp.where(sphere_wins, s_t, tr_t),
        position=jnp.stack([px, py, pz], axis=-1),
        normal=jnp.stack([nx, ny, nz], axis=-1),
        uv=jnp.stack([uu, vv], axis=-1),
        material=material,
        valid=s_hit | tr_hit,
    )
