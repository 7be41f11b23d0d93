"""Front-to-back traversal of the Morton-cluster acceleration structure.

Replaces the reference's recursive BVH walk (src/bvh.rs:93-124) with a
vector-machine-shaped schedule:

1. one dense (B, C) slab test of every ray against every cluster AABB
   (pure VPU, no gathers, no traversal state),
2. per ray, clusters are visited in ascending AABB-entry order; each visit
   intersects the cluster's K packed primitives as one (B, K) vector block,
3. the loop ends when every lane's best hit is closer than its next
   cluster entry — the reference's t_max-shrinking early-out
   (src/bvh.rs:106-112) lifted to cluster granularity, *with* front-to-back
   ordering the reference lacks (SURVEY.md §2 quirk: build-order visits).

Improvement over the reference is intentional here; correctness is pinned
by the BVH == brute-force oracle test (the reference's own verification
idea, List vs Bvh, src/example_scenes.rs:141-150).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from potato_tpu.core import math as pmath
from potato_tpu.core.types import BIG, HitBatch, RayBatch
from potato_tpu.ops.intersect import (
    sphere_hit_fields,
    sphere_hit_t,
    triangle_hit_fields,
    triangle_hit_t,
)
from potato_tpu.scene.bvh import PRIM_SPHERE, PRIM_TRIANGLE, ClusterAccel


def intersect_clustered(accel: ClusterAccel, rays: RayBatch) -> HitBatch:
    """Closest hit for a ray batch via the two-level cluster structure."""
    B = rays.origin.shape[0]
    C = accel.num_clusters

    origin = rays.origin
    direction = rays.direction
    inv_dir = 1.0 / direction

    # stage 1: dense slab test against all cluster AABBs -> (B, C)
    boxes_hit, entry = pmath.aabb_entry_t(
        accel.cluster_min[None], accel.cluster_max[None],
        origin[:, None, :], inv_dir[:, None, :],
        rays.t_min[:, None], rays.t_max[:, None])
    entry = jnp.where(boxes_hit, jnp.maximum(entry, rays.t_min[:, None]), BIG)

    # stage 2 schedule: per-ray front-to-back cluster order
    order = jnp.argsort(entry, axis=1)                       # (B, C) int
    sorted_entry = jnp.take_along_axis(entry, order, axis=1)  # ascending

    def visit(state, _):
        j, best_t, best_c, best_k, best_u, best_v, best_sphere, found = state

        jc = jnp.minimum(j, C - 1)
        cidx = jax.lax.dynamic_index_in_dim(order, jc, axis=1, keepdims=False)
        entry_j = jax.lax.dynamic_index_in_dim(sorted_entry, jc, axis=1,
                                               keepdims=False)
        # a lane participates while this cluster could still beat its best
        lane_live = (j < C) & (entry_j < best_t)

        o = origin[:, None, :]
        dr = direction[:, None, :]
        tmin = rays.t_min[:, None]
        tcur = jnp.minimum(rays.t_max, best_t)[:, None]

        kind = accel.kind[cidx]                               # (B, K)
        st, s_ok = sphere_hit_t(accel.pa[cidx], accel.radius[cidx],
                                o, dr, tmin, tcur)
        s_ok &= kind == PRIM_SPHERE
        tt, tu, tv, t_ok = triangle_hit_t(
            accel.pa[cidx], accel.pb[cidx], accel.pc[cidx], o, dr, tmin, tcur)
        t_ok &= kind == PRIM_TRIANGLE

        slot_t = jnp.where(s_ok, st, jnp.where(t_ok, tt, BIG))  # (B, K)
        k_best = jnp.argmin(slot_t, axis=1)                     # (B,)
        take = lambda a: jnp.take_along_axis(a, k_best[:, None], axis=1)[:, 0]  # noqa: E731
        cand_t = take(slot_t)
        cand_hit = lane_live & (cand_t < best_t)

        best_t = jnp.where(cand_hit, cand_t, best_t)
        best_c = jnp.where(cand_hit, cidx, best_c)
        best_k = jnp.where(cand_hit, k_best, best_k)
        best_u = jnp.where(cand_hit, take(tu), best_u)
        best_v = jnp.where(cand_hit, take(tv), best_v)
        best_sphere = jnp.where(cand_hit, take(s_ok), best_sphere)
        found = found | cand_hit
        return (j + 1, best_t, best_c, best_k, best_u, best_v,
                best_sphere, found), None

    def visit_cond(state):
        j, best_t, *_ = state
        jc = jnp.minimum(j, C - 1)
        entry_j = jax.lax.dynamic_index_in_dim(sorted_entry, jc, axis=1,
                                               keepdims=False)
        return (j < C) & jnp.any(entry_j < best_t)

    # derive per-lane zeros from ray data (not literals) so the while_loop
    # carry is axis-varying-typed under shard_map (see integrator note)
    zb = rays.t_min * 0.0
    init = (jnp.int32(0),
            jnp.minimum(rays.t_max, BIG),
            zb.astype(jnp.int32), zb.astype(jnp.int32),
            zb, zb,
            zb > 1.0, zb > 1.0)

    state = jax.lax.while_loop(
        visit_cond, lambda s: visit(s, None)[0], init)
    _, best_t, best_c, best_k, best_u, best_v, best_sphere, found = state

    # final field assembly: one gather of the winning primitive per lane.
    # clamp t on miss lanes — fields at BIG t overflow and NaN the backward
    # pass (see intersect_brute_force)
    t_safe = jnp.where(found, best_t, 1.0)

    def prim(a):
        return a[best_c, best_k]

    s_pos, s_nrm, s_uv = sphere_hit_fields(
        prim(accel.pa), prim(accel.radius), t_safe, origin, direction)
    t_pos, t_nrm, t_uv = triangle_hit_fields(
        t_safe, best_u, best_v,
        prim(accel.na), prim(accel.nb), prim(accel.nc),
        prim(accel.ua), prim(accel.ub), prim(accel.uc),
        origin, direction)

    sphere3 = best_sphere[:, None]
    return HitBatch(
        t=jnp.where(found, best_t, BIG),
        position=jnp.where(sphere3, s_pos, t_pos),
        normal=jnp.where(sphere3, s_nrm, t_nrm),
        uv=jnp.where(sphere3, s_uv, t_uv),
        material=prim(accel.mat),
        valid=found,
    )
