"""Acceleration structure: Morton-ordered primitive clusters (two-level BVH).

TPU-native replacement for the reference's recursive median-split BVH
(src/bvh.rs:36-91) and its recursive pointer-chasing traversal
(src/bvh.rs:93-119). Pointer-chasing per ray is the worst possible workload
for a vector machine, so the tree is flattened into two levels shaped for
dense vector ops:

- level 1: C cluster AABBs. A ray batch tests ALL of them at once —
  a dense (B, C) slab test on the VPU, no traversal state.
- level 2: each cluster holds K spatially-coherent primitives (consecutive
  in Morton order, like GPU LBVH leaves). A ray visits its hit clusters
  front-to-back (sorted by AABB entry t) and intersects each cluster's K
  primitives as one vector block, stopping when the best hit is closer than
  the next cluster's entry — the same t_max-shrinking early-out as the
  reference (src/bvh.rs:106-112) but over cluster fronts instead of nodes.

The build runs host-side in vectorized numpy (cold path, like the
reference's main-thread Bvh::new at src/main.rs / example_scenes.rs).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp
import numpy as np

PRIM_PAD = 0
PRIM_SPHERE = 1
PRIM_TRIANGLE = 2


class ClusterAccel(NamedTuple):
    cluster_min: jnp.ndarray  # (C,3) f32
    cluster_max: jnp.ndarray  # (C,3) f32
    kind: jnp.ndarray         # (C,K) int32
    pa: jnp.ndarray           # (C,K,3) sphere center / tri corner a
    pb: jnp.ndarray           # (C,K,3) tri corner b (sphere: zeros)
    pc: jnp.ndarray           # (C,K,3) tri corner c (sphere: zeros)
    radius: jnp.ndarray       # (C,K)   sphere radius (pad/tri: -1)
    na: jnp.ndarray           # (C,K,3) tri vertex normals
    nb: jnp.ndarray
    nc: jnp.ndarray
    ua: jnp.ndarray           # (C,K,2) tri vertex uvs
    ub: jnp.ndarray
    uc: jnp.ndarray
    mat: jnp.ndarray          # (C,K) int32

    @property
    def num_clusters(self) -> int:
        return self.cluster_min.shape[0]

    @property
    def cluster_size(self) -> int:
        return self.kind.shape[1]


def morton_codes(points: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """30-bit Morton codes of points quantized to a 1024^3 grid over [lo, hi].

    Vectorized magic-number bit interleave (the standard LBVH key, in place
    of the reference's per-level centroid sort, src/bvh.rs:58-67).
    """
    extent = np.maximum(hi - lo, 1e-12)
    q = np.clip(((points - lo) / extent * 1024.0), 0, 1023).astype(np.uint32)

    def spread(x):
        x = (x | (x << 16)) & np.uint32(0x030000FF)
        x = (x | (x << 8)) & np.uint32(0x0300F00F)
        x = (x | (x << 4)) & np.uint32(0x030C30C3)
        x = (x | (x << 2)) & np.uint32(0x09249249)
        return x

    return (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])


def build_cluster_accel(s_center: np.ndarray, s_radius: np.ndarray,
                        s_material: np.ndarray, tri: Dict[str, np.ndarray],
                        cluster_size: int = 32) -> ClusterAccel:
    """Build the two-level accel over all spheres + triangles of a scene."""
    ns = s_center.shape[0]
    ntr = tri["pa"].shape[0] if tri["pa"].size else 0
    n = ns + ntr
    assert n > 0, "empty scene"
    K = int(cluster_size)

    # unified primitive records
    kind = np.concatenate([
        np.full(ns, PRIM_SPHERE, np.int32), np.full(ntr, PRIM_TRIANGLE, np.int32)])
    zeros3 = lambda m: np.zeros((m, 3), np.float32)  # noqa: E731
    zeros2 = lambda m: np.zeros((m, 2), np.float32)  # noqa: E731
    pa = np.concatenate([s_center.reshape(-1, 3), tri["pa"].reshape(-1, 3)]) if ntr else \
        np.concatenate([s_center.reshape(-1, 3), zeros3(0)])
    pb = np.concatenate([zeros3(ns), tri["pb"].reshape(-1, 3)])
    pc = np.concatenate([zeros3(ns), tri["pc"].reshape(-1, 3)])
    radius = np.concatenate([s_radius.reshape(-1), np.full(ntr, -1.0, np.float32)])
    na = np.concatenate([zeros3(ns), tri["na"].reshape(-1, 3)])
    nb = np.concatenate([zeros3(ns), tri["nb"].reshape(-1, 3)])
    nc = np.concatenate([zeros3(ns), tri["nc"].reshape(-1, 3)])
    ua = np.concatenate([zeros2(ns), tri["ua"].reshape(-1, 2)])
    ub = np.concatenate([zeros2(ns), tri["ub"].reshape(-1, 2)])
    uc = np.concatenate([zeros2(ns), tri["uc"].reshape(-1, 2)])
    mat = np.concatenate([s_material.reshape(-1).astype(np.int32),
                          tri["mat"].reshape(-1).astype(np.int32)])

    # per-prim AABBs (reference src/hittable.rs:124-147)
    r3 = np.abs(radius)[:, None]
    sph_min, sph_max = pa - r3, pa + r3
    tri_min = np.minimum(np.minimum(pa, pb), pc)
    tri_max = np.maximum(np.maximum(pa, pb), pc)
    is_tri = (kind == PRIM_TRIANGLE)[:, None]
    pmin = np.where(is_tri, tri_min, sph_min).astype(np.float32)
    pmax = np.where(is_tri, tri_max, sph_max).astype(np.float32)

    # Morton order on centroids
    centroid = 0.5 * (pmin + pmax)
    order = np.argsort(morton_codes(centroid, centroid.min(0), centroid.max(0)),
                       kind="stable")

    # pad to a multiple of K with inert primitives
    C = (n + K - 1) // K
    pad = C * K - n
    take = np.concatenate([order, np.full(pad, -1)])  # -1 marks padding

    def pack(a, fill=0.0):
        out = np.concatenate([a[order],
                              np.full((pad,) + a.shape[1:], fill, a.dtype)])
        return out.reshape((C, K) + a.shape[1:])

    packed_kind = pack(kind, PRIM_PAD)
    packed_kind[take.reshape(C, K) < 0] = PRIM_PAD

    cl_min = np.concatenate([pmin[order], np.full((pad, 3), np.inf, np.float32)])
    cl_max = np.concatenate([pmax[order], np.full((pad, 3), -np.inf, np.float32)])
    cluster_min = cl_min.reshape(C, K, 3).min(axis=1)
    cluster_max = cl_max.reshape(C, K, 3).max(axis=1)

    return ClusterAccel(
        cluster_min=jnp.asarray(cluster_min), cluster_max=jnp.asarray(cluster_max),
        kind=jnp.asarray(packed_kind),
        pa=jnp.asarray(pack(pa)), pb=jnp.asarray(pack(pb)), pc=jnp.asarray(pack(pc)),
        radius=jnp.asarray(pack(radius, -1.0)),
        na=jnp.asarray(pack(na)), nb=jnp.asarray(pack(nb)), nc=jnp.asarray(pack(nc)),
        ua=jnp.asarray(pack(ua)), ub=jnp.asarray(pack(ub)), uc=jnp.asarray(pack(uc)),
        mat=jnp.asarray(pack(mat, 0).astype(np.int32)),
    )
