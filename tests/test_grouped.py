"""Grouped-traversal intersector == brute force (interpret mode on CPU).

Property tests against the reference's own List semantics
(src/hittable.rs:110-120, reimplemented in ops/intersect.py) on random
scenes, plus unit checks of the XLA cluster-selection phase.
"""

import sys

import jax.numpy as jnp
import numpy as np

from potato_tpu.core.types import RayBatch
from potato_tpu.ops.grouped import (
    build_grouped_accel,
    intersect_grouped,
    select_clusters,
)
from potato_tpu.ops.intersect import intersect_brute_force

sys.path.insert(0, "tests")
from test_traverse import (  # noqa: E402
    _random_rays,
    _random_sphere_scene,
    _random_tri_scene,
)


def _build(builder):
    scene = builder.build(accel="brute")
    accel = build_grouped_accel(scene.tables, scene.num_spheres,
                                scene.num_triangles)
    return scene, accel


def _assert_same(scene, accel, rays, atol=2e-3):
    brute = intersect_brute_force(scene.tables, rays)
    grp = intersect_grouped(accel, scene.tables, rays, interpret=True)
    same_valid = np.asarray(grp.valid) == np.asarray(brute.valid)
    assert same_valid.mean() > 0.995, f"{(~same_valid).sum()} flips"
    v = np.asarray(brute.valid) & same_valid
    np.testing.assert_allclose(np.asarray(grp.t)[v], np.asarray(brute.t)[v],
                               rtol=1e-3, atol=atol)
    same_mat = np.asarray(grp.material)[v] == np.asarray(brute.material)[v]
    assert same_mat.mean() > 0.995


def test_grouped_spheres():
    rng = np.random.default_rng(3)
    scene, accel = _build(_random_sphere_scene(rng, 300))
    _assert_same(scene, accel, _random_rays(rng, 700))


def test_grouped_triangles():
    rng = np.random.default_rng(4)
    scene, accel = _build(_random_tri_scene(rng, 300))
    _assert_same(scene, accel, _random_rays(rng, 700))


def test_grouped_mixed():
    rng = np.random.default_rng(5)
    s = _random_sphere_scene(rng, 150)
    tri = _random_tri_scene(rng, 200)
    s.meshes, s.mesh_materials = tri.meshes, tri.mesh_materials
    scene, accel = _build(s)
    _assert_same(scene, accel, _random_rays(rng, 512))


def test_grouped_dead_rays_hit_nothing():
    """Lanes with t_max < t_min (retired/pad) must come back invalid."""
    rng = np.random.default_rng(6)
    scene, accel = _build(_random_sphere_scene(rng, 64))
    rays = _random_rays(rng, 256)
    dead = RayBatch(origin=rays.origin, direction=rays.direction,
                    t_min=rays.t_min, t_max=jnp.full_like(rays.t_max, -1.0))
    out = intersect_grouped(accel, scene.tables, dead, interpret=True)
    assert not np.asarray(out.valid).any()


def test_select_clusters_covers_winner():
    """Every brute-force winning primitive's cluster must appear in its
    ray group's entered list (else the kernel could miss the true hit)."""
    rng = np.random.default_rng(7)
    scene, accel = _build(_random_tri_scene(rng, 300))
    rays = _random_rays(rng, 256)
    brute = intersect_brute_force(scene.tables, rays)
    counts, ids, _ = select_clusters(rays, accel.tri_cmin, accel.tri_cmax)
    counts, ids = np.asarray(counts)[:, 0], np.asarray(ids)
    # winner's packed slot -> cluster
    inv_perm = np.argsort(np.asarray(accel.tri_perm), kind="stable")
    valid = np.asarray(brute.valid)
    # brute returns original tri index via material table; recover winning
    # primitive by re-testing t against each packed slot is overkill —
    # instead check geometric coverage: the hit POINT's cluster AABB test.
    hit_pos = np.asarray(brute.position)[valid]
    groups = np.nonzero(valid)[0] // 64
    cmin = np.asarray(accel.tri_cmin)
    cmax = np.asarray(accel.tri_cmax)
    eps = 1e-3
    for pos, g in zip(hit_pos, groups):
        inside = ((pos >= cmin - eps) & (pos <= cmax + eps)).all(axis=1)
        entered = ids[g, :counts[g]]
        assert np.intersect1d(np.nonzero(inside)[0], entered).size > 0
