"""Flash intersector == brute force (interpret mode on CPU).

Property tests against the reference's own List semantics
(src/hittable.rs:110-120, reimplemented in ops/intersect.py) on random
scenes, plus unit checks of the XLA per-block queue build.
"""

import sys

import jax.numpy as jnp
import numpy as np

from potato_tpu.core.types import RayBatch
from potato_tpu.ops.flash import (
    build_block_queue,
    build_flash_accel,
    intersect_flash,
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
    accel = build_flash_accel(scene.tables, scene.num_spheres,
                              scene.num_triangles)
    return scene, accel


def _assert_same(scene, accel, rays, atol=2e-3):
    brute = intersect_brute_force(scene.tables, rays)
    out = intersect_flash(accel, scene.tables, rays, interpret=True)
    same_valid = np.asarray(out.valid) == np.asarray(brute.valid)
    assert same_valid.mean() > 0.995, f"{(~same_valid).sum()} flips"
    v = np.asarray(brute.valid) & same_valid
    np.testing.assert_allclose(np.asarray(out.t)[v], np.asarray(brute.t)[v],
                               rtol=1e-3, atol=atol)
    same_mat = np.asarray(out.material)[v] == np.asarray(brute.material)[v]
    assert same_mat.mean() > 0.995


def test_flash_spheres():
    rng = np.random.default_rng(13)
    scene, accel = _build(_random_sphere_scene(rng, 300))
    _assert_same(scene, accel, _random_rays(rng, 1024))


def test_flash_triangles():
    rng = np.random.default_rng(14)
    scene, accel = _build(_random_tri_scene(rng, 300))
    _assert_same(scene, accel, _random_rays(rng, 1024))


def test_flash_mixed():
    rng = np.random.default_rng(15)
    s = _random_sphere_scene(rng, 150)
    tri = _random_tri_scene(rng, 200)
    s.meshes, s.mesh_materials = tri.meshes, tri.mesh_materials
    scene, accel = _build(s)
    _assert_same(scene, accel, _random_rays(rng, 512))


def test_flash_ragged_batch():
    """Batch sizes that are not a multiple of the 512-ray block."""
    rng = np.random.default_rng(16)
    scene, accel = _build(_random_tri_scene(rng, 100))
    _assert_same(scene, accel, _random_rays(rng, 300))


def test_flash_dead_rays_hit_nothing():
    """Lanes with t_max < t_min (retired/pad) must come back invalid."""
    rng = np.random.default_rng(17)
    scene, accel = _build(_random_sphere_scene(rng, 64))
    rays = _random_rays(rng, 256)
    dead = RayBatch(origin=rays.origin, direction=rays.direction,
                    t_min=rays.t_min, t_max=jnp.full_like(rays.t_max, -1.0))
    out = intersect_flash(accel, scene.tables, dead, interpret=True)
    assert not np.asarray(out.valid).any()


def test_block_queue_front_to_back_and_covering():
    """The per-block queue must (a) be sorted by entry t and (b) contain
    every cluster whose AABB the winning hit point lies in."""
    rng = np.random.default_rng(18)
    scene, accel = _build(_random_tri_scene(rng, 300))
    rays = _random_rays(rng, 512)
    counts, ids, entry = build_block_queue(rays, accel.tri_cmin,
                                           accel.tri_cmax)
    counts = np.asarray(counts)[:, 0]
    ids = np.asarray(ids)
    entry = np.asarray(entry)
    for blk in range(counts.shape[0]):
        e = entry[blk, :counts[blk]]
        assert (np.diff(e) >= 0).all(), "queue not front-to-back"

    brute = intersect_brute_force(scene.tables, rays)
    valid = np.asarray(brute.valid)
    hit_pos = np.asarray(brute.position)[valid]
    blocks = np.nonzero(valid)[0] // 512
    cmin = np.asarray(accel.tri_cmin)
    cmax = np.asarray(accel.tri_cmax)
    eps = 1e-3
    for pos, blk in zip(hit_pos, blocks):
        inside = ((pos >= cmin - eps) & (pos <= cmax + eps)).all(axis=1)
        entered = ids[blk, :counts[blk]]
        assert np.intersect1d(np.nonzero(inside)[0], entered).size > 0
