"""Pallas fused intersector == brute force (interpret mode on CPU)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from potato_tpu.ops.intersect import intersect_brute_force
from potato_tpu.ops.pallas_intersect import build_pallas_accel, intersect_pallas
from potato_tpu.scene import examples

sys.path.insert(0, "tests")
from test_traverse import (  # noqa: E402
    _random_rays,
    _random_sphere_scene,
    _random_tri_scene,
)


def _build(builder, cluster_size=64):
    scene = builder.build(accel="brute")
    accel = build_pallas_accel(scene.tables, scene.num_spheres,
                               scene.num_triangles, cluster_size=cluster_size)
    return scene, accel


def _assert_same(scene, accel, rays, atol=2e-3):
    brute = intersect_brute_force(scene.tables, rays)
    pall = intersect_pallas(accel, scene.tables, rays, interpret=True)
    same_valid = np.asarray(pall.valid) == np.asarray(brute.valid)
    assert same_valid.mean() > 0.995, f"{(~same_valid).sum()} flips"
    v = np.asarray(brute.valid) & same_valid
    np.testing.assert_allclose(np.asarray(pall.t)[v], np.asarray(brute.t)[v],
                               rtol=1e-3, atol=atol)
    same_mat = np.asarray(pall.material)[v] == np.asarray(brute.material)[v]
    assert same_mat.mean() > 0.995


def test_pallas_spheres():
    rng = np.random.default_rng(3)
    scene, accel = _build(_random_sphere_scene(rng, 200))
    _assert_same(scene, accel, _random_rays(rng, 700))


def test_pallas_triangles():
    rng = np.random.default_rng(4)
    scene, accel = _build(_random_tri_scene(rng, 300), cluster_size=32)
    _assert_same(scene, accel, _random_rays(rng, 700))


def test_pallas_mixed():
    rng = np.random.default_rng(5)
    s = _random_sphere_scene(rng, 50)
    tri = _random_tri_scene(rng, 120)
    s.meshes, s.mesh_materials = tri.meshes, tri.mesh_materials
    scene, accel = _build(s, cluster_size=16)
    _assert_same(scene, accel, _random_rays(rng, 512))


def test_pallas_bunny():
    rng = np.random.default_rng(0)
    scene, accel = _build(examples.bunny(), cluster_size=256)
    origin = rng.normal(size=(512, 3)).astype(np.float32)
    origin = origin / np.linalg.norm(origin, axis=-1, keepdims=True) * 3.0
    origin[:, 1] += 0.5
    target = rng.normal(size=(512, 3)).astype(np.float32) * 0.3
    target[:, 1] += 0.5
    direction = target - origin
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    from potato_tpu.core.types import BIG, RAY_EPSILON, RayBatch
    rays = RayBatch(jnp.asarray(origin), jnp.asarray(direction),
                    jnp.full(512, RAY_EPSILON, jnp.float32),
                    jnp.full(512, BIG, jnp.float32))
    _assert_same(scene, accel, rays)
