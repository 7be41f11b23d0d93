"""Property tests: MXU dense intersector == plain brute force."""

import numpy as np
import jax.numpy as jnp
import pytest
import sys

from potato_tpu.ops.dense import intersect_dense
from potato_tpu.ops.intersect import intersect_brute_force
from potato_tpu.scene import examples

sys.path.insert(0, "tests")
from test_traverse import (  # noqa: E402
    _random_rays,
    _random_sphere_scene,
    _random_tri_scene,
)

# sub-second unit tier: the pre-commit gate (tools/cpupytest -m fast)
pytestmark = pytest.mark.fast


def _assert_same(scene, rays, atol=2e-3):
    brute = intersect_brute_force(scene.tables, rays)
    dense = intersect_dense(scene.accel, scene.tables, rays)
    same_valid = np.asarray(dense.valid) == np.asarray(brute.valid)
    # matmul refactoring changes rounding; near-tangent hits may flip on a
    # tiny fraction of rays
    assert same_valid.mean() > 0.995, f"{(~same_valid).sum()} valid flips"
    v = np.asarray(brute.valid) & same_valid
    np.testing.assert_allclose(np.asarray(dense.t)[v], np.asarray(brute.t)[v],
                               rtol=1e-3, atol=atol)
    same_mat = (np.asarray(dense.material)[v] == np.asarray(brute.material)[v])
    assert same_mat.mean() > 0.995


@pytest.mark.parametrize("n", [4, 100])
def test_dense_equals_brute_spheres(n):
    rng = np.random.default_rng(n)
    scene = _random_sphere_scene(rng, n).build(accel="dense")
    _assert_same(scene, _random_rays(rng, 512))


@pytest.mark.parametrize("n", [5, 333])
def test_dense_equals_brute_triangles(n):
    rng = np.random.default_rng(n + 1)
    scene = _random_tri_scene(rng, n).build(accel="dense")
    _assert_same(scene, _random_rays(rng, 512))


def test_dense_equals_brute_mixed():
    rng = np.random.default_rng(9)
    s = _random_sphere_scene(rng, 60)
    tri = _random_tri_scene(rng, 90)
    s.meshes, s.mesh_materials = tri.meshes, tri.mesh_materials
    scene = s.build(accel="dense")
    _assert_same(scene, _random_rays(rng, 512))


def test_dense_equals_brute_bunny():
    rng = np.random.default_rng(0)
    builder = examples.bunny()
    dense_scene = builder.build(accel="dense")
    brute_scene = builder.build(accel="brute")
    origin = rng.normal(size=(256, 3)).astype(np.float32)
    origin = origin / np.linalg.norm(origin, axis=-1, keepdims=True) * 3.0
    origin[:, 1] += 0.5
    target = rng.normal(size=(256, 3)).astype(np.float32) * 0.3
    target[:, 1] += 0.5
    direction = target - origin
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    from potato_tpu.core.types import BIG, RAY_EPSILON, RayBatch
    rays = RayBatch(jnp.asarray(origin), jnp.asarray(direction),
                    jnp.full(256, RAY_EPSILON, jnp.float32),
                    jnp.full(256, BIG, jnp.float32))
    brute = intersect_brute_force(brute_scene.tables, rays)
    dense = intersect_dense(dense_scene.accel, dense_scene.tables, rays)
    same = np.asarray(dense.valid) == np.asarray(brute.valid)
    assert same.mean() > 0.99
    v = np.asarray(brute.valid) & same
    assert v.mean() > 0.5
    np.testing.assert_allclose(np.asarray(dense.t)[v], np.asarray(brute.t)[v],
                               rtol=1e-3, atol=2e-3)
