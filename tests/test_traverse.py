"""Property tests: clustered traversal == brute force (the reference's own
List-vs-Bvh verification idea, src/example_scenes.rs:141-150, made exact)."""

import numpy as np
import jax.numpy as jnp
import pytest

from potato_tpu.core.types import BIG, RAY_EPSILON, RayBatch
from potato_tpu.ops.intersect import intersect_brute_force
from potato_tpu.ops.traverse import intersect_clustered
from potato_tpu.scene.description import Absorb, Emit, Material, Scatter, SceneBuilder
from potato_tpu.scene import examples


def _random_sphere_scene(rng, n):
    s = SceneBuilder()
    for k in range(4):
        s.add_material(Material(Scatter.lambert(), Absorb.albedo(0.5, 0.5, 0.5), Emit.none()))
    for _ in range(n):
        s.add_sphere(rng.uniform(-5, 5, 3), rng.uniform(0.1, 1.5), rng.integers(0, 4))
    return s


def _random_tri_scene(rng, n):
    s = SceneBuilder()
    s.add_material(Material(Scatter.lambert(), Absorb.albedo(0.5, 0.5, 0.5), Emit.none()))
    from potato_tpu.io.obj import MeshData
    base = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    positions = np.concatenate([base, base + e1, base + e2]).astype(np.float32)
    idx = np.arange(n, dtype=np.int32)
    indices = np.stack([idx, idx + n, idx + 2 * n], axis=1)
    mesh = MeshData(positions=positions,
                    normals=rng.normal(size=(3 * n, 3)).astype(np.float32),
                    uvs=rng.uniform(0, 1, (3 * n, 2)).astype(np.float32),
                    indices=indices)
    s.add_mesh(mesh, 0)
    return s


def _random_rays(rng, b):
    origin = rng.uniform(-8, 8, (b, 3)).astype(np.float32)
    direction = rng.normal(size=(b, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    return RayBatch(
        origin=jnp.asarray(origin), direction=jnp.asarray(direction),
        t_min=jnp.full(b, RAY_EPSILON, jnp.float32),
        t_max=jnp.full(b, BIG, jnp.float32))


def _assert_same_hits(scene, rays, atol=1e-3):
    brute = intersect_brute_force(scene.tables, rays)
    clustered = intersect_clustered(scene.accel, rays)
    np.testing.assert_array_equal(np.asarray(clustered.valid), np.asarray(brute.valid))
    v = np.asarray(brute.valid)
    # same primitive won: t, material, normal all agree on hit lanes
    np.testing.assert_allclose(np.asarray(clustered.t)[v], np.asarray(brute.t)[v],
                               rtol=1e-4, atol=atol)
    np.testing.assert_array_equal(np.asarray(clustered.material)[v],
                                  np.asarray(brute.material)[v])
    np.testing.assert_allclose(np.asarray(clustered.normal)[v],
                               np.asarray(brute.normal)[v], rtol=1e-3, atol=atol)
    np.testing.assert_allclose(np.asarray(clustered.uv)[v],
                               np.asarray(brute.uv)[v], rtol=1e-3, atol=atol)


@pytest.mark.parametrize("n", [10, 100, 333])
def test_cluster_equals_brute_spheres(n):
    rng = np.random.default_rng(n)
    scene = _random_sphere_scene(rng, n).build(accel="cluster", cluster_size=16)
    _assert_same_hits(scene, _random_rays(rng, 512))


@pytest.mark.parametrize("n", [50, 400])
def test_cluster_equals_brute_triangles(n):
    rng = np.random.default_rng(n)
    scene = _random_tri_scene(rng, n).build(accel="cluster", cluster_size=16)
    _assert_same_hits(scene, _random_rays(rng, 512))


def test_cluster_equals_brute_mixed():
    rng = np.random.default_rng(5)
    s = _random_sphere_scene(rng, 80)
    tri = _random_tri_scene(rng, 120)
    s.meshes, s.mesh_materials = tri.meshes, tri.mesh_materials
    scene = s.build(accel="cluster", cluster_size=8)
    _assert_same_hits(scene, _random_rays(rng, 512))


def test_cluster_equals_brute_bunny():
    """The flagship mesh: 4,968 triangles + ground sphere."""
    rng = np.random.default_rng(0)
    builder = examples.bunny()
    clustered_scene = builder.build(accel="cluster", cluster_size=32)
    brute_scene = builder.build(accel="brute")
    # rays aimed at the bunny from a shell around it
    origin = rng.normal(size=(256, 3)).astype(np.float32)
    origin = origin / np.linalg.norm(origin, axis=-1, keepdims=True) * 3.0
    origin[:, 1] += 0.5
    target = rng.normal(size=(256, 3)).astype(np.float32) * 0.3
    target[:, 1] += 0.5
    direction = target - origin
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    rays = RayBatch(jnp.asarray(origin), jnp.asarray(direction),
                    jnp.full(256, RAY_EPSILON, jnp.float32),
                    jnp.full(256, BIG, jnp.float32))
    brute = intersect_brute_force(brute_scene.tables, rays)
    clustered = intersect_clustered(clustered_scene.accel, rays)
    np.testing.assert_array_equal(np.asarray(clustered.valid), np.asarray(brute.valid))
    v = np.asarray(brute.valid)
    assert v.mean() > 0.5  # the shell rays mostly hit something
    np.testing.assert_allclose(np.asarray(clustered.t)[v], np.asarray(brute.t)[v],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(clustered.material)[v],
                                  np.asarray(brute.material)[v])
