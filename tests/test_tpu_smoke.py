"""TPU Mosaic-lowering smoke gate (VERDICT r1 item 3).

Every Pallas intersector must *compile and execute* on the real chip, not
just pass interpret-mode math tests — the round-1 flash SMEM BlockSpec
regression passed 90/90 interpret-mode tests while breaking the bench.
These tests are skipped off-TPU and run compiled (interpret=False) on TPU.

The verify skill's drive recipe runs this file on hardware after any
kernel change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="needs a real TPU (Mosaic lowering)")


@pytest.fixture(scope="module")
def small_scene():
    from potato_tpu.scene.description import (
        Absorb, Emit, Material, MeshData, Scatter, SceneBuilder,
    )

    s = SceneBuilder()
    m = s.add_material(Material(Scatter.lambert(), Absorb.albedo(0.5, 0.5, 0.5),
                                Emit.none()))
    s.add_sphere((0.0, 0.0, -3.0), 1.0, m)
    s.add_sphere((2.0, 0.0, -4.0), 0.5, m)
    pos = np.asarray([[-1, -1, -2], [1, -1, -2], [0, 1, -2],
                      [2, -1, -5], [4, -1, -5], [3, 1, -5]], np.float32)
    mesh = MeshData(positions=pos,
                    normals=np.tile([[0, 0, 1]], (6, 1)).astype(np.float32),
                    uvs=np.zeros((6, 2), np.float32),
                    indices=np.asarray([[0, 1, 2], [3, 4, 5]], np.int32))
    s.add_mesh(mesh, m)
    return s


@pytest.fixture(scope="module")
def rays():
    n = 256
    t = np.linspace(-1, 1, n).astype(np.float32)
    from potato_tpu.core.types import RayBatch

    return RayBatch(
        origin=jnp.zeros((n, 3), jnp.float32),
        direction=jnp.stack([jnp.asarray(t), jnp.zeros(n), -jnp.ones(n)],
                            axis=1),
        t_min=jnp.full((n,), 1e-3),
        t_max=jnp.full((n,), 1e9),
    )


def _check(hit):
    hit = jax.block_until_ready(hit)
    assert bool(jnp.any(hit.valid))          # something was hit
    assert bool(jnp.all(jnp.isfinite(hit.t[hit.valid])))


def test_flash_compiles_on_tpu(small_scene, rays):
    from potato_tpu.ops.flash import build_flash_accel, intersect_flash

    scene = small_scene.build(accel="brute")
    accel = build_flash_accel(scene.tables, scene.num_spheres,
                              scene.num_triangles)
    fn = jax.jit(lambda r: intersect_flash(accel, scene.tables, r,
                                           interpret=False))
    _check(fn(rays))


def test_flash_matches_brute_on_tpu(small_scene, rays):
    from potato_tpu.ops.flash import build_flash_accel, intersect_flash
    from potato_tpu.ops.intersect import intersect_brute_force

    scene = small_scene.build(accel="brute")
    accel = build_flash_accel(scene.tables, scene.num_spheres,
                              scene.num_triangles)
    got = jax.jit(lambda r: intersect_flash(accel, scene.tables, r,
                                            interpret=False))(rays)
    want = jax.jit(lambda r: intersect_brute_force(scene.tables, r))(rays)
    # flash runs watertight MT, brute the reference Cramer form: identical
    # accept sets away from edges, t agreement to f32 arithmetic noise
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    np.testing.assert_allclose(np.asarray(got.t)[np.asarray(want.valid)],
                               np.asarray(want.t)[np.asarray(want.valid)],
                               rtol=1e-4)


def test_flash_gradient_on_tpu(small_scene):
    """jax.grad through the COMPILED Mosaic kernel + stop_gradient
    epilogue on hardware (VERDICT r5 item #4: the flash gradients were
    only ever validated in interpret mode on CPU). A 16x16x1 render of
    the tiny scene, differentiated wrt the albedo table, must produce a
    finite, nonzero gradient that matches a finite difference of the
    same compiled loss."""
    from potato_tpu.render.renderer import make_intersect_fn, render_chunk

    scene = small_scene.build(accel="flash")
    intersect_fn = make_intersect_fn(scene)   # compiled (interpret=False)
    ids = jnp.arange(256, dtype=jnp.uint32)

    def loss(albedo):
        tables = scene.tables._replace(m_absorb_color=albedo)
        out = render_chunk(tables, scene.camera, ids,
                           intersect_fn=intersect_fn, width=16, height=16,
                           spp=1, max_bounce=3, seed=0,
                           features=scene.features)   # scan path (diffable)
        return jnp.sum(out.color)

    a0 = scene.tables.m_absorb_color
    g = jax.block_until_ready(jax.jit(jax.grad(loss))(a0))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 1e-3, g

    # directional FD along the gradient (compiled loss, f32: coarse eps)
    loss_j = jax.jit(loss)
    d = g / np.linalg.norm(g)
    eps = 1e-2
    fd = (float(loss_j(a0 + eps * d)) - float(loss_j(a0 - eps * d))) / (2 * eps)
    ad = float(np.sum(g * d))   # = |g|
    assert abs(fd - ad) <= 0.35 * abs(ad) + 1e-3, (fd, ad)
