"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Determinism property: because every ray's randomness is keyed on its global
id, the sharded render must produce bit-identical images to the single-
device render — chunking and device count can never change the picture.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from potato_tpu.parallel import make_ray_mesh, make_sharded_render_fn, make_sharded_train_step
from potato_tpu.render.renderer import make_intersect_fn, render_chunk
from potato_tpu.scene import examples
from functools import partial


@pytest.fixture(scope="module")
def scene():
    return examples.three_balls().build(accel="brute")


def test_mesh_has_8_devices():
    mesh = make_ray_mesh()
    assert mesh.devices.size == 8


def test_sharded_render_matches_single_device(scene):
    w = h = 16
    spp = 2
    total = w * h * spp
    ids = jnp.arange(total, dtype=jnp.uint32)

    mesh = make_ray_mesh()
    fn = make_sharded_render_fn(scene, mesh, width=w, height=h, spp=spp,
                                max_bounce=4, seed=3)
    sharded = fn(scene.tables, scene.camera, ids)

    single = jax.jit(partial(
        render_chunk, intersect_fn=make_intersect_fn(scene), width=w,
        height=h, spp=spp, max_bounce=4, seed=3))(
            scene.tables, scene.camera, ray_ids=ids)

    np.testing.assert_array_equal(np.asarray(sharded.color),
                                  np.asarray(single.color))
    np.testing.assert_array_equal(np.asarray(sharded.aov_hit),
                                  np.asarray(single.aov_hit))
    assert int(sharded.segments) == int(single.segments)


def test_sharded_flash_matches_single_device():
    """The production Pallas kernel (flash) executing under shard_map
    across the 8-device CPU mesh (interpret mode) must be bit-identical to
    the single-device render — the VERDICT r2 gap: the flagship kernels
    had never executed under shard_map anywhere."""
    scene = examples.one_triangle().build(accel="flash")
    w = h = 16
    spp = 2
    total = w * h * spp
    ids = jnp.arange(total, dtype=jnp.uint32)

    mesh = make_ray_mesh()
    fn = make_sharded_render_fn(scene, mesh, width=w, height=h, spp=spp,
                                max_bounce=3, seed=5)
    sharded = fn(scene.tables, scene.camera, ids)

    single = jax.jit(partial(
        render_chunk, intersect_fn=make_intersect_fn(scene), width=w,
        height=h, spp=spp, max_bounce=3, seed=5))(
            scene.tables, scene.camera, ray_ids=ids)

    np.testing.assert_array_equal(np.asarray(sharded.color),
                                  np.asarray(single.color))
    assert int(sharded.segments) == int(single.segments)


def test_sharded_train_step_reduces_loss():
    """One SGD step on the texel atlas must reduce the sharded L2 loss.

    Uses the earth scene (the only builtin whose image drives the picture
    through the differentiable atlas gather) — BASELINE.json config 5 in
    miniature: recover texels from a rendered target.
    """
    scene = examples.earth().build(accel="brute")
    w = h = 8
    spp = 2
    total = w * h * spp
    ids = jnp.arange(total, dtype=jnp.uint32)
    mesh = make_ray_mesh()

    # target: the render with the TRUE atlas; start: flat gray atlas
    render_fn = make_sharded_render_fn(scene, mesh, width=w, height=h,
                                       spp=spp, max_bounce=3, seed=0)
    target = render_fn(scene.tables, scene.camera, ids).color

    step = make_sharded_train_step(scene, mesh, width=w, height=h, spp=spp,
                                   max_bounce=3, seed=0, learning_rate=20.0)
    atlas0 = jnp.zeros_like(scene.tables.atlas) + 0.25

    atlas1, loss0 = step(atlas0, scene.tables, scene.camera, ids, target)
    _, loss1 = step(atlas1, scene.tables, scene.camera, ids, target)
    assert float(loss0) > 0.0
    assert float(loss1) < float(loss0), (float(loss0), float(loss1))
    assert np.isfinite(np.asarray(atlas1)).all()


@pytest.mark.slow
def test_sharded_wall_time_ratio_regression(scene):
    """Sharding overhead regression gate (VERDICT r3 #4): on this host the
    8 virtual devices SHARE the same physical cores, so ideal scaling is a
    FLAT wall clock vs the 1-device mesh — growth means the shard_map
    render added per-device overhead (bad collectives, replication copies,
    or resharding). Gate at 1.35x (the EFFICIENCY.json curve on an idle
    box sits near 1.0; CI noise and core contention need headroom).

    Marked slow (perf tier): it asserts wall clock on shared cores, so a
    loaded CI host can fail it spuriously — run it deliberately, on a
    quiet box, via `-m slow` (ADVICE r4).
    """
    import time

    w = h = 32
    spp = 4
    total = w * h * spp
    ids = jnp.arange(total, dtype=jnp.uint32)

    times = {}
    for n in (1, 8):
        mesh = make_ray_mesh(num_devices=n)
        fn = make_sharded_render_fn(scene, mesh, width=w, height=h, spp=spp,
                                    max_bounce=4, seed=3)
        jax.block_until_ready(fn(scene.tables, scene.camera, ids))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(scene.tables, scene.camera, ids))
            best = min(best, time.perf_counter() - t0)
        times[n] = best

    ratio = times[8] / times[1]
    assert ratio <= 1.35, f"8-device wall time {ratio:.2f}x the 1-device mesh"
