"""Compacted breadth-first driver (render/compact.py) vs the chunked driver.

The compact driver must be BIT-identical to the chunked one: a path's
radiance is a per-lane function of (seed, ray id, bounce) only, and the
accel kernels return exact nearest hits however rays are grouped into
blocks. Any deviation means the compaction permutation leaked into the
math (wrong ray id carried, stale pool row not masked, double/missed
retirement write).
"""

import numpy as np
import pytest

from potato_tpu.render.renderer import default_driver, render
from potato_tpu.scene import examples

def _assert_identical(a, b):
    assert a.segments == b.segments
    np.testing.assert_array_equal(a.color, b.color)
    np.testing.assert_array_equal(a.normal, b.normal)
    np.testing.assert_array_equal(a.coverage, b.coverage)


@pytest.mark.fast
def test_compact_matches_chunked_divergent_scene():
    # dielectric scene: paths diverge in length, so the pool shrinks
    # gradually and every compaction path (partial chunks, retirement
    # scatter, flush of still-active paths) is exercised
    scene = examples.three_balls().build(accel="brute")
    a = render(scene, 64, 32, spp=2, max_bounce=8, seed=3, chunk_size=512,
               driver="chunked")
    b = render(scene, 64, 32, spp=2, max_bounce=8, seed=3, chunk_size=512,
               driver="compact")
    _assert_identical(a, b)


@pytest.mark.slow
def test_compact_matches_chunked_flash_accel():
    # the production Pallas accel (interpret mode on CPU) under the
    # compact driver: block composition differs between drivers, results
    # must not. Slow tier: interpret-mode Pallas dominates (~1 min).
    scene = examples.three_balls().build(accel="flash")
    a = render(scene, 32, 16, spp=2, max_bounce=6, seed=1, chunk_size=512,
               driver="chunked")
    b = render(scene, 32, 16, spp=2, max_bounce=6, seed=1, chunk_size=512,
               driver="compact")
    _assert_identical(a, b)


@pytest.mark.fast
def test_compact_single_bounce_and_tail_padding():
    # max_bounce=1: the bounce>=1 while_loop body never runs; still-active
    # paths go straight to the flush. Odd frame size disables the tile
    # swizzle and leaves a partially-dead tail chunk.
    scene = examples.two_balls().build(accel="brute")
    a = render(scene, 33, 17, spp=3, max_bounce=1, seed=7,
               chunk_size=500, driver="chunked")
    b = render(scene, 33, 17, spp=3, max_bounce=1, seed=7,
               chunk_size=500, driver="compact")
    _assert_identical(a, b)


@pytest.mark.fast
def test_default_driver_policy():
    # compact wins on path-length-divergent (dielectric) scenes, chunked
    # on short-coherent-path scenes — measured on v5e (PERF_SCENES_r05)
    assert default_driver(
        examples.glass_bunny().build(accel="brute")) == "compact"
    assert default_driver(
        examples.earth().build(accel="brute")) == "chunked"
