"""Regeneration-pool renderer == chunked renderer, bit for bit.

Every lane carries (ray id, bounce) and all randomness is a pure function
of (seed, bounce, ray id), so refilling freed lanes mid-flight must not
change a single pixel relative to the chunked renderer.
"""

import numpy as np

from potato_tpu.render.renderer import render
from potato_tpu.render.wavefront import render_pool
from potato_tpu.scene import examples


def _compare(builder, accel, w, h, spp, pool, max_bounce=4, seed=9):
    scene = builder.build(accel=accel)
    want = render(scene, w, h, spp=spp, max_bounce=max_bounce, seed=seed)
    got = render_pool(scene, w, h, spp=spp, max_bounce=max_bounce, seed=seed,
                      pool=pool)
    np.testing.assert_array_equal(got.color, want.color)
    np.testing.assert_array_equal(got.normal, want.normal)
    np.testing.assert_array_equal(got.coverage, want.coverage)
    assert got.segments == want.segments


def test_pool_matches_chunked_smaller_pool():
    # 1024 rays through a 512-lane pool: at least one full regeneration
    _compare(examples.three_balls(), "brute", 16, 16, 4, pool=512)


def test_pool_matches_chunked_flash():
    # the production accel under the pool loop, swizzled frame
    _compare(examples.one_triangle(), "flash", 16, 16, 2, pool=512)


def test_pool_matches_chunked_pool_larger_than_frame():
    _compare(examples.two_balls(), "brute", 12, 12, 2, pool=512)
