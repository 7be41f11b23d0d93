"""Exactness tests for the lattice hash and Perlin noise.

The hash structure mirrors the reference (src/randomness.rs:91-110,
src/texture.rs:70-118) in 32-bit arithmetic; values are pinned against an
independent pure-numpy model so any jnp regression is caught bit-exactly.
"""

import jax.numpy as jnp
import numpy as np

from potato_tpu.core import noise


def _numpy_noise_integer(x, y, z, seed):
    A = np.uint64(0x899E43CF)
    B = np.uint64(0xFDA3B07D)
    C = np.uint64(0x4937E629)
    D = np.uint64(0x4019D645)
    h = (A * np.uint64(np.uint32(x)) + B * np.uint64(np.uint32(y))
         + C * np.uint64(np.uint32(z)) + D * np.uint64(np.uint32(seed))) & np.uint64(0xFFFFFFFF)
    hi = np.int64(np.int32(np.uint32(h)))
    hi = (hi >> np.int64(13)) ^ hi
    h = np.uint64(np.uint32(hi))
    h = (h * ((h * h * np.uint64(60493) + np.uint64(19990303)) & np.uint64(0xFFFFFFFF))
         + np.uint64(1376312589)) & np.uint64(0xFFFFFFFF)
    return np.int32(np.uint32(h))


def test_noise_integer_matches_numpy_model():
    rng = np.random.default_rng(0)
    pts = rng.integers(-1000, 1000, size=(256, 4))
    got = np.asarray(noise.noise_integer(
        jnp.asarray(pts[:, 0], jnp.int32), jnp.asarray(pts[:, 1], jnp.int32),
        jnp.asarray(pts[:, 2], jnp.int32), jnp.asarray(pts[:, 3], jnp.int32)))
    want = np.array([_numpy_noise_integer(*p) for p in pts], np.int32)
    np.testing.assert_array_equal(got, want)


def test_noise_real_range_and_determinism():
    g = np.mgrid[0:16, 0:16]
    x = jnp.asarray(g[0].ravel(), jnp.int32)
    y = jnp.asarray(g[1].ravel(), jnp.int32)
    z = jnp.zeros_like(x)
    a = np.asarray(noise.noise_real(x, y, z, 0))
    b = np.asarray(noise.noise_real(x, y, z, 0))
    np.testing.assert_array_equal(a, b)
    assert a.min() >= -1.0 and a.max() <= 1.0
    assert a.std() > 0.3  # actually spread out


def test_perlin_range_and_smoothness():
    n = 256
    t = jnp.linspace(0.0, 8.0, n)
    p = jnp.stack([t, 0.3 * t + 0.1, jnp.full_like(t, 0.7)], axis=-1)
    v = np.asarray(noise.perlin(p, 0))
    assert v.min() >= -0.5 and v.max() <= 1.5  # ~[0, 1] up to gradient overshoot
    # smooth: adjacent samples along a line differ by a little
    assert np.abs(np.diff(v)).max() < 0.2


def test_perlin_zero_at_lattice_points():
    """Gradient noise has value 0.5 (remapped) exactly at integer lattice
    points, where all (p - corner) offsets used in the active corner dot are
    zero — matches the reference's construction (src/texture.rs:83-118)."""
    pts = jnp.asarray(np.array([[0, 0, 0], [1, 2, 3], [-2, 5, 1]], np.float32))
    v = np.asarray(noise.perlin(pts, 7))
    np.testing.assert_allclose(v, 0.5, atol=1e-5)


def test_value_noise_constant_within_cell():
    p1 = jnp.asarray(np.array([[1.2, 2.3, 3.4]], np.float32))
    p2 = jnp.asarray(np.array([[1.9, 2.01, 3.99]], np.float32))
    a = np.asarray(noise.value_noise(p1, 3))
    b = np.asarray(noise.value_noise(p2, 3))
    np.testing.assert_array_equal(a, b)
    assert 0.0 <= float(a[0]) <= 1.0
