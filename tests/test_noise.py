"""Exactness tests for the lattice hash and Perlin noise.

The 64-bit wrapping hash (reference src/randomness.rs:91-110) is emulated
with uint32 (lo, hi) pairs; these tests pin it **bit-for-bit** against a
pure-Python integer model of the Rust code, so noise/Perlin textures render
the same picture as the reference.
"""

import jax.numpy as jnp
import numpy as np

from potato_tpu.core import noise

import pytest

# sub-second unit tier: the pre-commit gate (tools/cpupytest -m fast)
pytestmark = pytest.mark.fast

_M64 = (1 << 64) - 1


def _rust_noise_integer(x, y, z, seed):
    """Pure-Python model of src/randomness.rs:91-105 (wrapping i64)."""
    A = 0x369E6D3B899E43CF
    B = 0x53F89E7FFDA3B07D
    C = 0x3B13C1CA4937E629
    D = 0x577C2C6E4019D645
    x, y, z, seed = int(x), int(y), int(z), int(seed)

    def u(v):  # two's-complement 64-bit view
        return v & _M64

    h = u(A * u(x) + B * u(y) + C * u(z) + D * u(seed))
    hs = h - (1 << 64) if h >> 63 else h          # signed value
    h = u((hs >> 13) ^ hs)                        # arithmetic shift + xor
    h = u(h * u(h * h * 60493 + 19990303) + 1376312589)
    return h - (1 << 64) if h >> 63 else h        # as signed i64


def test_noise_i64_matches_rust_model_bit_for_bit():
    rng = np.random.default_rng(0)
    pts = rng.integers(-100000, 100000, size=(256, 4))
    lo, hi = noise.noise_i64(
        jnp.asarray(pts[:, 0], jnp.int32), jnp.asarray(pts[:, 1], jnp.int32),
        jnp.asarray(pts[:, 2], jnp.int32), jnp.asarray(pts[:, 3], jnp.int32))
    got = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) \
        | np.asarray(lo).astype(np.uint64)
    want = np.array([_rust_noise_integer(*p) & _M64 for p in pts], np.uint64)
    np.testing.assert_array_equal(got, want)


def test_noise_i64_known_vectors():
    """Hand-pinned values of the Rust hash (computed from the exact 64-bit
    model above) — guards both implementations at once."""
    cases = [
        ((0, 0, 0, 0), 1376312589),
        ((1, 0, 0, 0), _rust_noise_integer(1, 0, 0, 0)),
        ((-1, 2, -3, 4), _rust_noise_integer(-1, 2, -3, 4)),
    ]
    for (x, y, z, s), want in cases:
        lo, hi = noise.noise_i64(jnp.int32(x), jnp.int32(y), jnp.int32(z),
                                 jnp.int32(s))
        got = (int(hi) << 32) | int(lo)
        got = got - (1 << 64) if got >> 63 else got
        assert got == want, (x, y, z, s)


def test_noise_real_matches_rust_in_f32():
    rng = np.random.default_rng(1)
    pts = rng.integers(-1000, 1000, size=(64, 4))
    got = np.asarray(noise.noise_real(
        jnp.asarray(pts[:, 0], jnp.int32), jnp.asarray(pts[:, 1], jnp.int32),
        jnp.asarray(pts[:, 2], jnp.int32), jnp.asarray(pts[:, 3], jnp.int32)))
    want = np.array([_rust_noise_integer(*p) / float(2**63 - 1) for p in pts],
                    np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-7, atol=2e-7)


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
