"""Distribution tests for closed-form sampling (vs the reference's rejection
samplers, src/randomness.rs:19-82 — same distributions, different realization)."""

import jax.numpy as jnp
import numpy as np

from potato_tpu.core import rng as prng
from potato_tpu.core import sampling

import pytest

# sub-second unit tier: the pre-commit gate (tools/cpupytest -m fast)
pytestmark = pytest.mark.fast


def _uniforms(n, seed=0):
    ids = jnp.arange(n, dtype=jnp.uint32)
    u1, u2 = prng.uniform2(seed, 0, ids)
    u3 = prng.uniform1(seed, 1, ids)
    return u1, u2, u3


def test_unit_disk_uniform():
    u1, u2, _ = _uniforms(1 << 16)
    p = np.asarray(sampling.unit_disk(u1, u2))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # area-uniform => r^2 uniform in [0,1]
    hist, _ = np.histogram(r ** 2, bins=32, range=(0, 1))
    expected = r.size / 32
    assert np.abs(hist - expected).max() < 5 * np.sqrt(expected)
    # mean position ~ 0
    assert np.abs(p.mean(axis=0)).max() < 0.01


def test_unit_sphere_uniform():
    u1, u2, _ = _uniforms(1 << 16, seed=1)
    p = np.asarray(sampling.unit_sphere(u1, u2))
    np.testing.assert_allclose(np.linalg.norm(p, axis=-1), 1.0, atol=1e-5)
    # each coordinate of a uniform sphere point is uniform in [-1,1]
    for k in range(3):
        hist, _ = np.histogram(p[:, k], bins=32, range=(-1, 1))
        expected = p.shape[0] / 32
        assert np.abs(hist - expected).max() < 5 * np.sqrt(expected), f"axis {k}"


def test_unit_ball_uniform():
    u1, u2, u3 = _uniforms(1 << 16, seed=2)
    p = np.asarray(sampling.unit_ball(u1, u2, u3))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-5
    # volume-uniform => r^3 uniform
    hist, _ = np.histogram(r ** 3, bins=32, range=(0, 1))
    expected = r.size / 32
    assert np.abs(hist - expected).max() < 5 * np.sqrt(expected)


def test_bernoulli_rate():
    _, _, u3 = _uniforms(1 << 16, seed=3)
    for prob in (0.1, 0.5, 0.9):
        rate = float(np.mean(np.asarray(sampling.bernoulli(u3, prob))))
        assert abs(rate - prob) < 0.01


def test_closed_range():
    u1, _, _ = _uniforms(1 << 12, seed=4)
    x = np.asarray(sampling.closed_range(u1, -3.0, 5.0))
    assert x.min() >= -3.0 and x.max() <= 5.0
    assert abs(x.mean() - 1.0) < 0.1
