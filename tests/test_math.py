"""Unit tests for potato_tpu.core.math — closed-form cases with hand values.

Mirrors the reference's math semantics (reflect/refract src/utility.rs:106-119,
AABB slab src/utility.rs:137-155, lookat src/utility.rs:173-178).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from potato_tpu.core import math as pmath
from potato_tpu.core.types import make_rays

# sub-second unit tier: the pre-commit gate (tools/cpupytest -m fast)
pytestmark = pytest.mark.fast


def test_reflect_mirror():
    d = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2.0)
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = pmath.reflect(d, n)
    np.testing.assert_allclose(np.asarray(r), [[1.0 / np.sqrt(2), 1.0 / np.sqrt(2), 0.0]], atol=1e-6)


def test_reflect_preserves_length():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    n = rng.normal(size=(64, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    r = np.asarray(pmath.reflect(jnp.asarray(d), jnp.asarray(n)))
    np.testing.assert_allclose(np.linalg.norm(r, axis=-1), 1.0, atol=1e-5)


def test_refract_snell_law():
    # 45 degrees into eta=0.75 (air->glass-ish ratio)
    d = jnp.array([[np.sqrt(0.5), -np.sqrt(0.5), 0.0]], dtype=jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]], dtype=jnp.float32)
    eta = 0.75
    out, valid = pmath.refract(d, n, eta)
    assert bool(valid[0])
    out = np.asarray(out)[0]
    # Snell: sin(theta_out) = eta * sin(theta_in)
    sin_in = np.sqrt(0.5)
    sin_out = np.linalg.norm([out[0], out[2]])
    np.testing.assert_allclose(sin_out, eta * sin_in, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-6)
    assert out[1] < 0  # still going down


def test_refract_total_internal_reflection():
    # Shallow grazing ray from dense medium: eta=1.5 -> TIR
    d = jnp.array([[np.cos(0.1), -np.sin(0.1), 0.0]], dtype=jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]], dtype=jnp.float32)
    _, valid = pmath.refract(d, n, 1.5)
    assert not bool(valid[0])


def test_schlick_normal_incidence():
    # head-on: cos term = -1 -> (1 + n.d)^5 = 0 -> r0
    eta = 1.0 / 1.5
    r0 = ((1 - eta) / (1 + eta)) ** 2
    got = pmath.schlick_reflectance(jnp.array(-1.0), jnp.array(eta))
    np.testing.assert_allclose(float(got), r0, rtol=1e-6)


def test_schlick_grazing_is_one():
    got = pmath.schlick_reflectance(jnp.array(0.0), jnp.array(1.0 / 1.5))
    np.testing.assert_allclose(float(got), 1.0, rtol=1e-6)


def test_equirect_uv_axes():
    # +x -> u=0.5, v=0.5 ; +y -> v=1 ; -y -> v=0
    d = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, -1.0, 0]], dtype=jnp.float32)
    uv = np.asarray(pmath.equirect_uv(d))
    np.testing.assert_allclose(uv[0], [0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(uv[1][1], 1.0, atol=1e-6)
    np.testing.assert_allclose(uv[2][1], 0.0, atol=1e-6)


def test_aabb_hit_brute_force():
    """Slab test against a dense ray-marching oracle on random boxes."""
    rng = np.random.default_rng(1)
    n = 256
    bmin = rng.uniform(-2, 0, size=(n, 3)).astype(np.float32)
    bmax = bmin + rng.uniform(0.1, 2, size=(n, 3)).astype(np.float32)
    origin = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    direction = rng.normal(size=(n, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)

    got = np.asarray(pmath.aabb_hit(
        jnp.asarray(bmin), jnp.asarray(bmax), jnp.asarray(origin),
        1.0 / jnp.asarray(direction), jnp.zeros(n), jnp.full(n, 1e9)))

    # Oracle: dense sampling of points along each ray
    t = np.linspace(0, 20, 20001, dtype=np.float32)
    pts = origin[:, None, :] + t[None, :, None] * direction[:, None, :]
    inside = np.all((pts >= bmin[:, None, :] - 1e-4) & (pts <= bmax[:, None, :] + 1e-4), axis=-1)
    oracle = inside.any(axis=1)
    # sampling oracle can miss corner grazes; compare where unambiguous
    agree = got == oracle
    assert agree.mean() > 0.99, f"slab vs oracle disagreement {1 - agree.mean():.3%}"
    # every oracle-hit must be a slab-hit (slab is exact, oracle undersamples)
    assert np.all(got[oracle])


def test_lookat_frame_matches_reference():
    """The reference's lookat (src/utility.rs:173-178) normalizes only z:
    x = up x z and y = z x x keep length |sin(up,z)|. We match that quirk
    exactly — it subtly widens the fov when up is not perpendicular to the
    view direction, and makes world-space camera rays non-unit."""
    pos, tgt, up = np.array([-2.0, 2.0, 1.0]), np.array([0.0, 0.0, -1.0]), np.array([0.0, 1.0, 0.0])
    t = pmath.lookat(pos, tgt, up)
    o = np.asarray(t.orientation)
    z = (pos - tgt) / np.linalg.norm(pos - tgt)
    x = np.cross(up, z)
    y = np.cross(z, x)
    np.testing.assert_allclose(o[:, 0], x, atol=1e-6)
    np.testing.assert_allclose(o[:, 1], y, atol=1e-6)
    np.testing.assert_allclose(o[:, 2], z, atol=1e-6)
    # columns mutually orthogonal
    np.testing.assert_allclose(x @ z, 0, atol=1e-6)
    np.testing.assert_allclose(x @ y, 0, atol=1e-6)


def test_transform_roundtrip():
    # orthonormal case (up perpendicular to view) — the transpose-inverse is
    # exact here; the reference's inverse has the same restriction
    # (src/utility.rs:179-183).
    t = pmath.lookat([3.0, 0.0, 4.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    ti = pmath.inverse_transform(t)
    p = jnp.array([[0.3, -0.7, 2.0], [0.0, 0.0, 0.0]], dtype=jnp.float32)
    back = pmath.transform_point(ti, pmath.transform_point(t, p))
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-5)


def test_ray_at():
    r = make_rays(jnp.zeros((2, 3)), jnp.array([[1.0, 0, 0], [0, 1.0, 0]]))
    p = np.asarray(r.at(jnp.array([2.0, 3.0])))
    np.testing.assert_allclose(p, [[2, 0, 0], [0, 3, 0]], atol=1e-6)
