"""Vector math: reflect/refract, equirect UVs, AABBs, rigid transforms.

Batched jnp analogue of the reference's scalar helpers
(src/utility.rs:106-192). Everything broadcasts over leading batch dims.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot over the last axis -> (...,)."""
    return jnp.sum(a * b, axis=-1)


def divmod_u32(x: jnp.ndarray, d: int):
    """Exact (x // d, x % d) for uint32 arrays with x < 2^22, d a static
    positive int.

    Integer division by a non-power-of-two constant lowers to a slow
    scalar-ish sequence on the TPU VPU — the raygen/tile-swizzle divs by
    width and tiles_x were ~1.2 ms/frame on the bunny bench. Powers of
    two become shift/mask; other constants go through an f32 reciprocal
    multiply plus one +-1 correction (exact because the f32 quotient
    error is < 0.25 for x < 2^22, and the correction window is +-1).
    Returns uint32 (q, r).
    """
    d = int(d)
    assert d > 0
    x = x.astype(jnp.uint32)
    if d == 1:
        return x, jnp.zeros_like(x)
    if d & (d - 1) == 0:
        shift = d.bit_length() - 1
        return x >> np.uint32(shift), x & np.uint32(d - 1)
    q = jnp.floor(x.astype(jnp.float32) * np.float32(1.0 / d)) \
        .astype(jnp.int32)
    r = x.astype(jnp.int32) - q * np.int32(d)
    q = jnp.where(r < 0, q - 1, jnp.where(r >= d, q + 1, q))
    r = x.astype(jnp.int32) - q * np.int32(d)
    return q.astype(jnp.uint32), r.astype(jnp.uint32)


def norm_squared(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * a, axis=-1)


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    """Normalize over the last axis."""
    return a / jnp.sqrt(norm_squared(a))[..., None]


def safe_normalize(a: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    n2 = jnp.maximum(norm_squared(a), eps)
    return a / jnp.sqrt(n2)[..., None]


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def reflect(incident: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection; normal must be unit length
    (reference src/utility.rs:106-108)."""
    return incident - 2.0 * dot(incident, normal)[..., None] * normal


def refract(incident: jnp.ndarray, normal: jnp.ndarray, eta: jnp.ndarray):
    """Snell refraction of unit vectors (reference src/utility.rs:111-119).

    Returns (refracted_direction, valid) where valid=False marks total
    internal reflection; on TIR lanes the direction is a safe dummy (the
    incident vector) — callers select reflect() there, matching the
    reference's `unwrap_or(reflect(...))` at src/material.rs:171.
    """
    cos_theta = dot(normal, incident)
    eta = jnp.broadcast_to(jnp.asarray(eta, incident.dtype), cos_theta.shape)
    k = 1.0 - eta * eta * (1.0 - cos_theta * cos_theta)
    valid = k > 0.0
    # guard the sqrt argument on TIR lanes: sqrt'(0) = inf would turn the
    # masked-out branch into NaN gradients (0 * inf) under reverse-mode AD
    sqrt_k = jnp.sqrt(jnp.where(valid, k, 1.0))
    refr = (eta[..., None] * incident
            - (eta * cos_theta + sqrt_k)[..., None] * normal)
    return jnp.where(valid[..., None], refr, incident), valid


def schlick_reflectance(cos_incident_normal: jnp.ndarray, eta: jnp.ndarray) -> jnp.ndarray:
    """Schlick's approximation as written in the reference
    (src/material.rs:163-166): r0 + (1-r0)*(1 + n·d)^5 with n the
    outward-flipped normal and d the incident direction (so n·d = -cosθ)."""
    r0 = ((1.0 - eta) / (1.0 + eta)) ** 2
    return r0 + (1.0 - r0) * (1.0 + cos_incident_normal) ** 5


def equirect_uv(direction: jnp.ndarray) -> jnp.ndarray:
    """Equirectangular UVs of a unit direction
    (reference src/utility.rs:93-100 and src/hittable.rs:61).

    Latitude uses arctan2(y, hypot(x, z)) instead of the reference's
    asin(y): equal for unit vectors, but asin'(±1) = inf turns into NaN
    gradients at the poles under reverse-mode AD (inf * clip-grad 0). The
    tiny hypot floor keeps the pole itself differentiable; the azimuth is
    detached there (it is genuinely undefined at the poles).
    """
    x = direction[..., 0]
    y = direction[..., 1]
    z = direction[..., 2]
    r2 = x * x + z * z
    at_pole = r2 < 1e-12
    xs = jnp.where(at_pole, 1.0, x)
    zs = jnp.where(at_pole, 0.0, z)
    u = 0.5 - jnp.arctan2(zs, xs) / (2.0 * np.pi)
    v = jnp.arctan2(y, jnp.sqrt(r2 + 1e-12)) / np.pi + 0.5
    return jnp.stack([u, v], axis=-1)


# ------------------------------------------- AABB -------------------------------------------

def aabb_union(min_a, max_a, min_b, max_b):
    """(reference src/utility.rs:130-135)"""
    return jnp.minimum(min_a, min_b), jnp.maximum(max_a, max_b)


def aabb_hit(box_min, box_max, origin, inv_direction, t_min, t_max):
    """Slab test (tavianator.com method, reference src/utility.rs:137-155).

    Broadcasts: boxes (..., 3) against rays (..., 3); returns bool mask.
    The reference flags this as its hottest function — here it is a handful
    of fused VPU ops per lane.
    """
    t0 = (box_min - origin) * inv_direction
    t1 = (box_max - origin) * inv_direction
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    tmin = jnp.maximum(t_min, jnp.max(lo, axis=-1))
    tmax = jnp.minimum(t_max, jnp.min(hi, axis=-1))
    return tmax >= tmin


def aabb_entry_t(box_min, box_max, origin, inv_direction, t_min, t_max):
    """Slab test returning (hit, entry_t) — entry_t is used for ordered
    (front-to-back) BVH child visits, an improvement over the reference's
    build-order visits (src/bvh.rs:102-117)."""
    t0 = (box_min - origin) * inv_direction
    t1 = (box_max - origin) * inv_direction
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    tmin = jnp.maximum(t_min, jnp.max(lo, axis=-1))
    tmax = jnp.minimum(t_max, jnp.min(hi, axis=-1))
    return tmax >= tmin, tmin


# ------------------------------------------- Transformation -------------------------------------------

class Transformation(NamedTuple):
    """Rigid frame: 3x3 orientation (columns = local axes) + position
    (reference src/utility.rs:160-192)."""

    orientation: jnp.ndarray  # (3, 3)
    position: jnp.ndarray     # (3,)


def identity_transform(dtype=jnp.float32) -> Transformation:
    return Transformation(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype))


def lookat(position, target, up, dtype=jnp.float32) -> Transformation:
    """Camera-style frame: +Z points from target back to position
    (reference src/utility.rs:173-178)."""
    position = jnp.asarray(position, dtype)
    target = jnp.asarray(target, dtype)
    up = jnp.asarray(up, dtype)
    z = position - target
    z = z / jnp.linalg.norm(z)
    x = jnp.cross(up, z)
    y = jnp.cross(z, x)
    orientation = jnp.stack([x, y, z], axis=-1)  # columns
    return Transformation(orientation, position)


def inverse_transform(t: Transformation) -> Transformation:
    inv_o = t.orientation.T
    return Transformation(inv_o, -jnp.sum(inv_o * t.position[None, :], axis=-1))


def transform_vector(t: Transformation, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate (..., 3) vectors into the frame (reference src/utility.rs:185).

    Written as broadcasted VPU ops, not a matmul: 3-wide matmuls would be
    dispatched to the MXU in bf16 (losing precision) and waste the systolic
    array on a degenerate shape.
    """
    return jnp.sum(t.orientation * v[..., None, :], axis=-1)


def transform_point(t: Transformation, p: jnp.ndarray) -> jnp.ndarray:
    return transform_vector(t, p) + t.position
