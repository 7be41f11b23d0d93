"""Core ray/hit types as SoA pytrees.

TPU-native replacement for the reference's scalar structs
(`Ray` src/utility.rs:52-57, `Hit` src/utility.rs:84-100): a "Ray" here is a
*batch* of rays — every field carries a leading batch dimension — so the whole
renderer is shaped (B, ...) and maps onto the VPU/MXU without scalar loops.

Default precision is float32 (the reference uses f64 on CPU,
src/utility.rs:14); tests that need an f64 oracle enable jax_enable_x64
locally.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# Nudge the start of a scattered ray to avoid self-intersection
# (reference src/utility.rs:30).
RAY_EPSILON = 1e-3
# Determinant cutoff for the triangle intersector (reference src/utility.rs:31).
SMOL = 1e-7
# Sentinel "no hit" distance. We use a large finite value instead of inf so
# arithmetic on t stays NaN-free under autodiff.
BIG = 3.0e38


class RayBatch(NamedTuple):
    """A batch of rays origin + t*direction, t in [t_min, t_max].

    direction is kept normalized (same invariant as reference
    src/utility.rs:55). All fields are (B, 3) / (B,) jnp arrays.
    """

    origin: jnp.ndarray     # (B, 3)
    direction: jnp.ndarray  # (B, 3)
    t_min: jnp.ndarray      # (B,)
    t_max: jnp.ndarray      # (B,)

    @property
    def batch_shape(self):
        return self.origin.shape[:-1]

    def at(self, t: jnp.ndarray) -> jnp.ndarray:
        """Point at parameter t; t is (B,) (reference src/utility.rs:67)."""
        return self.origin + t[..., None] * self.direction


def make_rays(origin, direction, t_min=None, t_max=None) -> RayBatch:
    origin = jnp.asarray(origin)
    direction = jnp.asarray(direction)
    batch = origin.shape[:-1]
    dt = origin.dtype
    if t_min is None:
        t_min = jnp.full(batch, RAY_EPSILON, dtype=dt)
    if t_max is None:
        t_max = jnp.full(batch, BIG, dtype=dt)
    return RayBatch(origin, direction, jnp.asarray(t_min, dt), jnp.asarray(t_max, dt))


class HitBatch(NamedTuple):
    """A batch of ray-object collisions (reference src/utility.rs:84-89).

    `valid` replaces the reference's Option<Hit>: masked lanes carry
    well-defined dummy values (t = BIG, normal = +z) so downstream math is
    branchless and NaN-free.
    """

    t: jnp.ndarray         # (B,)
    position: jnp.ndarray  # (B, 3)
    normal: jnp.ndarray    # (B, 3) kept normalized (except interpolated mesh
                           # normals, which the reference leaves unnormalized,
                           # src/hittable.rs:105 — we match that behavior)
    uv: jnp.ndarray        # (B, 2)
    material: jnp.ndarray  # (B,) int32 material ids
    valid: jnp.ndarray     # (B,) bool


def no_hits(batch_shape, dtype=jnp.float32) -> HitBatch:
    """An all-miss HitBatch with safe dummy values."""
    b3 = batch_shape + (3,)
    return HitBatch(
        t=jnp.full(batch_shape, BIG, dtype=dtype),
        position=jnp.zeros(b3, dtype=dtype),
        normal=jnp.concatenate(
            [jnp.zeros(batch_shape + (2,), dtype=dtype),
             jnp.ones(batch_shape + (1,), dtype=dtype)], axis=-1),
        uv=jnp.zeros(batch_shape + (2,), dtype=dtype),
        material=jnp.zeros(batch_shape, dtype=jnp.int32),
        valid=jnp.zeros(batch_shape, dtype=bool),
    )


def hits_at_infinity(direction: jnp.ndarray) -> HitBatch:
    """Pretend-hit on a sphere at infinity with equirectangular UVs.

    Mirrors `Hit::at_infinity` (reference src/utility.rs:93-100):
    position = normal = direction, uv = equirect(direction).
    """
    from potato_tpu.core import math as pmath  # local import, avoid cycle

    uv = pmath.equirect_uv(direction)
    batch = direction.shape[:-1]
    return HitBatch(
        t=jnp.full(batch, BIG, dtype=direction.dtype),
        position=direction,
        normal=direction,
        uv=uv,
        material=jnp.zeros(batch, dtype=jnp.int32),
        valid=jnp.ones(batch, dtype=bool),
    )


def closer_hit(a: HitBatch, b: HitBatch) -> HitBatch:
    """Elementwise closest-hit select: the branchless analogue of the
    reference's t_max-shrinking loop (src/hittable.rs:110-120)."""
    take_b = b.valid & (~a.valid | (b.t < a.t))
    tb3 = take_b[..., None]
    return HitBatch(
        t=jnp.where(take_b, b.t, a.t),
        position=jnp.where(tb3, b.position, a.position),
        normal=jnp.where(tb3, b.normal, a.normal),
        uv=jnp.where(take_b[..., None], b.uv, a.uv),
        material=jnp.where(take_b, b.material, a.material),
        valid=a.valid | b.valid,
    )
