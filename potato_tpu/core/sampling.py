"""Closed-form sampling of the reference's rejection distributions.

The reference rejection-samples UnitDisk/UnitBall/UnitSphere in loops
(src/randomness.rs:19-73) — data-dependent control flow that cannot exist
under jit. Each distribution here is an exact closed-form transform of
uniforms, so the *distributions* match while the noise realization differs
(goldens therefore compare statistics, see tests/test_sampling.py).

All functions take uniforms in [0,1) with any batch shape and return
(..., N) arrays.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def closed_range(u, lo, hi):
    """Uniform in [lo, hi] (reference src/randomness.rs:10-16)."""
    return lo + u * (hi - lo)


def unit_disk(u1, u2):
    """Uniform inside the unit disk via the polar map
    (equivalent in distribution to reference src/randomness.rs:19-34)."""
    r = jnp.sqrt(u1)
    theta = (2.0 * np.pi) * u2
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def unit_sphere(u1, u2):
    """Uniform on the unit sphere (equivalent in distribution to the
    Marsaglia rejection at reference src/randomness.rs:56-73).

    sin(theta) is derived from cos via sign(u2 < 1/2) * sqrt(1 - c^2)
    instead of a second transcendental: the sine polynomial was one of
    the larger per-bounce VPU fusions (~0.8 ms/frame on the bunny
    bench), while sqrt is a single op. Identical distribution; the
    realization differs from the two-transcendental form only by f32
    rounding (the oracle mirrors this formula exactly)."""
    import jax

    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    c = jnp.cos((2.0 * np.pi) * u2)
    s = jnp.sqrt(jnp.maximum(0.0, 1.0 - c * c))
    s = jnp.where(u2 < 0.5, s, -s)
    # barrier: without it XLA fuses the cos polynomial into the stack's
    # (B, 1) column pieces, whose T(1,128) layout runs the VPU at 1 of 8
    # sublanes — the cosine fusion alone measured ~0.9 ms/frame on the
    # bunny bench. The barrier materializes the transcendentals on dense
    # (B,) vectors first (values bit-identical).
    r, c, s, z = jax.lax.optimization_barrier((r, c, s, z))
    return jnp.stack([r * c, r * s, z], axis=-1)


def unit_ball(u1, u2, u3):
    """Uniform inside the unit ball: sphere direction scaled by cbrt(u)
    (equivalent in distribution to reference src/randomness.rs:37-53)."""
    s = unit_sphere(u1, u2)
    return s * jnp.cbrt(u3)[..., None]


def bernoulli(u, p):
    """True with probability p (reference src/randomness.rs:76-82)."""
    return u < p
