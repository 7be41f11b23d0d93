"""Color utilities: linear -> u8 / sRGB-u8 conversion.

Batched analogue of reference src/utility.rs:196-220. Colors are (..., 3)
linear-light arrays; quantizers return (..., 4) uint8 RGBA with alpha 255.
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb(r, g, b, dtype=jnp.float32):
    return jnp.array([r, g, b], dtype=dtype)


def _alpha_like(color):
    return jnp.full(color.shape[:-1] + (1,), 255, dtype=jnp.uint8)


def to_u8(color: jnp.ndarray) -> jnp.ndarray:
    """Clamp + quantize, no gamma (reference src/utility.rs:202-210)."""
    c = jnp.clip(color, 0.0, 1.0)
    q = (255.0 * c).astype(jnp.uint8)
    return jnp.concatenate([q, _alpha_like(color)], axis=-1)


def to_srgb_u8(color: jnp.ndarray) -> jnp.ndarray:
    """Gamma 1/2.2 + quantize (reference src/utility.rs:212-220)."""
    c = jnp.clip(color, 0.0, 1.0)
    q = (255.0 * c ** (1.0 / 2.2)).astype(jnp.uint8)
    return jnp.concatenate([q, _alpha_like(color)], axis=-1)
