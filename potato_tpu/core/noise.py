"""Deterministic lattice hash noise + Perlin gradient noise.

jnp port of the reference's libnoise-style integer hash
(src/randomness.rs:91-110) and its Perlin texture (src/texture.rs:70-118).

Deviation from the reference: the reference hashes in 64-bit `isize`
arithmetic; JAX defaults to 32-bit integers, so we run the identical hash
structure (multiply-add fold, arithmetic-shift xor, cubic remix) in int32
with the low 32 bits of the reference's constants. The output is a
deterministic value in [-1, 1] with the same statistical character; exact
values are pinned by tests against an independent numpy model.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_A = np.uint32(0x899E43CF)  # low 32 bits of 0x369E6D3B899E43CF (randomness.rs:93)
_B = np.uint32(0xFDA3B07D)  # low 32 bits of 0x53F89E7FFDA3B07D
_C = np.uint32(0x4937E629)  # low 32 bits of 0x3B13C1CA4937E629
_D = np.uint32(0x4019D645)  # low 32 bits of 0x577C2C6E4019D645
_E = np.uint32(60493)
_F = np.uint32(19990303)
_G = np.uint32(1376312589)
_I32_MAX = float(np.iinfo(np.int32).max)


def noise_integer(x, y, z, seed):
    """Integer lattice hash -> int32 (structure of reference
    src/randomness.rs:91-105). Inputs are int32 arrays (broadcastable)."""
    xu = jnp.asarray(x).astype(jnp.uint32)
    yu = jnp.asarray(y).astype(jnp.uint32)
    zu = jnp.asarray(z).astype(jnp.uint32)
    su = jnp.asarray(seed).astype(jnp.uint32)
    h = _A * xu + _B * yu + _C * zu + _D * su
    # Rust does (h >> 13) ^ h on a *signed* isize => arithmetic shift.
    hi = h.astype(jnp.int32)
    hi = (hi >> 13) ^ hi
    h = hi.astype(jnp.uint32)
    h = h * (h * h * _E + _F) + _G
    return h.astype(jnp.int32)


def noise_real(x, y, z, seed):
    """Lattice hash -> float in [-1, 1] (reference src/randomness.rs:108-110)."""
    return noise_integer(x, y, z, seed).astype(jnp.float32) / _I32_MAX


def _grad_dot(p, cx, cy, cz, seed):
    """Dot of (p - corner) with the hash-seeded corner gradient
    (reference src/texture.rs:70-77: gradient channels use seed+1/2/3)."""
    gx = noise_real(cx, cy, cz, seed + 1)
    gy = noise_real(cx, cy, cz, seed + 2)
    gz = noise_real(cx, cy, cz, seed + 3)
    px = p[..., 0] - cx.astype(p.dtype)
    py = p[..., 1] - cy.astype(p.dtype)
    pz = p[..., 2] - cz.astype(p.dtype)
    return px * gx + py * gy + pz * gz


def _mix(a, b, t):
    return (b - a) * t + a


def value_noise(p, seed):
    """Blocky lattice value noise in [0, 1] (reference src/texture.rs:62-68):
    hash of floor(p), remapped 0.5*x + 0.5."""
    f = jnp.floor(p)
    x = noise_real(f[..., 0].astype(jnp.int32), f[..., 1].astype(jnp.int32),
                   f[..., 2].astype(jnp.int32), seed)
    return 0.5 * x + 0.5


def perlin(p, seed):
    """Perlin gradient noise in ~[0, 1] with smootherstep fade + trilerp
    (reference src/texture.rs:83-118). p is (..., 3); seed int32 scalar/array."""
    fp = jnp.floor(p)
    fl = fp.astype(jnp.int32)
    flx, fly, flz = fl[..., 0], fl[..., 1], fl[..., 2]
    clx, cly, clz = flx + 1, fly + 1, flz + 1

    k1 = _grad_dot(p, flx, fly, flz, seed)
    k2 = _grad_dot(p, clx, fly, flz, seed)
    k3 = _grad_dot(p, flx, cly, flz, seed)
    k4 = _grad_dot(p, clx, cly, flz, seed)
    k5 = _grad_dot(p, flx, fly, clz, seed)
    k6 = _grad_dot(p, clx, fly, clz, seed)
    k7 = _grad_dot(p, flx, cly, clz, seed)
    k8 = _grad_dot(p, clx, cly, clz, seed)

    t = p - fp
    t = (t * (t * 6.0 - 15.0) + 10.0) * t * t * t  # smootherstep

    tx, ty, tz = t[..., 0], t[..., 1], t[..., 2]
    k12 = _mix(k1, k2, tx)
    k34 = _mix(k3, k4, tx)
    k56 = _mix(k5, k6, tx)
    k78 = _mix(k7, k8, tx)
    k1234 = _mix(k12, k34, ty)
    k5678 = _mix(k56, k78, ty)
    k = _mix(k1234, k5678, tz)
    return 0.5 * k + 0.5
