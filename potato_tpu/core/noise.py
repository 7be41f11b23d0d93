"""Deterministic lattice hash noise + Perlin gradient noise.

jnp port of the reference's libnoise-style integer hash
(src/randomness.rs:91-110) and its Perlin texture (src/texture.rs:70-118).

The reference hashes in 64-bit `isize` arithmetic with wrapping ops. JAX
runs 32-bit by default, so the hash is emulated **bit-exactly** with
uint32 (lo, hi) pairs: wrapping 64-bit add/mul built from 16-bit limb
products, and the arithmetic `(h >> 13) ^ h` fold as a signed shift on
the hi word. `noise_i64` therefore matches `noise::integer` for every
lattice point / seed (pinned against a pure-Python int model of the Rust
code in tests/test_noise.py), and the Perlin texture renders the same
picture as the reference.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# 64-bit constants of src/randomness.rs:92-99, split lo/hi
_A = (0x899E43CF, 0x369E6D3B)
_B = (0xFDA3B07D, 0x53F89E7F)
_C = (0x4937E629, 0x3B13C1CA)
_D = (0x4019D645, 0x577C2C6E)
_E = (60493, 0)
_F = (19990303, 0)
_G = (1376312589, 0)
_I64_MAX = float(np.iinfo(np.int64).max)
_TWO32 = float(2**32)


def _u32(x):
    return jnp.asarray(x, jnp.uint32)


def _mul32_wide(a, b):
    """Full 32x32 -> 64 product of uint32 arrays, as (lo, hi) uint32."""
    mask = jnp.uint32(0xFFFF)
    a0 = a & mask
    a1 = a >> 16
    b0 = b & mask
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    t = (ll >> 16) + (lh & mask) + (hl & mask)
    lo = (ll & mask) | (t << 16)
    hi = a1 * b1 + (lh >> 16) + (hl >> 16) + (t >> 16)
    return lo, hi


def _add64(x, y):
    """(lo, hi) + (lo, hi), wrapping mod 2^64."""
    lo = x[0] + y[0]
    carry = (lo < x[0]).astype(jnp.uint32)
    return lo, x[1] + y[1] + carry


def _mul64(x, y):
    """(lo, hi) * (lo, hi), wrapping mod 2^64."""
    lo, hi = _mul32_wide(x[0], y[0])
    hi = hi + x[0] * y[1] + x[1] * y[0]
    return lo, hi


def _const64(c):
    return jnp.uint32(c[0]), jnp.uint32(c[1])


def _sext64(x):
    """int32 array -> sign-extended 64-bit (lo, hi) pair."""
    xi = jnp.asarray(x, jnp.int32)
    return xi.astype(jnp.uint32), (xi >> 31).astype(jnp.uint32)


def noise_i64(x, y, z, seed):
    """Exact `noise::integer` (src/randomness.rs:91-105) as (lo, hi) uint32.

    h = A*x + B*y + C*z + D*seed;  h = (h >> 13) ^ h  (arithmetic shift);
    h = h * (h*h*E + F) + G — all wrapping 64-bit.
    """
    xs, ys, zs, ss = _sext64(x), _sext64(y), _sext64(z), _sext64(seed)
    h = _mul64(_const64(_A), xs)
    h = _add64(h, _mul64(_const64(_B), ys))
    h = _add64(h, _mul64(_const64(_C), zs))
    h = _add64(h, _mul64(_const64(_D), ss))
    # (h >> 13) ^ h on signed 64-bit: arithmetic shift of the hi word
    s_lo = (h[0] >> 13) | (h[1] << 19)
    s_hi = (h[1].astype(jnp.int32) >> 13).astype(jnp.uint32)
    h = (s_lo ^ h[0], s_hi ^ h[1])
    inner = _add64(_mul64(_mul64(h, h), _const64(_E)), _const64(_F))
    return _add64(_mul64(h, inner), _const64(_G))


def noise_integer(x, y, z, seed):
    """Low 32 bits of the 64-bit hash, as int32 (legacy convenience)."""
    return noise_i64(x, y, z, seed)[0].astype(jnp.int32)


def noise_real(x, y, z, seed):
    """Lattice hash -> float in [-1, 1] (reference src/randomness.rs:108-110):
    the signed 64-bit hash divided by i64::MAX, evaluated in f32 (the hi
    word dominates; the lo word adds < 2^-31 — below f32 resolution)."""
    lo, hi = noise_i64(x, y, z, seed)
    hi_f = hi.astype(jnp.int32).astype(jnp.float32)
    return (hi_f * _TWO32 + lo.astype(jnp.float32)) / _I64_MAX


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
