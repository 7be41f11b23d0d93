"""Counter-based RNG: Threefry-2x32 on (seed, stream, ray-id) counters.

TPU-native replacement for the reference's stateful `StdRng` streams
(src/randomness.rs:5, seeded from entropy per worker at src/main.rs:52).
Every random draw here is a pure function of

    (seed, salt, global ray id)

so renders are bit-deterministic, independent of batch chunking and of how
rays are sharded across chips/hosts — any tile is recomputable in isolation
(the property the reference lacks: its renders differ run to run).

The implementation is plain uint32 jnp ops (Threefry-2x32, the same cipher
family jax.random uses), fully vectorized on the VPU and portable into
Pallas kernels unchanged. Two round counts:

- `threefry2x32(..., rounds=20)`: the full-strength cipher, bit-identical
  to jax.random's (KAT-pinned in tests/test_rng.py).
- the RENDER path draws with `rounds=13` — the minimum that passes
  BigCrush for Threefry-2x32 (Salmon et al., SC'11 Table 2) — because
  the per-bounce draws are ~1.5 ms/frame of pure VPU rounds at 20 and
  Monte Carlo rendering needs statistical quality, not crypto margin.
  The 13-round stream is its own deterministic spec (fixture-pinned).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_ROTATIONS = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = np.uint32(0x1BD11BDA)

# Stream salts: purpose of each draw within a bounce. A draw's salt is
# salt = bounce * NUM_STREAMS + stream (bounce 0 also covers camera setup).
STREAM_PIXEL_JITTER = 0
STREAM_LENS = 1
STREAM_SCATTER_A = 2   # lambert sphere / metal ball sample (2 uniforms)
STREAM_SCATTER_B = 3   # word 0: ball radius; word 1: dielectric bernoulli
STREAM_DIELECTRIC = 4  # unused since round 4 (the bernoulli draw rides
                       # SCATTER_B's second word); kept so old checkpoints'
                       # stream numbering stays documented
NUM_STREAMS = 8


def _rotl(x, r):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


RENDER_ROUNDS = 13


def threefry2x32(key0, key1, ctr0, ctr1, rounds: int = 20):
    """Threefry-2x32. Inputs broadcastable uint32 arrays; returns two
    uint32 arrays of the broadcast shape.

    rounds=20 (default) is bit-identical to jax.random's threefry2x32.
    Other counts follow the canonical schedule: a key injection after
    every 4 rounds, plus a final injection when the count is not a
    multiple of 4 (rounds=13: injections after rounds 4, 8, 12, 13).
    """
    k0 = jnp.asarray(key0, jnp.uint32)
    k1 = jnp.asarray(key1, jnp.uint32)
    k2 = k0 ^ k1 ^ _PARITY
    x0 = jnp.asarray(ctr0, jnp.uint32) + k0
    x1 = jnp.asarray(ctr1, jnp.uint32) + k1

    ks = (k0, k1, k2)
    j = 0
    for r in range(rounds):
        block, i = divmod(r, 4)
        x0 = x0 + x1
        x1 = _rotl(x1, _ROTATIONS[(block % 2) * 4 + i])
        x1 = x1 ^ x0
        if i == 3 or r == rounds - 1:
            j += 1
            x0 = x0 + ks[j % 3]
            x1 = x1 + ks[(j + 1) % 3] + np.uint32(j)
    return x0, x1


def _key_from_seed(seed: int):
    seed = int(seed) & 0xFFFFFFFFFFFFFFFF
    return np.uint32(seed & 0xFFFFFFFF), np.uint32((seed >> 32) & 0xFFFFFFFF)


def random_bits2(seed, salt, ids):
    """Two independent uint32 lanes per id. `ids` is any-shape uint32/int32
    array of *global* ray ids; `salt` is a (traced or static) scalar."""
    k0, k1 = _key_from_seed(seed) if isinstance(seed, (int, np.integer)) else (
        jnp.asarray(seed, jnp.uint32), jnp.uint32(0))
    ids = jnp.asarray(ids).astype(jnp.uint32)
    salt = jnp.asarray(salt).astype(jnp.uint32)
    return threefry2x32(k0, k1, ids, jnp.broadcast_to(salt, ids.shape),
                        rounds=RENDER_ROUNDS)


def _bits_to_unit_float(bits, dtype=jnp.float32):
    """uint32 -> float in [0, 1) using the exponent trick."""
    f = ((bits >> np.uint32(9)) | np.uint32(0x3F800000)).view(jnp.float32)
    return (f - 1.0).astype(dtype)


def uniform2(seed, salt, ids, dtype=jnp.float32):
    """Two uniforms in [0,1) per id.

    The outputs pass through an optimization barrier: XLA otherwise
    fuses the 13-round cipher into its consumers' (B, 1) column pieces,
    whose T(1,128) layout runs the VPU at 1 of 8 sublanes (measured on
    the bunny bench alongside the same fix in core/sampling.py). Values
    are bit-identical; the cipher runs once on dense (B,) vectors.
    """
    import jax

    b0, b1 = random_bits2(seed, salt, ids)
    return jax.lax.optimization_barrier(
        (_bits_to_unit_float(b0, dtype), _bits_to_unit_float(b1, dtype)))


def uniform1(seed, salt, ids, dtype=jnp.float32):
    b0, _ = random_bits2(seed, salt, ids)
    return _bits_to_unit_float(b0, dtype)


def bounce_salt(bounce, stream: int):
    """Salt for a draw of `stream` purpose at a given bounce (traced ok)."""
    return bounce * NUM_STREAMS + stream
