"""Counter-based RNG tests: determinism, independence, uniformity."""

import jax.numpy as jnp
import numpy as np

from potato_tpu.core import rng as prng

import pytest

# sub-second unit tier: the pre-commit gate (tools/cpupytest -m fast)
pytestmark = pytest.mark.fast


def test_deterministic_and_chunk_invariant():
    ids = jnp.arange(1 << 12, dtype=jnp.uint32)
    a0, a1 = prng.random_bits2(1234, 7, ids)
    b0, b1 = prng.random_bits2(1234, 7, ids)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(b0))
    # chunk invariance: computing the second half alone gives identical bits
    h0, _ = prng.random_bits2(1234, 7, ids[2048:])
    np.testing.assert_array_equal(np.asarray(a0[2048:]), np.asarray(h0))


def test_salt_and_seed_decorrelate():
    ids = jnp.arange(1 << 12, dtype=jnp.uint32)
    a, _ = prng.random_bits2(1234, 7, ids)
    b, _ = prng.random_bits2(1234, 8, ids)
    c, _ = prng.random_bits2(1235, 7, ids)
    assert np.mean(np.asarray(a) == np.asarray(b)) < 0.01
    assert np.mean(np.asarray(a) == np.asarray(c)) < 0.01


def test_uniform_in_unit_interval_and_flat():
    ids = jnp.arange(1 << 16, dtype=jnp.uint32)
    u0, u1 = prng.uniform2(42, 3, ids)
    u = np.concatenate([np.asarray(u0), np.asarray(u1)])
    assert u.min() >= 0.0 and u.max() < 1.0
    hist, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = u.size / 64
    chi2 = np.sum((hist - expected) ** 2 / expected)
    # 63 dof; chi2 > 120 would be p < ~1e-5
    assert chi2 < 120, f"chi2={chi2}"


def test_matches_threefry_spec():
    """Pin the generator against jax.random's own threefry2x32 so the cipher
    is the real thing, not a lookalike."""
    import jax

    key = jax.random.key_data(jax.random.PRNGKey(0))  # [0, 0] key words
    ids = jnp.arange(16, dtype=jnp.uint32)
    ours0, ours1 = prng.threefry2x32(key[0], key[1], ids, jnp.zeros(16, jnp.uint32))
    # jax.random.bits with the same key over a counter... jax's mapping of
    # counters differs; instead verify the published test vector:
    # threefry2x32(key=(0,0), ctr=(0,0)) = (0x6b200159, 0x99ba4efe)
    a, b = prng.threefry2x32(jnp.uint32(0), jnp.uint32(0), jnp.uint32(0), jnp.uint32(0))
    assert int(a) == 0x6B200159, hex(int(a))
    assert int(b) == 0x99BA4EFE, hex(int(b))


def test_known_answer_vectors():
    # Published Threefry-2x32 20-round test vectors (Salmon et al., Random123):
    # key=(0xffffffff,)*2, ctr=(0xffffffff,)*2 -> (0x1cb996fc, 0xbb002be7)
    ones = jnp.uint32(0xFFFFFFFF)
    a, b = prng.threefry2x32(ones, ones, ones, ones)
    assert int(a) == 0x1CB996FC, hex(int(a))
    assert int(b) == 0xBB002BE7, hex(int(b))


def test_render_rounds_fixture():
    """The render path draws with Threefry-2x32-13 (the BigCrush-passing
    minimum, ~35% cheaper per bounce than the 20-round cipher). Its
    stream is our own deterministic spec — pinned here as a fixture, with
    the injection schedule (after rounds 4, 8, 12 and a final one after
    round 13) exercised end to end."""
    assert prng.RENDER_ROUNDS == 13
    a, b = prng.threefry2x32(jnp.uint32(0), jnp.uint32(0), jnp.uint32(0),
                             jnp.uint32(0), rounds=13)
    assert (int(a), int(b)) == (0x9D1C5EC6, 0xA7A6230F), (hex(int(a)), hex(int(b)))
    ones = jnp.uint32(0xFFFFFFFF)
    a, b = prng.threefry2x32(ones, ones, ones, ones, rounds=13)
    assert (int(a), int(b)) == (0xFD36D047, 0x48E8430A), (hex(int(a)), hex(int(b)))
    # random_bits2 rides the 13-round stream
    r0, r1 = prng.random_bits2(0, 0, jnp.zeros((1,), jnp.uint32))
    e0, e1 = prng.threefry2x32(jnp.uint32(0), jnp.uint32(0),
                               jnp.zeros((1,), jnp.uint32),
                               jnp.zeros((1,), jnp.uint32), rounds=13)
    assert int(r0[0]) == int(e0[0]) and int(r1[0]) == int(e1[0])


def test_divmod_u32_exact():
    """divmod_u32 must agree with // and % over its documented domain
    (x < 2^22) for the divisors the renderer uses, including the exact
    boundary neighborhoods of every multiple."""
    from potato_tpu.core.math import divmod_u32

    for d in (1, 3, 4, 16, 50, 512, 800, 801):
        xs = np.concatenate([
            np.arange(0, 4 * d + 2),
            np.arange((1 << 22) - 3 * d, 1 << 22),
            np.random.default_rng(d).integers(0, 1 << 22, 2000),
        ]).astype(np.uint32)
        q, r = divmod_u32(jnp.asarray(xs), d)
        np.testing.assert_array_equal(np.asarray(q), xs // d)
        np.testing.assert_array_equal(np.asarray(r), xs % d)
