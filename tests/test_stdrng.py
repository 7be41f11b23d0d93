"""Validation of the rand-0.8 StdRng (ChaCha12) port (core/stdrng.py).

Three layers:
1. The ChaCha core against the classic DJB/RFC-7539 ChaCha20 zero-key
   known-answer vector — the 12-round StdRng variant runs the identical
   double-round code path, just fewer iterations.
2. A committed fixture of the first draws of the reference's seed
   ([249; 32], /root/reference/src/example_scenes.rs:98): pins the full
   stack (key loading, word order, u64 assembly, the (u64 >> 11) * 2^-53
   f64 conversion) against regressions.
3. The generated more_balls scene's structural invariants (the exact
   generator contract of example_scenes.rs:99-131).
"""

import hashlib

import numpy as np
import pytest

from potato_tpu.core.stdrng import StdRng, chacha_block

pytestmark = pytest.mark.fast


def test_chacha20_known_answer():
    """DJB ChaCha20, zero key, zero nonce, counter 0 — the universal KAT."""
    blk = chacha_block([0] * 8, 0, rounds=20)
    ks = b"".join(w.to_bytes(4, "little") for w in blk)
    assert ks.hex() == (
        "76b8e0ada0f13d90405d6ae55386bd28"
        "bdd219b8a08ded1aa836efcc8b770dc7"
        "da41597c5157488d7724e03fb8d84a37"
        "6a43b8f41518a11cc387b669b2ee6586")


def test_stdrng_reference_seed_fixture():
    """First f64 draws of StdRng::from_seed([249; 32]) — the head of the
    more_balls stream. A committed fixture of this port: pins key
    loading, the 12-round block, u64 assembly (low word first) and the
    53-bit f64 conversion against regressions. (The underlying ChaCha
    core is KAT-validated above; the structural test below checks the
    scene these draws generate obeys the reference's generator
    contract.)"""
    rng = StdRng(bytes([249]) * 32)
    draws = [rng.gen_f64() for _ in range(8)]
    expect = [
        0.4453352118735896, 0.8906349342038513, 0.8576576780484256,
        0.006319322847840425, 0.7735226729457261, 0.13087450734308403,
        0.4589565738100304, 0.6329581052477222,
    ]
    np.testing.assert_array_equal(np.asarray(draws), np.asarray(expect))


def test_stdrng_f64_range_and_mean():
    """gen::<f64>() stays in [0, 1) and is unbiased at the 1e-2 level."""
    rng = StdRng(bytes(range(32)))
    xs = np.asarray([rng.gen_f64() for _ in range(20000)])
    assert ((xs >= 0.0) & (xs < 1.0)).all()
    assert abs(xs.mean() - 0.5) < 0.01


def test_more_balls_layout_invariants():
    """The generated grid satisfies example_scenes.rs:99-131 exactly:
    one sphere per (x, z) cell with z != 0, radius in [0.1, 0.3), center
    inside the cell with the radius margin, y = radius, and the 0.7/0.7
    Bernoulli material mix near its expectation."""
    from potato_tpu.scene import examples

    s = examples.more_balls()
    # 4 fixed spheres + 62 x-values * 61 z-values (z == 0 skipped)
    assert len(s.sphere_radius) == 4 + 62 * 61
    i = 4
    for x in range(-31, 31):
        for z in range(-31, 31):
            if z == 0:
                continue
            center = s.sphere_center[i]
            radius = s.sphere_radius[i]
            assert 0.1 <= radius < 0.3
            assert center[1] == radius
            assert abs(center[0] - x) <= 0.5 - radius + 1e-12
            assert abs(center[2] - z) <= 0.5 - radius + 1e-12
            i += 1
    # material mix: lambert 0.7, metal 0.3*0.7, glass 0.3*0.3
    from potato_tpu.scene import description as d

    kinds = np.asarray([s.materials[m].scatter.kind
                        for m in s.sphere_material[4:]])
    frac_lambert = float(np.mean(kinds == d.SCATTER_LAMBERT))
    frac_glass = float(np.mean(kinds == d.SCATTER_DIELECTRIC))
    assert abs(frac_lambert - 0.7) < 0.03
    assert abs(frac_glass - 0.09) < 0.02


def test_more_balls_digest_stable():
    """Regression pin: blake2b digest of the full (center, radius) layout
    (deterministic across platforms — pure-integer ChaCha + exact f64
    dyadic arithmetic)."""
    from potato_tpu.scene import examples

    s = examples.more_balls()
    arr = np.concatenate(
        [np.asarray(s.sphere_center, np.float64),
         np.asarray(s.sphere_radius, np.float64)[:, None]], axis=1)
    h = hashlib.blake2b(arr.tobytes(), digest_size=8).hexdigest()
    assert h == "b2f73488f470c993"
