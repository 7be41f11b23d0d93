"""Core foundation: types, math, color, RNG, sampling, and noise.

TPU-native analogue of the reference's L1 foundation layer
(src/utility.rs, src/randomness.rs): everything here is pure jnp on
SoA batches with static shapes.
"""
