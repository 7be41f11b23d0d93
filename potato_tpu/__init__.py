"""potato_tpu — a TPU-native differentiable path tracer.

A brand-new JAX/XLA/Pallas framework with the capabilities of the Rust CPU
raytracer `alucas2/raytracing-potato` (reference mounted at /root/reference),
re-designed TPU-first:

- wavefront (ray-batch) integrator with a static-shape bounce loop and a
  throughput accumulator instead of the reference's recursive megaloop
  (reference: src/render.rs:94-146),
- counter-based threefry RNG keyed on global ray ids instead of stateful
  `StdRng` streams (reference: src/randomness.rs:5),
- branchless one-hot material/texture dispatch over flat SoA scene tables
  (the reference's index-table design, src/render.rs:10-14, kept as data),
- LBVH over Morton-sorted primitive clusters with packetized traversal
  instead of a recursive median-split tree (reference: src/bvh.rs),
- sharding over a `jax.sharding.Mesh` of TPU chips instead of an OS-thread
  tile queue (reference: src/main.rs:36-103),
- differentiable shading/texturing so pixel gradients flow to albedo,
  fuzz, IOR, emission, and texture texels.
"""

__version__ = "0.1.0"

from potato_tpu.core import types, math, color, rng, sampling, noise  # noqa: F401
