"""Differentiable rendering: parameter selection, loss functions, optimization.

The reference is a forward-only renderer; differentiability is this build's
north-star extension (BASELINE.json): pixel gradients flow to material
albedo, metal fuzziness, dielectric IOR, emission colors, and texture
texels through the path integral, using reparameterized sampling (fuzz
direction) and detached discrete choices (dielectric Bernoulli), validated
against finite differences in tests/test_gradients.py.
"""

from potato_tpu.diff.optimize import (  # noqa: F401
    make_render_loss,
    optimize_textures,
)
