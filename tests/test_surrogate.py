"""Score-function surrogate for the dielectric's Bernoulli choice.

VERDICT r1 item 8: ops/material.py promises the reflect-vs-refract choice
probability gradient "can be recovered with a score-function surrogate
(potato_tpu.diff)". These tests verify the estimator identity and its
wiring through eval_scatter / eval_material.
"""

import jax
import jax.numpy as jnp
import numpy as np

from potato_tpu.core.types import HitBatch
from potato_tpu.diff.surrogate import bernoulli_expectation_grad, score_weight
from potato_tpu.ops.material import eval_material, eval_scatter
from potato_tpu.scene.description import Absorb, Emit, Material, Scatter, SceneBuilder


def test_score_weight_forward_is_one():
    p = jnp.asarray([0.1, 0.5, 0.9])
    chose = jnp.asarray([True, False, True])
    np.testing.assert_allclose(np.asarray(score_weight(p, chose)), 1.0)


def test_estimator_matches_analytic_expectation_grad():
    """d/dθ E[f(b)], b ~ Bernoulli(p(θ)): score estimator over stratified
    uniforms vs the closed form (f_true - f_false) · dp/dθ."""
    n = 1 << 14
    u = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    f_true, f_false = 2.0, -1.0

    def expected(theta):
        p = 0.3 + 0.4 * jax.nn.sigmoid(theta)
        return bernoulli_expectation_grad(f_true, f_false,
                                          jnp.full((n,), p), u)

    theta = 0.37
    got = float(jax.grad(expected)(jnp.asarray(theta)))
    p = 0.3 + 0.4 / (1 + np.exp(-theta))
    dp = 0.4 * (p - 0.3) / 0.4 * (1 - (p - 0.3) / 0.4) * 0.4 / 0.4  # sig'(θ)
    dp = 0.4 * (1 / (1 + np.exp(-theta))) * (1 - 1 / (1 + np.exp(-theta)))
    want = (f_true - f_false) * dp
    # stratified sampling: estimator error is O(1/n) at the flip boundary
    np.testing.assert_allclose(got, want, rtol=2e-3)


def _dielectric_setup(n):
    s = SceneBuilder()
    s.add_material(Material(Scatter.dielectric(1.5), Absorb.white_body(),
                            Emit.none()))
    s.add_sphere((0, 0, 0), 1.0, 0)
    tables = s.build(accel="brute").tables
    d = jnp.tile(jnp.asarray([[np.sqrt(0.5), -np.sqrt(0.5), 0.0]],
                             jnp.float32), (n, 1))
    hit = HitBatch(
        t=jnp.ones((n,)),
        position=jnp.zeros((n, 3)),
        normal=jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1)),
        uv=jnp.zeros((n, 2)),
        material=jnp.zeros((n,), jnp.int32),
        valid=jnp.ones((n,), bool),
    )
    return tables, d, hit


def test_ior_choice_probability_gradient_recovered():
    """E[w·1_reflect] differentiates to dR/d(IOR) (Schlick reflectance) —
    the exact term the detached Bernoulli drops; FD of the true reflectance
    is the oracle."""
    n = 1 << 14
    tables, d, hit = _dielectric_setup(n)
    u = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    zeros = jnp.zeros((n,))

    def mean_reflect_indicator(ior):
        out = eval_scatter(tables, tables.m_scatter_kind[hit.material],
                           jnp.full((n,), ior), d, hit, zeros, zeros, zeros,
                           u, ior_score=True)
        # reflected rays keep a positive y component
        reflected = out.direction[:, 1] > 0.0
        return jnp.mean(out.weight * reflected.astype(jnp.float32))

    ior = 1.5
    got = float(jax.grad(mean_reflect_indicator)(jnp.asarray(ior)))

    def reflectance(ior):
        from potato_tpu.core import math as pmath
        cos = jnp.asarray(-np.sqrt(0.5), jnp.float32)
        return pmath.schlick_reflectance(cos, 1.0 / ior)

    eps = 1e-3
    want = float((reflectance(ior + eps) - reflectance(ior - eps)) / (2 * eps))
    np.testing.assert_allclose(got, want, rtol=5e-2)


def test_render_ior_gradient_includes_choice_term():
    """End-to-end wiring (VERDICT r2 item 5): d(mean image)/d(IOR) through
    a real render. Scene: a dielectric sphere against a bright sky with
    max_bounce=2, so refracted paths die black inside the sphere while
    reflected paths escape to the sky — the image depends on IOR almost
    entirely through the reflect-probability (the choice term the detached
    Bernoulli drops). The finite difference with common random numbers is
    the oracle: ior_score=True must match it; ior_score=False must not."""
    from potato_tpu.render.renderer import make_intersect_fn, render_chunk
    from potato_tpu.scene.description import Camera

    s = SceneBuilder()
    m = s.add_material(Material(Scatter.dielectric(1.5), Absorb.white_body(),
                                Emit.none()))
    s.add_sphere((0.0, 0.0, -2.2), 1.0, m)
    s.camera = Camera(fov=np.pi / 3)  # sphere fills most of the frame
    compiled = s.build(accel="brute")
    w = h = 12
    spp, mb, seed = 48, 2, 3
    ids = jnp.arange(w * h * spp, dtype=jnp.uint32)
    intersect_fn = make_intersect_fn(compiled)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def mean_image(ior, score):
        tables = compiled.tables._replace(
            m_scatter_param=jnp.full_like(compiled.tables.m_scatter_param,
                                          ior))
        out = render_chunk(tables, compiled.camera, ids,
                           intersect_fn=intersect_fn, width=w, height=h,
                           spp=spp, max_bounce=mb, seed=seed,
                           ior_score=score)
        return jnp.mean(out.color)

    @partial(jax.jit, static_argnums=1)
    def grad_image(ior, score):
        return jax.grad(lambda i: mean_image(i, score))(ior)

    g_on = float(grad_image(jnp.asarray(1.5), True))
    g_off = float(grad_image(jnp.asarray(1.5), False))
    eps = 0.05  # wide FD step: flips are discrete, need many in the bracket
    fd = float((mean_image(jnp.asarray(1.5 + eps), False)
                - mean_image(jnp.asarray(1.5 - eps), False)) / (2 * eps))
    # the surrogate gradient is a different unbiased estimator than the FD
    # flip count — both are stochastic, so gate loosely but decisively
    assert abs(g_on - fd) < 0.4 * abs(fd), (g_on, g_off, fd)
    assert abs(g_off - fd) > 3 * abs(g_on - fd), (g_on, g_off, fd)


def test_eval_material_folds_weight_into_absorb():
    n = 8
    tables, d, hit = _dielectric_setup(n)
    u = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    zeros = jnp.zeros((n,))
    out = eval_material(tables, hit.material, d, hit, zeros, zeros, zeros, u,
                        ior_score=True)
    # forward value of the weight is exactly 1 -> absorb unchanged (white)
    np.testing.assert_allclose(np.asarray(out.absorb), 1.0)
    out_off = eval_material(tables, hit.material, d, hit, zeros, zeros,
                            zeros, u)
    np.testing.assert_allclose(np.asarray(out.scatter.direction),
                               np.asarray(out_off.scatter.direction))
