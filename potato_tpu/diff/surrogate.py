"""Score-function (REINFORCE) surrogate for discrete sampling choices.

The dielectric material flips a Bernoulli coin between reflection and
refraction with probability = Schlick reflectance(IOR) (reference
src/material.rs:168-172). The *draw* is detached (sampled against a
stop-gradded probability, ops/material.py), so pathwise gradients see only
the continuous dependence of the chosen direction on IOR — the dependence
of the choice probability itself is lost.

The missing term is recovered with the score-function identity

    d/dθ E_b[f(b)] = E_b[f(b) · d/dθ log p_b(θ)] + E_b[d/dθ f(b)]

implemented as a multiplicative weight w = p_b / stop_grad(p_b): its
forward value is exactly 1 (images are unchanged), while its gradient is
d log p_b. Multiplying path throughput by w at each stochastic choice makes
the estimator of d(image)/d(IOR) unbiased across branch flips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def score_weight(prob_true, chose_true):
    """Importance weight for one Bernoulli choice.

    prob_true: (B,) differentiable probability of the branch `chose_true`
        refers to (e.g. Schlick reflectance of the reflect branch).
    chose_true: (B,) bool, the branch actually sampled.

    Returns (B,) weights with value exactly 1.0 and gradient
    d log p_b = d p_b / p_b. Probabilities are clamped away from 0/1 for
    gradient stability (a branch sampled at probability ~0 cannot occur, so
    the clamp is gradient-side only in practice).
    """
    p = jnp.clip(prob_true, 1e-6, 1.0 - 1e-6)
    p_b = jnp.where(chose_true, p, 1.0 - p)
    return p_b / jax.lax.stop_gradient(p_b)


def bernoulli_expectation_grad(f_true, f_false, prob_true, u):
    """Reference estimator used by tests: E over stratified draws u of
    w(b)·f(b) with b = (u < p). Differentiating the returned value w.r.t.
    parameters of `prob_true` matches d/dθ [p·f_true + (1-p)·f_false]."""
    chose = u < jax.lax.stop_gradient(prob_true)
    w = score_weight(prob_true, chose)
    return jnp.mean(w * jnp.where(chose, f_true, f_false))
