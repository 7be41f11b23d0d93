"""Pixel-gradient validation against finite differences (BASELINE north star).

The render is a deterministic function of scene parameters for a fixed
seed, so central finite differences are exact up to O(eps^2) wherever the
function is smooth in the parameter:

- albedo / emission / texels / background enter the radiance polynomially
  -> tight agreement required;
- metal fuzziness moves scattered rays (reparameterized sampling)
  -> smooth between visibility events; moderate tolerance;
- dielectric IOR flows through Schlick + refraction direction with the
  Bernoulli branch detached -> FD agreement holds when no sample's branch
  flips inside the FD stencil (checked with a tiny eps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from potato_tpu.diff import make_render_loss, optimize_textures
from potato_tpu.scene import examples


def _fd_check(scene_builder, field, rel_tol, eps, *, index=None, spp=2,
              size=12, max_bounce=3, seed=11, accel="brute"):
    scene = scene_builder.build(accel=accel)
    total = size * size * spp
    ray_ids = jnp.arange(total, dtype=jnp.uint32)
    target = jnp.zeros((size * size, 3), jnp.float32)  # loss = mean(color^2)

    loss = make_render_loss(scene, width=size, height=size, spp=spp,
                            max_bounce=max_bounce, seed=seed, fields=(field,))
    base = jnp.asarray(getattr(scene.tables, field))

    f = jax.jit(lambda p: loss({field: p}, ray_ids, target))
    g = np.asarray(jax.jit(jax.grad(lambda p: loss({field: p}, ray_ids, target)))(base))

    if index is None:
        flat = np.abs(g).ravel()
        index = np.unravel_index(int(flat.argmax()), g.shape)
    basis = np.zeros_like(np.asarray(base))
    basis[index] = 1.0
    basis = jnp.asarray(basis)

    f_plus = float(f(base + eps * basis))
    f_minus = float(f(base - eps * basis))
    fd = (f_plus - f_minus) / (2 * eps)
    ad = float(g[index])
    assert np.isfinite(ad)
    denom = max(abs(fd), abs(ad), 1e-8)
    assert abs(fd - ad) / denom < rel_tol, (
        f"{field}[{index}]: AD {ad:.6g} vs FD {fd:.6g}")
    return ad


def test_albedo_gradient_matches_fd():
    ad = _fd_check(examples.three_balls(), "m_absorb_color", 5e-3, 1e-2)
    assert abs(ad) > 1e-6


def test_solid_texture_gradient_matches_fd():
    ad = _fd_check(examples.three_balls(), "t_color", 5e-3, 1e-2)
    assert abs(ad) > 1e-6


def test_emission_gradient_matches_fd():
    s = examples.three_balls()
    # make one material emissive so the emit table matters
    from potato_tpu.scene.description import Emit
    import dataclasses
    s.materials[1] = dataclasses.replace(s.materials[1], emit=Emit.color_(0.5, 0.2, 0.1))
    ad = _fd_check(s, "m_emit_color", 5e-3, 1e-2)
    assert abs(ad) > 1e-6


def test_background_gradient_matches_fd():
    from potato_tpu.scene.description import Emit
    s = examples.three_balls()
    s.background = Emit.color_(0.9, 0.8, 1.0)
    ad = _fd_check(s, "bg_color", 5e-3, 1e-2)
    assert abs(ad) > 1e-6


def test_atlas_texel_gradient_matches_fd():
    ad = _fd_check(examples.earth(), "atlas", 2e-3, 1e-2, size=10)
    assert abs(ad) > 1e-6


# --- gradients through the PRODUCTION accel (flash kernel, interpret) ---
# The kernel's raw outputs (t, winning slot) are detached (stop_gradient,
# ops/flash.py intersect_flash docstring); parameter gradients flow through
# the epilogue's unified shade-table gather and the XLA sphere test. These
# checks pin that path against finite differences for the optimizer's
# DIFFERENTIABLE_FIELDS — the same accel bench.py measures.

def test_albedo_gradient_matches_fd_flash():
    # 8x8 x 2 bounces (was 12x12 x 3): the interpret-mode flash grad is
    # the slow tier's dominant cost, and the check is |ad| moves + FD
    # agreement, not image quality (VERDICT r5 item #7)
    ad = _fd_check(examples.three_balls(), "m_absorb_color", 5e-3, 1e-2,
                   size=8, max_bounce=2, accel="flash")
    assert abs(ad) > 1e-6


def test_atlas_texel_gradient_matches_fd_flash():
    ad = _fd_check(examples.earth(), "atlas", 2e-3, 1e-2, size=8,
                   max_bounce=2, accel="flash")
    assert abs(ad) > 1e-6


def test_fuzz_gradient_matches_fd_flash():
    from potato_tpu.scene.description import Absorb, Camera, Emit, Material, Scatter, SceneBuilder
    s = SceneBuilder()
    s.camera = Camera(fov=0.3, position=(0.0, 0.0, 0.0), target=(0.0, 0.0, -2.0))
    m0 = s.add_material(Material(Scatter.metal(0.3), Absorb.albedo(0.9, 0.9, 0.9), Emit.none()))
    s.add_sphere((0.0, 0.0, -2.0), 1.0, m0)
    ad = _fd_check(s, "m_scatter_param", 3e-2, 3e-3, index=(0,), spp=4,
                   max_bounce=2, accel="flash")
    assert abs(ad) > 1e-5


def test_flash_gradient_matches_brute_gradient():
    """Full-vector gradient agreement between the brute and flash paths on
    a triangle-mesh scene (bunny-free: the one_triangle debug scene plus a
    sphere), for albedo and emission simultaneously.

    Slow-tier shrink (VERDICT r5 item #7): both fields ride ONE backward
    pass per accel (a dict-valued loss) and the frame is 8x8x2 — the
    interpret-mode flash grad dominates full-suite latency, and this
    assertion needs gradient agreement, not image quality."""
    fields = ("m_absorb_color", "m_emit_color")
    g = {}
    for accel in ("brute", "flash"):
        scene = examples.one_triangle().build(accel=accel)
        size, spp = 8, 2
        ray_ids = jnp.arange(size * size * spp, dtype=jnp.uint32)
        target = jnp.zeros((size * size, 3), jnp.float32)
        loss = make_render_loss(scene, width=size, height=size, spp=spp,
                                max_bounce=3, seed=7, fields=fields)
        base = {f: jnp.asarray(getattr(scene.tables, f)) for f in fields}
        g[accel] = jax.tree_util.tree_map(
            np.asarray,
            jax.grad(lambda p: loss(p, ray_ids, target))(base))
    for f in fields:
        np.testing.assert_allclose(g["flash"][f], g["brute"][f], rtol=2e-4,
                                   atol=1e-7)


def test_fuzz_gradient_matches_fd():
    """Metal fuzziness via reparameterized sampling.

    Fixed-seed FD measures the derivative of the realized (branch-fixed)
    estimator — exactly what reparameterized AD computes — but only where
    no discontinuity (backface cull, visibility change) sits inside the FD
    stencil, and only when the loss signal clears f32 rounding. So: narrow
    fov onto the sphere center (no silhouette lanes, scattered rays end in
    the smooth sky gradient) and a moderate eps.
    """
    from potato_tpu.scene.description import Absorb, Camera, Emit, Material, Scatter, SceneBuilder
    s = SceneBuilder()
    s.camera = Camera(fov=0.3, position=(0.0, 0.0, 0.0), target=(0.0, 0.0, -2.0))
    m0 = s.add_material(Material(Scatter.metal(0.3), Absorb.albedo(0.9, 0.9, 0.9), Emit.none()))
    s.add_sphere((0.0, 0.0, -2.0), 1.0, m0)
    ad = _fd_check(s, "m_scatter_param", 3e-2, 3e-3, index=(0,), spp=4,
                   max_bounce=2)
    assert abs(ad) > 1e-5


def test_ior_gradient_matches_fd():
    """Dielectric IOR, PATHWISE estimator (ior_score=False): gradients flow
    through Schlick and the refracted direction; the Bernoulli branch is
    detached — which is exactly what a fixed-seed FD measures *between*
    branch flips. The loss is piecewise smooth with flip points spaced
    ~1e-2 apart in IOR, so a single FD stencil can straddle one; instead
    compare AD vs tiny-eps FD at several base points and require the
    median relative error to be small (the median is immune to the
    minority of stencils that catch a flip).

    The FULL estimator (make_render_loss enables the score-function
    surrogate whenever m_scatter_param is optimized) additionally carries
    the choice-probability term, which tiny-eps FD between flips cannot
    see — it is validated against a wide-stencil flip-capturing FD in
    tests/test_surrogate.py::test_render_ior_gradient_includes_choice_term.
    """
    import jax
    from functools import partial

    from potato_tpu.render.renderer import make_intersect_fn, render_chunk
    from potato_tpu.scene.description import Absorb, Camera, Emit, Material, Scatter, SceneBuilder
    s = SceneBuilder()
    s.camera = Camera(fov=0.4, position=(0.0, 0.0, 0.0), target=(0.0, 0.0, -2.0))
    m0 = s.add_material(Material(Scatter.dielectric(1.5), Absorb.albedo(0.8, 0.9, 1.0), Emit.none()))
    s.add_sphere((0.0, 0.0, -2.0), 0.9, m0)
    scene = s.build(accel="brute")
    # 16x16 @ 4 spp, seed 17, eps 1e-3: the realized pathwise gradient
    # depends on the noise realization, and the FD quantum is
    # ulp(loss)/(2 eps) ~ 6e-5 on an f32 loss — the seed is chosen so
    # |ad| ~ 6e-4 clears it 10x (re-swept for the r5 13-round stream:
    # the r4 seed's realization fell to ~6e-5, under the quantum).
    size, spp = 16, 4
    total = size * size * spp
    ray_ids = jnp.arange(total, dtype=jnp.uint32)
    target = jnp.zeros((size * size, 3), jnp.float32)
    chunk_fn = partial(render_chunk, intersect_fn=make_intersect_fn(scene),
                       width=size, height=size, spp=spp, max_bounce=4,
                       seed=17, ior_score=False)

    def loss(params, ray_ids, target):
        tables = scene.tables._replace(**params)
        out = chunk_fn(tables, scene.camera, ray_ids)
        pixel_color = out.color.reshape(-1, spp, 3).mean(axis=1)
        return jnp.mean((pixel_color - target) ** 2)

    f = jax.jit(lambda p: loss({"m_scatter_param": p[None]}, ray_ids, target))
    g = jax.jit(jax.grad(lambda p: loss({"m_scatter_param": p[None]}, ray_ids, target)))

    eps = 1e-3
    rel_errs = []
    # measured per-point rel errs at this config (r5 stream): [0.006,
    # 1.02, 1.03, 0.000, 1.03, 0.043, 0.045] — three stencils straddle
    # branch flips; the median is immune to that minority
    for base in (1.4931, 1.4967, 1.4990, 1.5005, 1.5041, 1.5062, 1.5098):
        b = jnp.float32(base)
        fd = (float(f(b + eps)) - float(f(b - eps))) / (2 * eps)
        ad = float(g(b))
        assert np.isfinite(ad)
        assert abs(ad) > 1e-4
        rel_errs.append(abs(fd - ad) / max(abs(fd), abs(ad), 1e-8))
    assert np.median(rel_errs) < 0.2, rel_errs


def test_texture_optimization_recovers_texels():
    """Config 5 miniature: start from a wrong atlas, descend to the target
    render, verify loss drops by >10x and checkpoint/resume works."""
    import os
    import tempfile

    from potato_tpu.render.renderer import render

    scene = examples.earth().build(accel="brute")
    size = 10
    target = render(scene, size, size, spp=2, max_bounce=3, seed=5).color

    with tempfile.TemporaryDirectory() as d:
        ckpt = os.path.join(d, "opt.npz")
        res1 = optimize_textures(
            scene, target, width=size, height=size, spp=2, max_bounce=3,
            seed=5, steps=8, learning_rate=0.1,
            checkpoint_path=ckpt, checkpoint_every=4, log_every=0,
            init={"atlas": np.full_like(np.asarray(scene.tables.atlas), 0.3)})
        assert os.path.exists(ckpt)
        # resume continues from the checkpoint, not from scratch
        res2 = optimize_textures(
            scene, target, width=size, height=size, spp=2, max_bounce=3,
            seed=5, steps=16, learning_rate=0.1,
            checkpoint_path=ckpt, checkpoint_every=4, log_every=0)
        assert res2.losses[0] == pytest.approx(res1.losses[0])
        assert len(res2.losses) >= 16
        assert min(res2.losses) < res1.losses[0] / 8
