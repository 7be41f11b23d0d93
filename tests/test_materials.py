"""Unit tests for branchless material/texture evaluation and gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from potato_tpu.core.types import HitBatch
from potato_tpu.ops.material import eval_material, eval_scatter
from potato_tpu.ops.texture import sample_texture
from potato_tpu.scene.description import (
    Absorb, Emit, Material, Scatter, SceneBuilder, Texture,
)

import pytest

# sub-second unit tier: the pre-commit gate (tools/cpupytest -m fast)
pytestmark = pytest.mark.fast


def _tables(materials, textures=()):
    s = SceneBuilder()
    for t in textures:
        s.add_texture(t)
    for m in materials:
        s.add_material(m)
    s.add_sphere((0, 0, 0), 1.0, 0)
    return s.build(accel="brute").tables


def _hit(normal, position=(0.0, 0.0, 0.0), uv=(0.0, 0.0)):
    return HitBatch(
        t=jnp.array([1.0]),
        position=jnp.array([position], jnp.float32),
        normal=jnp.array([normal], jnp.float32),
        uv=jnp.array([uv], jnp.float32),
        material=jnp.array([0], jnp.int32),
        valid=jnp.array([True]),
    )


U = (jnp.array([0.3]), jnp.array([0.6]), jnp.array([0.2]), jnp.array([0.9]))


def test_lambert_backface_culled():
    t = _tables([Material(Scatter.lambert(), Absorb.albedo(1, 0, 0), Emit.none())])
    down = jnp.array([[0.0, -1.0, 0.0]])
    up_normal = _hit((0.0, 1.0, 0.0))
    out = eval_scatter(t, t.m_scatter_kind[:1], t.m_scatter_param[:1], down, up_normal, *U)
    assert bool(out.valid[0])
    # ray going *up* hits a surface whose normal also points up -> backface
    out2 = eval_scatter(t, t.m_scatter_kind[:1], t.m_scatter_param[:1],
                        -down, up_normal, *U)
    assert not bool(out2.valid[0])
    # scattered direction is in the normal hemisphere (lambert property)
    assert float(out.direction[0] @ jnp.array([0.0, 1.0, 0.0])) > -1e-6


def test_metal_zero_fuzz_is_mirror():
    t = _tables([Material(Scatter.metal(0.0), Absorb.albedo(1, 1, 1), Emit.none())])
    d = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)
    out = eval_scatter(t, t.m_scatter_kind[:1], t.m_scatter_param[:1], d,
                       _hit((0.0, 1.0, 0.0)), *U)
    assert bool(out.valid[0])
    np.testing.assert_allclose(np.asarray(out.direction[0]),
                               [1 / np.sqrt(2), 1 / np.sqrt(2), 0], atol=1e-6)


def test_dielectric_always_scatters_and_bends():
    t = _tables([Material(Scatter.dielectric(1.5), Absorb.white_body(), Emit.none())])
    d = jnp.array([[np.sqrt(0.5), -np.sqrt(0.5), 0.0]], dtype=jnp.float32)
    # u4 = 0.9 > reflectance at 45 deg (~0.05) -> refraction branch
    out = eval_scatter(t, t.m_scatter_kind[:1], t.m_scatter_param[:1], d,
                       _hit((0.0, 1.0, 0.0)), *U)
    assert bool(out.valid[0])
    got = np.asarray(out.direction[0])
    sin_out = abs(got[0])
    np.testing.assert_allclose(sin_out, np.sqrt(0.5) / 1.5, atol=1e-5)
    # u4 small -> reflection branch
    out2 = eval_scatter(t, t.m_scatter_kind[:1], t.m_scatter_param[:1], d,
                        _hit((0.0, 1.0, 0.0)), U[0], U[1], U[2], jnp.array([0.0]))
    np.testing.assert_allclose(np.asarray(out2.direction[0]),
                               [np.sqrt(0.5), np.sqrt(0.5), 0], atol=1e-5)


def test_emit_and_absorb_kinds():
    t = _tables(
        [Material(Scatter.none(), Absorb.albedo_map(1), Emit.color_(2.0, 3.0, 4.0))],
        textures=[Texture.solid(0.5, 0.5, 0.5), Texture.debug_uvs()])
    hit = _hit((0, 1, 0), uv=(0.25, 0.75))
    out = eval_material(t, jnp.array([0]), jnp.array([[0.0, -1.0, 0.0]]), hit, *U)
    assert not bool(out.scatter.valid[0])
    np.testing.assert_allclose(np.asarray(out.emit[0]), [2, 3, 4], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.absorb[0]), [0.25, 0.75, 0.0], atol=1e-6)


def test_checker_parity():
    t = _tables(
        [Material(Scatter.none(), Absorb.albedo_map(2), Emit.none())],
        textures=[Texture.solid(1, 0, 0), Texture.solid(0, 1, 0),
                  Texture.checker(0, 1)])
    # even cell (0.5,0.5,0.5): floor sum 0 -> even child (index 1) = green
    even = sample_texture(t, jnp.array([2]), jnp.array([[0.5, 0.5, 0.5]]),
                          jnp.zeros((1, 2)))
    np.testing.assert_allclose(np.asarray(even[0]), [0, 1, 0], atol=1e-6)
    # odd cell (1.5,0.5,0.5) -> odd child (index 0) = red
    odd = sample_texture(t, jnp.array([2]), jnp.array([[1.5, 0.5, 0.5]]),
                         jnp.zeros((1, 2)))
    np.testing.assert_allclose(np.asarray(odd[0]), [1, 0, 0], atol=1e-6)
    # negative odd cell: floor(-2.5) = -3 -> odd whichever mod convention
    odd2 = sample_texture(t, jnp.array([2]), jnp.array([[-2.5, 0.5, 0.5]]),
                          jnp.zeros((1, 2)))
    np.testing.assert_allclose(np.asarray(odd2[0]), [1, 0, 0], atol=1e-6)


def test_image_texture_gradient_flows_to_atlas():
    img = np.full((2, 2, 3), 0.5, np.float32)
    t = _tables(
        [Material(Scatter.none(), Absorb.albedo_map(0), Emit.none())],
        textures=[Texture.image_(img)])

    def loss(atlas):
        tt = t._replace(atlas=atlas)
        v = sample_texture(tt, jnp.array([0]), jnp.zeros((1, 3)),
                           jnp.array([[0.1, 0.6]]))
        return jnp.sum(v * jnp.array([1.0, 2.0, 3.0]))

    g = jax.grad(loss)(t.atlas)
    g = np.asarray(g)
    # exactly one texel (i=0, j=1) receives the cotangent
    assert g.shape == t.atlas.shape
    np.testing.assert_allclose(g[2], [1, 2, 3], atol=1e-6)  # j*w+i = 1*2+0
    assert np.abs(g).sum() == 6.0


def test_fuzz_gradient_is_finite_and_nonzero():
    t = _tables([Material(Scatter.metal(0.3), Absorb.albedo(1, 1, 1), Emit.none())])
    d = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)

    def f(param):
        out = eval_scatter(t, t.m_scatter_kind[:1], param[None], d,
                           _hit((0.0, 1.0, 0.0)), *U)
        return jnp.sum(out.direction * jnp.array([1.0, 2.0, 3.0]))

    g = jax.grad(f)(jnp.float32(0.3))
    assert np.isfinite(float(g)) and abs(float(g)) > 1e-6


def test_checker_depth_derived_from_texture_graph():
    """A checker-of-checker chain deeper than the old static unroll (2)
    must sample the leaf colors, not silently go black (round-3 verdict
    item: the reference's recursion is arbitrary-depth,
    src/texture.rs:51-60)."""
    import jax.numpy as jnp

    from potato_tpu.scene.description import (
        Absorb, Emit, Material, Scatter, SceneBuilder, Texture,
    )

    s = SceneBuilder()
    red = s.add_texture(Texture.solid(1.0, 0.0, 0.0))
    blue = s.add_texture(Texture.solid(0.0, 0.0, 1.0))
    c1 = s.add_texture(Texture.checker(red, blue))     # depth 1
    c2 = s.add_texture(Texture.checker(c1, red))       # depth 2
    c3 = s.add_texture(Texture.checker(c2, blue))      # depth 3
    m = s.add_material(Material(Scatter.lambert(),
                                Absorb.albedo_map(c3), Emit.none()))
    s.add_sphere((0.0, 0.0, 0.0), 1.0, m)
    scene = s.build(accel="brute")
    assert scene.features.checker_depth == 3

    # a position whose parity chain reaches the depth-1 checker's leaves:
    # every level must recurse, never truncate to black
    pos = jnp.array([[0.5, 0.5, 0.5]])   # all floors even -> even branch
    out = sample_texture(scene.tables, jnp.array([c3]), pos,
                         jnp.zeros((1, 2)), depth=scene.features.checker_depth)
    # even(c3)->blue? c3 children=(odd=c2, even=blue): even pos -> blue
    np.testing.assert_allclose(np.asarray(out)[0], [0.0, 0.0, 1.0])
    # odd position: c3 -> c2; at the same point parity is odd everywhere:
    # c2 children=(odd=c1, even=red) -> c1; c1 children=(odd=red, even=blue)
    pos_odd = jnp.array([[1.5, 0.5, 0.5]])
    out_odd = sample_texture(scene.tables, jnp.array([c3]), pos_odd,
                             jnp.zeros((1, 2)),
                             depth=scene.features.checker_depth)
    np.testing.assert_allclose(np.asarray(out_odd)[0], [1.0, 0.0, 0.0])


def test_checker_cycle_is_compile_error():
    """A cyclic checker graph must fail scene compilation (the reference
    has no cycle detection — its own TODO, example_scenes.rs:11-12)."""
    import pytest as _pytest

    from potato_tpu.scene.description import (
        Absorb, Emit, Material, Scatter, SceneBuilder, Texture,
    )

    s = SceneBuilder()
    red = s.add_texture(Texture.solid(1.0, 0.0, 0.0))
    c1 = s.add_texture(Texture.checker(red, red))
    # rewire c1 onto itself: checker -> checker -> ... forever
    s.textures[c1] = Texture.checker(c1, red)
    m = s.add_material(Material(Scatter.lambert(),
                                Absorb.albedo_map(c1), Emit.none()))
    s.add_sphere((0.0, 0.0, 0.0), 1.0, m)
    with _pytest.raises(ValueError, match="cycle"):
        s.build(accel="brute")
