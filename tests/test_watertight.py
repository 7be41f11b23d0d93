"""Watertight Möller–Trumbore properties (BASELINE north star).

The watertight form (Woop, Benthin & Wald 2013; ops/intersect.py
triangle_hit_t_watertight) must (a) agree with the reference's Cramer form
on generic hits, and (b) never leak through shared edges/vertices: a ray
crossing the shared edge of a two-triangle quad must hit at least one of
the two triangles — the Cramer form can reject both by opposite-sign
rounding of the barycentrics.
"""

import jax.numpy as jnp
import numpy as np

from potato_tpu.ops.intersect import (
    triangle_hit_t,
    triangle_hit_t_watertight,
)


def test_matches_cramer_on_generic_hits():
    rng = np.random.default_rng(0)
    n = 4096
    pa, pb, pc = (jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
                  for _ in range(3))
    o = jnp.asarray(rng.normal(size=(n, 3)) * 3, jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    t0, u0, v0, ok0 = triangle_hit_t(pa, pb, pc, o, d, 1e-3, 1e9)
    t1, u1, v1, ok1 = triangle_hit_t_watertight(pa, pb, pc, o, d, 1e-3, 1e9)
    ok0, ok1 = np.asarray(ok0), np.asarray(ok1)
    # the two forms may disagree only within rounding of an edge; generic
    # random rays virtually never sit there
    assert (ok0 == ok1).mean() > 0.999
    m = ok0 & ok1
    np.testing.assert_allclose(np.asarray(t0)[m], np.asarray(t1)[m],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(u0)[m], np.asarray(u1)[m],
                               rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(v0)[m], np.asarray(v1)[m],
                               rtol=1e-2, atol=2e-3)


def _edge_pair(rng, n):
    """Planar quads split into two triangles sharing the diagonal (p0, p1).

    Planarity matters: the watertight guarantee is that a ray crossing a
    surface tiled by adjacent triangles registers on one of them; a sharply
    folded (non-planar) pair can be legitimately grazed at the crease."""
    p0 = rng.normal(size=(n, 3)).astype(np.float32)
    e1 = rng.normal(size=(n, 3)).astype(np.float32)
    e2 = rng.normal(size=(n, 3)).astype(np.float32)
    p1 = p0 + e1
    b = rng.uniform(0.5, 2.0, size=(n, 1)).astype(np.float32)
    d = rng.uniform(0.5, 2.0, size=(n, 1)).astype(np.float32)
    a = rng.uniform(-0.5, 1.5, size=(n, 1)).astype(np.float32)
    c = rng.uniform(-0.5, 1.5, size=(n, 1)).astype(np.float32)
    q0 = p0 + a * e1 + b * e2     # one side of the edge, in plane (e1, e2)
    q1 = p0 + c * e1 - d * e2     # opposite side, same plane
    # tri A = (p0, p1, q0), tri B = (p1, p0, q1): shared edge p0-p1
    return p0, p1, q0, q1


def test_shared_edge_never_leaks():
    """Rays aimed exactly at points of the shared edge hit >= 1 triangle."""
    rng = np.random.default_rng(1)
    n = 8192
    p0, p1, q0, q1 = _edge_pair(rng, n)
    lam = rng.uniform(0.05, 0.95, size=(n, 1)).astype(np.float32)
    target = p0 * (1 - lam) + p1 * lam          # on the shared edge
    origin = rng.normal(size=(n, 3)).astype(np.float32) * 4
    d = (target - origin)

    args = (jnp.asarray(origin), jnp.asarray(d), 1e-4, 1e9)
    _, _, _, hit_a = triangle_hit_t_watertight(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(q0), *args)
    _, _, _, hit_b = triangle_hit_t_watertight(
        jnp.asarray(p1), jnp.asarray(p0), jnp.asarray(q1), *args)
    leaked = ~(np.asarray(hit_a) | np.asarray(hit_b))
    assert leaked.sum() == 0, f"{leaked.sum()} / {n} edge rays leaked"


def test_shared_vertex_never_leaks():
    """Rays aimed exactly at a vertex shared by a planar triangle fan."""
    rng = np.random.default_rng(2)
    n = 4096
    center = rng.normal(size=(n, 3)).astype(np.float32)
    # planar fan of 6 triangles fully surrounding `center` in z = center.z;
    # jittered-regular angles keep every wedge < pi (a triangle can only
    # cover a convex wedge, so a reflex gap would be a hole in the *fan*,
    # not a leak in the intersector)
    base = np.arange(6) * (np.pi / 3)
    angles = base[None, :] + rng.uniform(0.0, 0.9, size=(n, 6))
    radius = rng.uniform(0.5, 2.0, size=(n, 6)).astype(np.float32)
    spokes = np.stack([
        center[:, 0:1] + radius * np.cos(angles),
        center[:, 1:2] + radius * np.sin(angles),
        np.broadcast_to(center[:, 2:3], (n, 6)),
    ], axis=-1).astype(np.float32)                       # (n, 6, 3)
    origin = (center + np.array([0.0, 0.0, 5.0], np.float32)
              + 0.3 * rng.normal(size=(n, 3)).astype(np.float32))
    d = center - origin

    any_hit = np.zeros(n, bool)
    for k in range(6):
        _, _, _, ok = triangle_hit_t_watertight(
            jnp.asarray(center), jnp.asarray(spokes[:, k]),
            jnp.asarray(spokes[:, (k + 1) % 6]),
            jnp.asarray(origin), jnp.asarray(d), 1e-4, 1e9)
        any_hit |= np.asarray(ok)
    leaked = (~any_hit).sum()
    assert leaked == 0, f"{leaked} / {n} vertex rays leaked"


def test_flash_kernel_shared_edge_never_leaks():
    """The PRODUCTION intersector (flash kernel, interpret mode) runs the
    watertight form: rays aimed exactly at the shared edge of a
    two-triangle quad must report a hit (VERDICT r2 item 3 — the
    watertight math wired into the production path, not just the unit)."""
    from potato_tpu.core.types import RayBatch
    from potato_tpu.ops.flash import build_flash_accel, intersect_flash
    from potato_tpu.scene.description import (
        Absorb, Emit, Material, MeshData, Scatter, SceneBuilder,
    )

    rng = np.random.default_rng(7)
    # planar quad in z = -2, split along the diagonal (p0, p1)
    p0 = np.asarray([-1.0, -1.0, -2.0], np.float32)
    p1 = np.asarray([1.0, 1.0, -2.0], np.float32)
    q0 = np.asarray([-1.0, 1.0, -2.0], np.float32)
    q1 = np.asarray([1.0, -1.0, -2.0], np.float32)
    pos = np.stack([p0, p1, q0, q1])
    mesh = MeshData(positions=pos,
                    normals=np.tile([[0, 0, 1]], (4, 1)).astype(np.float32),
                    uvs=np.zeros((4, 2), np.float32),
                    indices=np.asarray([[0, 1, 2], [1, 0, 3]], np.int32))
    s = SceneBuilder()
    m = s.add_material(Material(Scatter.lambert(), Absorb.albedo(1, 1, 1),
                                Emit.none()))
    s.add_mesh(mesh, m)
    scene = s.build(accel="brute")
    accel = build_flash_accel(scene.tables, scene.num_spheres,
                              scene.num_triangles)

    n = 2048
    lam = rng.uniform(0.02, 0.98, size=(n, 1)).astype(np.float32)
    target = p0[None] * (1 - lam) + p1[None] * lam   # on the shared edge
    origin = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    origin[:, 2] = 2.0
    d = target - origin
    rays = RayBatch(origin=jnp.asarray(origin), direction=jnp.asarray(d),
                    t_min=jnp.full((n,), 1e-4), t_max=jnp.full((n,), 1e9))
    out = intersect_flash(accel, scene.tables, rays, interpret=True)
    leaked = (~np.asarray(out.valid)).sum()
    assert leaked == 0, f"{leaked} / {n} edge rays leaked through flash"


def test_axis_aligned_rays():
    """Rays along each axis (zero components => shear degeneracies)."""
    pa = jnp.asarray([[0, -1, -1]], jnp.float32)
    pb = jnp.asarray([[0, 1, -1]], jnp.float32)
    pc = jnp.asarray([[0, 0, 1]], jnp.float32)
    for dvec, ovec, should_hit in [
        ([1, 0, 0], [-2, 0, 0], True),
        ([-1, 0, 0], [2, 0, 0], True),
        ([0, 1, 0], [0, -2, 0.5], False),   # parallel to the plane
    ]:
        t, u, v, ok = triangle_hit_t_watertight(
            pa, pb, pc, jnp.asarray([ovec], jnp.float32),
            jnp.asarray([dvec], jnp.float32), 1e-4, 1e9)
        assert bool(ok[0]) == should_hit, (dvec, ovec)
