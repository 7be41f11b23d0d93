"""Wavefront path-trace integrator.

The TPU rewrite of the reference's recursion (`trace_path` /
`trace_path_first` / `trace_path_continue`, src/render.rs:94-146): a
fixed-depth `lax.scan` over bounces with SoA state

    radiance  L += throughput * emit        (hit lanes)
    L += throughput * background            (miss lanes, then retired)
    throughput *= absorb                    (scattering lanes)

which is exactly the reference recursion `emit + absorb . L(scatter)`
unrolled into an accumulator. `Option` control flow becomes an `active`
mask; a retired lane keeps flowing through the loop at zero cost to
correctness (its contribution is masked). Depth semantics match the
reference: `max_bounce` segments are traced, and a path still alive after
the last material evaluation contributes that bounce's emission but no
further scatter (render.rs:128-131 returns black at depth 0).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from potato_tpu.core import rng as prng
from potato_tpu.core.types import BIG, RAY_EPSILON, HitBatch, RayBatch, hits_at_infinity
from potato_tpu.ops.material import eval_emit, eval_material


class TraceResult(NamedTuple):
    color: jnp.ndarray       # (B,3) path radiance
    aov_normal: jnp.ndarray  # (B,3) first-hit normal (zeros on miss,
                             # reference render.rs:119)
    aov_hit: jnp.ndarray     # (B,) foreground/coverage mask (render.rs:121)
    segments: jnp.ndarray    # () int32: path segments actually traced (live
                             # lanes summed over bounces) — the rays/s
                             # numerator, comparable to the reference's
                             # per-segment scene.hit calls


class PathState(NamedTuple):
    """Per-lane loop state of the bounce loop (one lane = one path)."""

    rays: RayBatch
    radiance: jnp.ndarray
    throughput: jnp.ndarray
    active: jnp.ndarray
    aov_normal: jnp.ndarray
    aov_hit: jnp.ndarray
    segments: jnp.ndarray


def init_state(rays: RayBatch, live=None) -> PathState:
    """Fresh bounce-loop state for a batch of camera rays.

    Derives every carried constant from the ray data instead of literals:
    under shard_map, literals are mesh-invariant while per-bounce updates
    are axis-varying, and lax.scan requires carry types to match. Arithmetic
    on the (varying) rays gives correctly-typed zeros/ones everywhere,
    inside and outside shard_map.

    live: optional (B,) bool — lanes born dead (padding in a fixed-shape
    chunk) trace nothing, contribute nothing, and are excluded from the
    segments counter.
    """
    zb = rays.t_min * 0.0                      # (B,) varying zeros
    zb3 = zb[..., None] + jnp.zeros(3, jnp.float32)
    active0 = (zb == 0.0) if live is None else ((zb == 0.0) & live)
    if live is not None:
        # dead-born lanes carry an inert ray (t_max < t_min) so the
        # kernels' block-level dead-lane culling skips them entirely
        rays = rays._replace(t_max=jnp.where(live, rays.t_max, zb - 1.0))
    return PathState(
        rays=rays,
        radiance=zb3,
        throughput=zb3 + 1.0,
        active=active0,
        aov_normal=zb3,
        aov_hit=zb > 0.0,
        segments=jnp.sum(zb).astype(jnp.int32),
    )


def make_bounce_step(tables, intersect_fn: Callable, seed, features=None,
                     ior_score: bool = False, aovs: bool = True):
    """Build the single-bounce transition `step(state, bounce, ray_ids)`.

    One call traces one path segment for every lane: intersect, shade,
    accumulate emission/background into radiance, draw the scatter
    direction, and advance the ray. Shared by the chunked depth-first
    driver (`trace_paths`) and the compacted breadth-first driver
    (render/compact.py) so the two are bit-identical per ray by
    construction.
    """

    def bounce_step(state: PathState, bounce, ray_ids):
        ray_ids = ray_ids.astype(jnp.uint32)
        b = ray_ids.shape

        hit: HitBatch = intersect_fn(tables, state.rays)

        # Sanitize miss lanes before shading: their BIG-t positions (~3e38)
        # overflow inside the compute-all-kinds texture/material dispatch
        # (e.g. Perlin's corner dots hit inf - inf), and although the result
        # is select-masked, NaN primals leak back out through the masked
        # branch's cotangents under reverse-mode AD.
        v1 = hit.valid
        v3 = v1[..., None]
        hit = hit._replace(
            position=jnp.where(v3, hit.position, 0.0),
            normal=jnp.where(v3, hit.normal, state.rays.direction * 0.0 +
                             jnp.asarray([0.0, 0.0, 1.0], jnp.float32)),
            uv=jnp.where(v1[..., None], hit.uv, 0.0),
            t=jnp.where(v1, hit.t, 1.0),
        )

        # per-bounce scatter uniforms, keyed (seed, bounce stream, ray id).
        # Two threefry blocks per bounce: (u1, u2) from SCATTER_A and
        # (u3, u4) from SCATTER_B — the dielectric Bernoulli draw rides
        # SCATTER_B's second word instead of burning a third block
        # (~1/3 of per-bounce RNG cost; mirrored in tests/oracle.py).
        u1, u2 = prng.uniform2(seed, prng.bounce_salt(bounce, prng.STREAM_SCATTER_A), ray_ids)
        u3, u4 = prng.uniform2(seed, prng.bounce_salt(bounce, prng.STREAM_SCATTER_B), ray_ids)

        mat = eval_material(tables, hit.material, state.rays.direction, hit,
                            u1, u2, u3, u4, features=features,
                            ior_score=ior_score)

        hit_inf = hits_at_infinity(state.rays.direction)
        bg = eval_emit(tables, jnp.broadcast_to(tables.bg_kind, b),
                       jnp.broadcast_to(tables.bg_color, b + (3,)),
                       jnp.broadcast_to(tables.bg_tex, b),
                       state.rays.direction, hit_inf, features=features)

        contrib = jnp.where(hit.valid[..., None], mat.emit, bg)
        live = state.active[..., None].astype(jnp.float32)
        radiance = state.radiance + state.throughput * contrib * live

        # AOVs from the first segment only (trace_path_first, render.rs:102-122)
        if aovs:
            first = bounce == 0
            aov_normal = jnp.where(
                first, jnp.where(hit.valid[..., None], hit.normal, 0.0),
                state.aov_normal)
            aov_hit = jnp.where(first, hit.valid, state.aov_hit)
        else:
            aov_normal = state.aov_normal
            aov_hit = state.aov_hit

        throughput = jnp.where(
            (state.active & hit.valid)[..., None],
            state.throughput * mat.absorb, state.throughput)
        active = state.active & hit.valid & mat.scatter.valid

        # Retired lanes keep flowing through the loop with an inert ray from
        # the origin: without this, the BIG-t miss position (~3e38) overflows
        # to inf/NaN in the next bounce's quadratics, and NaN survives the
        # contribution mask (NaN * 0 = NaN).
        # Retired lanes are marked dead via t_max = -1 < t_min: the flash
        # intersector's per-block cluster culling then skips them entirely
        # (a block of only dead lanes does no primitive work).
        zb_ = state.rays.t_min * 0.0  # varying-typed zeros (see init note)
        next_rays = RayBatch(
            origin=jnp.where(active[..., None], hit.position, 0.0),
            direction=mat.scatter.direction,
            t_min=zb_ + RAY_EPSILON,
            t_max=jnp.where(active, zb_ + BIG, zb_ - 1.0),
        )
        segments = state.segments + jnp.sum(state.active.astype(jnp.int32))
        return PathState(next_rays, radiance, throughput, active,
                         aov_normal, aov_hit, segments)

    return bounce_step


def trace_paths(tables, intersect_fn: Callable, rays: RayBatch, ray_ids,
                max_bounce: int, seed, features=None,
                early_exit: bool = False, live=None,
                ior_score: bool = False, aovs: bool = True) -> TraceResult:
    """Trace a batch of camera rays to completion.

    intersect_fn(tables, rays) -> HitBatch is the acceleration-structure
    entry point (brute force or clustered), fixed per compiled scene.

    features: SceneFeatures (or None = all) — statically skips material/
    texture variants the scene never uses (scene specialization).

    early_exit: stop bouncing once every lane has retired (lax.while_loop
    instead of lax.scan). Bit-identical output — skipped bounces contribute
    exactly zero — but while_loop is not reverse-mode differentiable, so
    gradient paths keep the scan (default).

    live: optional (B,) bool — lanes born dead (padding in a fixed-shape
    chunk) trace nothing, contribute nothing, and are excluded from the
    segments counter.

    aovs: statically skip the first-hit AOV updates (the bounce loop's
    `bounce == 0` selects) when the caller only wants radiance — the
    bench path; the returned aov fields are then the carried zeros.

    ior_score: fold the score-function surrogate weight for the
    dielectric's reflect/refract Bernoulli into throughput
    (diff/surrogate.py) so d(image)/d(IOR) includes the choice-probability
    term. Forward images are bit-identical (the weight's value is 1);
    enable when optimizing m_scatter_param through a render.
    """
    ray_ids = ray_ids.astype(jnp.uint32)
    init = init_state(rays, live=live)
    step = make_bounce_step(tables, intersect_fn, seed, features=features,
                            ior_score=ior_score, aovs=aovs)

    def bounce_step(state: PathState, bounce):
        return step(state, bounce, ray_ids), None

    if early_exit:
        # while_loop form: identical per-bounce body, but the loop stops as
        # soon as no lane is active — chunks whose rays all hit the sky or
        # get absorbed early skip the remaining (all-masked, all-zero)
        # bounces entirely. Forward-only (while_loop has no reverse rule).
        def cond(carry):
            state, bounce = carry
            return (bounce < max_bounce) & jnp.any(state.active)

        def body(carry):
            state, bounce = carry
            state, _ = bounce_step(state, bounce)
            return state, bounce + 1

        final, _ = jax.lax.while_loop(cond, body,
                                      (init, jnp.asarray(0, jnp.int32)))
    else:
        final, _ = jax.lax.scan(bounce_step, init, jnp.arange(max_bounce))
    return TraceResult(color=final.radiance, aov_normal=final.aov_normal,
                       aov_hit=final.aov_hit, segments=final.segments)
