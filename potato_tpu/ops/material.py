"""Branchless, differentiable material evaluation (scatter / absorb / emit).

Device analogue of the reference's enum dispatch (src/material.rs:27-34,
49-60, 74-81) and scatter implementations (src/material.rs:115-180):
every variant is computed on the VPU for every lane, the per-lane material
kind selects the result. `Option<Ray>` becomes (direction, valid-mask).

Differentiability conventions (BASELINE.json north star):
- albedo / emission colors and texels: gradients flow linearly.
- Metal fuzziness: reparameterized — the fuzzed direction depends smoothly
  on the parameter (reflect + fuzz * unit_ball), as in the reference.
- Dielectric IOR: gradients flow through eta, Schlick reflectance and the
  refracted direction; the reflect-vs-refract Bernoulli *choice* is
  detached (sampled from a parameter-independent uniform). The choice
  probability's own gradient is recovered by the score-function surrogate
  in potato_tpu.diff.surrogate — pass ior_score=True to eval_material /
  eval_scatter (tested in tests/test_surrogate.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from potato_tpu.core import math as pmath
from potato_tpu.core import sampling
from potato_tpu.core.types import HitBatch
from potato_tpu.ops.texture import CHECKER_DEPTH, sample_texture


def _checker_depth(features) -> int:
    """Scene-exact checker unroll depth (compile_scene computes it from the
    texture graph); the legacy default when no feature set is supplied."""
    return getattr(features, "checker_depth", CHECKER_DEPTH) \
        if features is not None else CHECKER_DEPTH
from potato_tpu.scene import description as d


class ScatterSample(NamedTuple):
    direction: jnp.ndarray  # (B,3) next bounce direction (dummy when invalid)
    valid: jnp.ndarray      # (B,) False = path absorbed (reference: Option None)
    weight: jnp.ndarray = None  # (B,) importance weight, forward-value 1.0;
    # carries the score-function gradient of discrete sampling choices
    # (potato_tpu.diff.surrogate) when ior_score=True


def _used(kinds, k):
    return kinds is None or k in kinds


def eval_emit(tables, kind, color, tex, ray_direction, hit: HitBatch,
              features=None, kinds=None):
    """Emission (reference src/material.rs:49-60). `kind/color/tex` are the
    per-lane gathered emit fields (also used for the scene background with
    broadcast scalars and an at-infinity hit).

    `features` (SceneFeatures or None = all) statically skips variants the
    scene never selects; `kinds` overrides the emit-kind set (the material
    eval passes the material-only set so the background's kind does not
    drag, e.g., the SkySphere atlas gather into every hit lane)."""
    ek = kinds if kinds is not None else (
        features.emit_kinds if features is not None else None)
    tk = features.texture_kinds if features is not None else None

    out = jnp.zeros_like(color)                                   # EMIT_NONE
    if _used(ek, d.EMIT_DEBUG_NORMALS):
        out = jnp.where((kind == d.EMIT_DEBUG_NORMALS)[..., None],
                        hit.normal, out)
    if _used(ek, d.EMIT_COLOR):
        out = jnp.where((kind == d.EMIT_COLOR)[..., None], color, out)
    if _used(ek, d.EMIT_SKY_GRADIENT):
        # SkyGradient normalizes defensively, like the reference
        # (material.rs:55)
        dir_y = ray_direction[..., 1] / jnp.linalg.norm(ray_direction, axis=-1)
        t = (0.5 * (dir_y + 1.0))[..., None]
        sky = (1.0 - t) * jnp.ones(3, ray_direction.dtype) + t * jnp.asarray(
            [0.5, 0.7, 1.0], ray_direction.dtype)
        out = jnp.where((kind == d.EMIT_SKY_GRADIENT)[..., None], sky, out)
    if _used(ek, d.EMIT_SKY_SPHERE):
        sphere_tex = sample_texture(tables, tex, hit.position, hit.uv,
                                    depth=_checker_depth(features), kinds=tk)
        out = jnp.where((kind == d.EMIT_SKY_SPHERE)[..., None],
                        sphere_tex, out)
    return out


def eval_absorb(tables, kind, color, tex, hit: HitBatch, features=None):
    """Absorption tint (reference src/material.rs:74-81)."""
    ak = features.absorb_kinds if features is not None else None
    tk = features.texture_kinds if features is not None else None
    out = jnp.zeros_like(color)                                   # BlackBody
    if _used(ak, d.ABSORB_WHITE_BODY):
        out = jnp.where((kind == d.ABSORB_WHITE_BODY)[..., None],
                        jnp.ones_like(color), out)
    if _used(ak, d.ABSORB_ALBEDO):
        out = jnp.where((kind == d.ABSORB_ALBEDO)[..., None], color, out)
    if _used(ak, d.ABSORB_ALBEDO_MAP):
        mapped = sample_texture(tables, tex, hit.position, hit.uv,
                                depth=_checker_depth(features), kinds=tk)
        out = jnp.where((kind == d.ABSORB_ALBEDO_MAP)[..., None], mapped, out)
    return out


def eval_scatter(tables, kind, param, ray_direction, hit: HitBatch,
                 u1, u2, u3, u4, features=None,
                 ior_score: bool = False) -> ScatterSample:
    """Scatter sampling (reference src/material.rs:115-180).

    u1..u3: uniforms for the sphere/ball sample; u4: the dielectric's
    reflect-vs-refract Bernoulli draw. All (B,).

    ior_score: attach the score-function surrogate weight for the
    dielectric's Bernoulli choice (diff/surrogate.py) so d/d(IOR) also
    sees the choice-probability term. Forward values are unchanged.
    """
    sk = features.scatter_kinds if features is not None else None
    normal = hit.normal
    cos_in = pmath.dot(normal, ray_direction)
    backface = cos_in > 0.0

    out = jnp.zeros_like(ray_direction)
    out = out.at[..., 2].set(1.0)  # inert dummy for SCATTER_NONE lanes
    valid = jnp.zeros_like(backface)
    weight = jnp.ones_like(u1)

    if _used(sk, d.SCATTER_LAMBERT):
        # --- Lambert (material.rs:115-130): normal + unit sphere,
        # backface culled
        sphere = sampling.unit_sphere(u1, u2)
        lambert_dir = pmath.safe_normalize(normal + sphere)
        out = jnp.where((kind == d.SCATTER_LAMBERT)[..., None],
                        lambert_dir, out)
        valid = jnp.where(kind == d.SCATTER_LAMBERT, ~backface, valid)

    if _used(sk, d.SCATTER_METAL):
        # --- Metal (material.rs:132-152): reflect + fuzz * unit ball; cull
        # if the fuzz pushed the ray below the surface
        reflected = pmath.reflect(ray_direction, normal)
        ball = sampling.unit_ball(u1, u2, u3)
        metal_dir = pmath.safe_normalize(reflected + param[..., None] * ball)
        metal_valid = ~backface & (pmath.dot(normal, metal_dir) >= 0.0)
        out = jnp.where((kind == d.SCATTER_METAL)[..., None], metal_dir, out)
        valid = jnp.where(kind == d.SCATTER_METAL, metal_valid, valid)

    if _used(sk, d.SCATTER_DIELECTRIC):
        # --- Dielectric (material.rs:154-180): interior flip, Schlick,
        # Bernoulli reflect-vs-refract, TIR fallback to reflect
        interior = backface
        n = jnp.where(interior[..., None], -normal, normal)
        eta = jnp.where(interior, param, 1.0 / jnp.maximum(param, 1e-8))
        reflectance = pmath.schlick_reflectance(
            pmath.dot(n, ray_direction), eta)
        refracted, refract_ok = pmath.refract(ray_direction, n, eta)
        reflect_n = pmath.reflect(ray_direction, n)
        choose_reflect = sampling.bernoulli(
            u4, jax.lax.stop_gradient(reflectance))
        dielectric_dir = jnp.where(
            (choose_reflect | ~refract_ok)[..., None], reflect_n, refracted)
        out = jnp.where((kind == d.SCATTER_DIELECTRIC)[..., None],
                        dielectric_dir, out)
        valid = jnp.where(kind == d.SCATTER_DIELECTRIC,
                          jnp.ones_like(backface), valid)
        if ior_score:
            from potato_tpu.diff.surrogate import score_weight

            # TIR lanes reflect deterministically (probability 1): no score
            chose = choose_reflect | ~refract_ok
            prob = jnp.where(refract_ok, reflectance, 1.0)
            w = score_weight(prob, chose)
            weight = jnp.where(kind == d.SCATTER_DIELECTRIC, w, weight)

    return ScatterSample(direction=out, valid=valid, weight=weight)


class MaterialOutput(NamedTuple):
    """Per-lane material evaluation (reference MaterialOutput,
    src/material.rs:93-97)."""

    scatter: ScatterSample
    absorb: jnp.ndarray  # (B,3)
    emit: jnp.ndarray    # (B,3)


def eval_material(tables, material_id, ray_direction, hit: HitBatch,
                  u1, u2, u3, u4, features=None,
                  ior_score: bool = False) -> MaterialOutput:
    """Gather the per-lane material record and evaluate all three functions
    (reference Material::evaluate, src/material.rs:104-110).

    With ior_score=True, the dielectric Bernoulli's score-function weight
    (forward value exactly 1) is folded into `absorb`, so the integrator's
    `throughput *= absorb` picks up the choice-probability gradient with no
    integrator change (diff/surrogate.py).
    """
    mid = material_id
    m = tables.m_scatter_kind.shape[0]
    fields12 = (
        tables.m_scatter_kind.astype(jnp.float32),
        tables.m_scatter_param,
        tables.m_absorb_kind.astype(jnp.float32),
        tables.m_absorb_color[:, 0], tables.m_absorb_color[:, 1],
        tables.m_absorb_color[:, 2],
        tables.m_absorb_tex.astype(jnp.float32),
        tables.m_emit_kind.astype(jnp.float32),
        tables.m_emit_color[:, 0], tables.m_emit_color[:, 1],
        tables.m_emit_color[:, 2],
        tables.m_emit_tex.astype(jnp.float32),
    )
    if m <= 16:
        # Small material tables (every reference scene except more_balls):
        # gather all 12 per-lane fields with ONE one-hot dot on the MXU
        # instead of 8 row gathers (~0.05 ms each per bounce pass at the
        # TPU's ~1.5 ns/row gather rate). The dot is linear, so color /
        # param gradients flow exactly as through the gathers; kind codes
        # and texture ids survive the f32 ride exactly (tiny ints,
        # precision=HIGHEST avoids the default bf16 truncation).
        fields = jnp.stack(fields12, axis=0)                # (12, M)
        onehot = (mid[None, :] == jnp.arange(m, dtype=mid.dtype)[:, None]
                  ).astype(jnp.float32)                     # (M, B)
        gm = jax.lax.dot_general(fields, onehot, (((1,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST)
    else:
        # Large material tables (more_balls: 3,790): ONE (B, 12) row
        # gather from the packed (M, 12) record + a constant selector dot
        # to lane-major rows. The previous 8 independent (B,) gathers
        # were per-lane permutation gathers (~7 ns/element); the two
        # biggest of them alone cost 183 ms/frame on more_balls — the row
        # gather runs at the ~1.5 ns/row hardware rate instead, and the
        # dot materializes the transpose on the MXU exactly like the
        # shade-row fetch in ops/flash.py (same two layout traps dodged).
        # The (M, 12) pack is loop-invariant: XLA hoists it out of the
        # bounce loop. Kind codes and texture ids are small ints — exact
        # through the f32 ride at HIGHEST precision; color/param
        # gradients flow linearly through gather and dot.
        packed = jnp.stack(fields12, axis=1)                # (M, 12)
        rows = packed[mid]                                  # (B, 12) {1,0}
        sel = jnp.concatenate(
            [jnp.eye(12, dtype=jnp.float32),
             jnp.zeros((1, 12), jnp.float32)])              # (13, 12)
        gm = jax.lax.dot_general(sel, rows, (((1,), (1,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST)
    s_kind = gm[0].astype(jnp.int32)
    s_param = gm[1]
    a_kind = gm[2].astype(jnp.int32)
    a_color = jnp.stack([gm[3], gm[4], gm[5]], axis=-1)
    a_tex = gm[6].astype(jnp.int32)
    e_kind = gm[7].astype(jnp.int32)
    e_color = jnp.stack([gm[8], gm[9], gm[10]], axis=-1)
    e_tex = gm[11].astype(jnp.int32)

    scatter = eval_scatter(
        tables, s_kind, s_param,
        ray_direction, hit, u1, u2, u3, u4, features=features,
        ior_score=ior_score)
    absorb = eval_absorb(
        tables, a_kind, a_color, a_tex, hit, features=features)
    emit = eval_emit(
        tables, e_kind, e_color, e_tex, ray_direction, hit,
        features=features,
        kinds=(getattr(features, "material_emit_kinds", None)
               if features is not None else None))
    if ior_score:
        absorb = absorb * scatter.weight[..., None]
    return MaterialOutput(scatter=scatter, absorb=absorb, emit=emit)
