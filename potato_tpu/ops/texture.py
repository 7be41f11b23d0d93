"""Branchless texture sampling over the flat texture tables.

Device analogue of the reference's recursive `Texture::sample`
(src/texture.rs:21-35). The enum match becomes compute-all-kinds +
select-by-kind; the checker's recursion (reference src/texture.rs:51-60,
unbounded and cycle-unsafe there) becomes a static unroll of
`CHECKER_DEPTH` levels — enough for any checker-of-checker-of-leaf chain.

Differentiability: the atlas gather and solid colors carry gradients
(texel/albedo optimization); procedural noises are treated as constants in
position (their lattice hash is integer math).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from potato_tpu.core import noise
from potato_tpu.scene import description as d

# Static recursion depth for Checker children. Reference scenes nest at most
# checker -> (solid | perlin); depth 2 leaves headroom.
CHECKER_DEPTH = 2


def _fetch_tex_fields(tables, tex_id, need_children: bool):
    """Per-lane (kind, color, children) texture records.

    Small tables (<= 16 rows — every reference scene) fetch all fields
    with ONE one-hot MXU dot instead of 3-4 per-lane gathers: each (B,)
    gather from even a 3-row table runs at the TPU's row-rate (~50 us per
    2^15-lane pass), and more_balls was paying ~24 ms/frame across its
    bounce passes for exactly these. The dot is exact: kind codes and
    child ids are tiny ints (precision=HIGHEST keeps them out of bf16),
    colors ride a linear one-hot sum (0*x terms are exact zeros — the
    tables hold finite constants), so values and t_color gradients are
    bit-identical to the gathers. Seeds and image metadata are NOT
    routed through the dot (an int32 seed / atlas offset above 2^24
    would not survive the f32 ride) — their gathers stay in the
    noise/image branches, which scenes without those kinds skip
    statically.
    """
    n = tables.t_kind.shape[0]
    if n > 16:
        kind = tables.t_kind[tex_id]
        color = tables.t_color[tex_id]
        children = tables.t_children[tex_id] if need_children else None
        return kind, color, children
    fields = [tables.t_kind.astype(jnp.float32),
              tables.t_color[:, 0], tables.t_color[:, 1],
              tables.t_color[:, 2]]
    if need_children:
        fields += [tables.t_children[:, 0].astype(jnp.float32),
                   tables.t_children[:, 1].astype(jnp.float32)]
    f = jnp.stack(fields, axis=0)                               # (F, N)
    onehot = (tex_id[None, :] == jnp.arange(n, dtype=tex_id.dtype)[:, None]
              ).astype(jnp.float32)                             # (N, B)
    g = jax.lax.dot_general(f, onehot, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)  # (F, B)
    kind = g[0].astype(jnp.int32)
    color = jnp.stack([g[1], g[2], g[3]], axis=-1)
    children = None
    if need_children:
        children = jnp.stack([g[4].astype(jnp.int32),
                              g[5].astype(jnp.int32)], axis=-1)
    return kind, color, children


def sample_image(tables, tex_id, uv):
    """Nearest-neighbor, clamped image lookup (reference src/texture.rs:40-49).

    Texels live in the shared atlas; (offset, width, height) per texture.
    """
    meta = tables.t_image[tex_id]                       # (B,3) int32
    w = meta[..., 1].astype(uv.dtype)
    h = meta[..., 2].astype(uv.dtype)
    i = jnp.clip(uv[..., 0] * w, 0.0, w - 1.0).astype(jnp.int32)
    j = jnp.clip(uv[..., 1] * h, 0.0, h - 1.0).astype(jnp.int32)
    flat = meta[..., 0] + j * meta[..., 1] + i
    return tables.atlas[flat]                           # (B,3)


def sample_texture(tables, tex_id, position, uv, depth: int = CHECKER_DEPTH,
                   kinds=None):
    """Sample per-lane texture ids: tex_id (B,), position (B,3), uv (B,2)
    -> (B,3) linear color.

    `kinds` (a static frozenset of TEX_* constants, or None = all) names
    the texture kinds present in the scene: variants outside it are
    skipped at compile time (scene specialization, SceneFeatures).
    """
    def used(k):
        return kinds is None or k in kinds

    kind, color, children = _fetch_tex_fields(
        tables, tex_id, need_children=used(d.TEX_CHECKER) and depth > 0)

    out = jnp.zeros_like(color)                         # TEX_MISSING -> black
    if used(d.TEX_DEBUG_UVS):
        debug_uvs = jnp.stack(
            [uv[..., 0], uv[..., 1], jnp.zeros_like(uv[..., 0])], axis=-1)
        out = jnp.where((kind == d.TEX_DEBUG_UVS)[..., None], debug_uvs, out)
    if used(d.TEX_SOLID):
        out = jnp.where((kind == d.TEX_SOLID)[..., None], color, out)
    if used(d.TEX_IMAGE):
        image = sample_image(tables, tex_id, uv)
        out = jnp.where((kind == d.TEX_IMAGE)[..., None], image, out)
    if used(d.TEX_CHECKER) and depth > 0:
        # checker parity (reference src/texture.rs:51-60): even iff
        # floor(x)+floor(y)+floor(z) is an even integer
        fsum = jnp.sum(jnp.floor(position), axis=-1)
        even = jnp.mod(fsum, 2.0) == 0.0
        child = jnp.where(even, children[..., 1], children[..., 0])
        checker = sample_texture(tables, child, position, uv, depth - 1,
                                 kinds)
        out = jnp.where((kind == d.TEX_CHECKER)[..., None], checker, out)
    if used(d.TEX_NOISE):
        seed = tables.t_seed[tex_id]                    # (B,)
        nval = noise.value_noise(position, seed)
        out = jnp.where((kind == d.TEX_NOISE)[..., None], nval[..., None], out)
    if used(d.TEX_PERLIN):
        seed = tables.t_seed[tex_id]
        pval = noise.perlin(position, seed)
        out = jnp.where((kind == d.TEX_PERLIN)[..., None], pval[..., None], out)
    return out
