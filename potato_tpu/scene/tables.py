"""Scene compilation: description -> flat SoA device tables.

The reference's `SceneData` (src/render.rs:10-14) is a set of index-addressed
tables walked by recursive enum dispatch. Here the same tables are compiled
to dense jnp arrays gathered branchlessly per ray lane:

- materials: parallel arrays of kind codes + parameters,
- textures: kind codes + params + one shared flat texel atlas (all image
  textures concatenated; the differentiable leaf for texel optimization),
- geometry: spheres as center/radius/material SoA; triangles pre-gathered to
  per-corner SoA (one gather per triangle test instead of three through a
  vertex-index indirection — trades 3x memory for gather count, the right
  trade on TPU where the bunny is ~500 KB),
- background: the scene-wide Emit (reference src/example_scenes.rs:14-19).

Everything in `SceneTables` is a jnp array => the whole scene is a pytree
that can be donated, replicated across a device mesh, or differentiated.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from potato_tpu.scene import description as d


class SceneTables(NamedTuple):
    # --- materials (reference src/material.rs:87-91) ---
    m_scatter_kind: jnp.ndarray   # (M,) int32
    m_scatter_param: jnp.ndarray  # (M,) f32: Metal fuzziness / Dielectric IOR
    m_absorb_kind: jnp.ndarray    # (M,) int32
    m_absorb_color: jnp.ndarray   # (M,3) f32
    m_absorb_tex: jnp.ndarray     # (M,) int32
    m_emit_kind: jnp.ndarray      # (M,) int32
    m_emit_color: jnp.ndarray     # (M,3) f32
    m_emit_tex: jnp.ndarray       # (M,) int32
    # --- textures (reference src/texture.rs:10-18) ---
    t_kind: jnp.ndarray           # (T,) int32
    t_color: jnp.ndarray          # (T,3) f32
    t_children: jnp.ndarray       # (T,2) int32 checker (odd, even)
    t_seed: jnp.ndarray           # (T,) int32
    t_image: jnp.ndarray          # (T,3) int32 (atlas offset, width, height)
    atlas: jnp.ndarray            # (P,3) f32 all image texels, row-major
    # --- background Emit ---
    bg_kind: jnp.ndarray          # () int32
    bg_color: jnp.ndarray         # (3,) f32
    bg_tex: jnp.ndarray           # () int32
    # --- spheres ---
    s_center: jnp.ndarray         # (S,3) f32
    s_radius: jnp.ndarray         # (S,) f32
    s_material: jnp.ndarray       # (S,) int32
    # --- triangles, pre-gathered corners ---
    tri_pa: jnp.ndarray           # (Tr,3) f32
    tri_pb: jnp.ndarray
    tri_pc: jnp.ndarray
    tri_na: jnp.ndarray           # (Tr,3) f32 raw vertex normals (NOT renormalized
    tri_nb: jnp.ndarray           # after interpolation — reference src/hittable.rs:105)
    tri_nc: jnp.ndarray
    tri_ua: jnp.ndarray           # (Tr,2) f32
    tri_ub: jnp.ndarray
    tri_uc: jnp.ndarray
    tri_material: jnp.ndarray     # (Tr,) int32


class CameraTables(NamedTuple):
    """Device-side camera parameters (reference src/render.rs:19-25)."""

    aspect_ratio: jnp.ndarray   # () f32
    tan_half_fov: jnp.ndarray   # () f32
    focal_dist: jnp.ndarray     # () f32
    lens_radius: jnp.ndarray    # () f32
    orientation: jnp.ndarray    # (3,3) f32 columns = local axes
    position: jnp.ndarray       # (3,) f32


class SceneFeatures(NamedTuple):
    """Which material/texture variants a scene actually uses.

    Static (hashable) compile-time facts: the branchless dispatch in
    ops/material.py and ops/texture.py computes every variant for every
    lane, so variants a scene can never select are pure waste — profiling
    on v5e showed the unconditional Perlin + atlas-gather evaluation
    costing ~40% of a bounce on scenes using neither. Passing the feature
    set lets the trace skip them at compile time; `all_features()` (the
    default everywhere) keeps the unspecialized behavior.
    """

    scatter_kinds: frozenset
    absorb_kinds: frozenset
    emit_kinds: frozenset    # includes the background kind
    texture_kinds: frozenset
    # the camera's thin lens is disabled (lens_radius == 0): ray
    # generation then skips the unit-disk sample entirely — one fewer
    # sincos+sqrt per camera ray (several reference scenes, bunny
    # included, use a pinhole camera)
    has_lens: bool = True
    # static unroll depth of the checker recursion: the length of the
    # longest Checker chain in the scene's texture graph (computed by
    # compile_scene, which also rejects cycles — improving on the
    # reference's unguarded recursion, src/texture.rs:51-60 and its own
    # TODO at example_scenes.rs:11-12)
    checker_depth: int = 2
    # material-only emit kinds (background excluded): the per-hit material
    # emission eval uses this set, so a scene whose background is an
    # atlas-backed SkySphere does not re-evaluate the env-map gather +
    # equirect transcendentals for every HIT lane every bounce (~6 ms per
    # bunny frame). None = fall back to emit_kinds.
    material_emit_kinds: frozenset = None


def all_features() -> SceneFeatures:
    return SceneFeatures(
        scatter_kinds=frozenset(
            (d.SCATTER_NONE, d.SCATTER_LAMBERT, d.SCATTER_METAL,
             d.SCATTER_DIELECTRIC)),
        absorb_kinds=frozenset(
            (d.ABSORB_BLACK_BODY, d.ABSORB_WHITE_BODY, d.ABSORB_ALBEDO,
             d.ABSORB_ALBEDO_MAP)),
        emit_kinds=frozenset(
            (d.EMIT_NONE, d.EMIT_DEBUG_NORMALS, d.EMIT_COLOR,
             d.EMIT_SKY_GRADIENT, d.EMIT_SKY_SPHERE)),
        material_emit_kinds=frozenset(
            (d.EMIT_NONE, d.EMIT_DEBUG_NORMALS, d.EMIT_COLOR,
             d.EMIT_SKY_GRADIENT, d.EMIT_SKY_SPHERE)),
        texture_kinds=frozenset(
            (d.TEX_MISSING, d.TEX_DEBUG_UVS, d.TEX_SOLID, d.TEX_IMAGE,
             d.TEX_CHECKER, d.TEX_NOISE, d.TEX_PERLIN)),
    )


@dataclass
class CompiledScene:
    """A scene ready to render: device tables + static metadata.

    `accel` is None (brute force over all primitives — the reference's
    `Hittable::List` semantics, src/hittable.rs:110-120) or a ClusterAccel
    (Morton-ordered two-level BVH, scene/bvh.py).
    """

    tables: SceneTables
    camera: CameraTables
    accel: Optional[object]  # ClusterAccel | None
    num_spheres: int
    num_triangles: int
    features: SceneFeatures = field(default_factory=all_features)
    # compiled-frame cache: (w, h, spp, bounce, chunk, sort) -> jitted fn,
    # so repeated renders of the same shape never retrace (renderer.py)
    fn_cache: dict = field(default_factory=dict)


def _checker_depth(texs) -> int:
    """Length of the longest Checker chain in the texture graph.

    The reference's `Texture::Checker` recursion is arbitrary-depth and
    cycle-unsafe (src/texture.rs:51-60; its own TODO example_scenes.rs:11-12
    notes the missing cycle detection). Computing the exact chain depth at
    scene-compile time lets the device sampler unroll exactly as deep as
    the scene needs — no silent truncation — and a cyclic graph is a
    compile-time error instead of an infinite recursion.
    """
    from potato_tpu.scene import description as d

    depth_memo: dict = {}

    def depth_of(i: int, trail: tuple) -> int:
        if i in trail:
            cycle = " -> ".join(str(j) for j in trail + (i,))
            raise ValueError(f"checker texture cycle: {cycle}")
        if i in depth_memo:
            return depth_memo[i]
        t = texs[i]
        if t.kind != d.TEX_CHECKER:
            out = 0
        else:
            out = 1 + max(depth_of(int(c), trail + (i,)) for c in t.children)
        depth_memo[i] = out
        return out

    return max((depth_of(i, ()) for i in range(len(texs))), default=0)


def _pad_rows(arr: np.ndarray, n: int, fill=0.0) -> np.ndarray:
    if arr.shape[0] >= n:
        return arr
    pad = np.full((n - arr.shape[0],) + arr.shape[1:], fill, arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def compile_scene(builder: "d.SceneBuilder", accel: str = "auto",
                  cluster_size: int = 32) -> CompiledScene:
    """Flatten a SceneBuilder into device tables (+ acceleration structure)."""
    mats = builder.materials or [d.Material()]
    texs = builder.textures or [d.Texture.missing()]

    # --- texture atlas ---
    offsets, dims, texels = [], [], []
    cursor = 0
    for t in texs:
        if t.kind == d.TEX_IMAGE and t.image is not None:
            img = np.asarray(t.image)
            if img.dtype == np.uint8:
                img = img[..., :3].astype(np.float32) / 255.0  # reference /255,
                # nearest-neighbor sampling (src/texture.rs:40-49)
            else:
                img = img[..., :3].astype(np.float32)
            h, w = img.shape[:2]
            offsets.append(cursor)
            dims.append((w, h))
            texels.append(img.reshape(-1, 3))
            cursor += w * h
        else:
            offsets.append(0)
            dims.append((1, 1))
    if not texels:
        texels = [np.zeros((1, 3), np.float32)]
        cursor = 1
    atlas = np.concatenate(texels, axis=0).astype(np.float32)

    t_image = np.array(
        [[o, wh[0], wh[1]] for o, wh in zip(offsets, dims)], np.int32)

    # --- spheres ---
    ns = len(builder.sphere_center)
    s_center = np.asarray(builder.sphere_center, np.float32).reshape(-1, 3)
    s_radius = np.asarray(builder.sphere_radius, np.float32).reshape(-1)
    s_material = np.asarray(builder.sphere_material, np.int32).reshape(-1)
    if ns == 0:
        # one degenerate sphere. radius must be 0, not negative: the
        # quadratic only sees radius^2, so a radius -1 pad would act like a
        # real unit sphere. With r=0, delta = (d.oc)^2 - |d|^2 |oc|^2 <= 0
        # (Cauchy-Schwarz) and the `delta > 0` gate never passes.
        s_center = np.zeros((1, 3), np.float32)
        s_radius = np.zeros((1,), np.float32)
        s_material = np.zeros((1,), np.int32)

    # --- triangles: flatten all meshes into pre-gathered corner SoA ---
    tri_parts = {k: [] for k in ("pa", "pb", "pc", "na", "nb", "nc", "ua", "ub", "uc", "mat")}
    ntr = 0
    for mesh, mat_id in zip(builder.meshes, builder.mesh_materials):
        idx = mesh.indices
        for key, src, col in (("pa", mesh.positions, 0), ("pb", mesh.positions, 1),
                              ("pc", mesh.positions, 2), ("na", mesh.normals, 0),
                              ("nb", mesh.normals, 1), ("nc", mesh.normals, 2),
                              ("ua", mesh.uvs, 0), ("ub", mesh.uvs, 1),
                              ("uc", mesh.uvs, 2)):
            tri_parts[key].append(src[idx[:, col]])
        tri_parts["mat"].append(np.full(idx.shape[0], mat_id, np.int32))
        ntr += idx.shape[0]
    if ntr == 0:
        # one degenerate triangle (all corners coincide => det ~ 0, never hits)
        for key in ("pa", "pb", "pc", "na", "nb", "nc"):
            tri_parts[key].append(np.zeros((1, 3), np.float32))
        for key in ("ua", "ub", "uc"):
            tri_parts[key].append(np.zeros((1, 2), np.float32))
        tri_parts["mat"].append(np.zeros((1,), np.int32))
    tri = {k: np.concatenate(v, axis=0).astype(np.float32 if k != "mat" else np.int32)
           for k, v in tri_parts.items()}

    # Host-side (numpy) tables: the accel builders below read these with
    # np.asarray, so building them as device arrays first would cost one
    # blocking device->host round trip per field — a multi-minute scene
    # build on remote-attached TPUs. Everything stays numpy until one
    # tree-wide upload at the end.
    tables = SceneTables(
        m_scatter_kind=np.asarray([m.scatter.kind for m in mats], np.int32),
        m_scatter_param=np.asarray([m.scatter.param for m in mats], np.float32),
        m_absorb_kind=np.asarray([m.absorb.kind for m in mats], np.int32),
        m_absorb_color=np.asarray([m.absorb.color for m in mats], np.float32),
        m_absorb_tex=np.asarray([m.absorb.texture for m in mats], np.int32),
        m_emit_kind=np.asarray([m.emit.kind for m in mats], np.int32),
        m_emit_color=np.asarray([m.emit.color for m in mats], np.float32),
        m_emit_tex=np.asarray([m.emit.texture for m in mats], np.int32),
        t_kind=np.asarray([t.kind for t in texs], np.int32),
        t_color=np.asarray([t.color for t in texs], np.float32),
        t_children=np.asarray([t.children for t in texs], np.int32),
        t_seed=np.asarray([t.seed for t in texs], np.int32),
        t_image=t_image,
        atlas=atlas,
        bg_kind=np.asarray(builder.background.kind, np.int32),
        bg_color=np.asarray(builder.background.color, np.float32),
        bg_tex=np.asarray(builder.background.texture, np.int32),
        s_center=s_center,
        s_radius=s_radius,
        s_material=s_material,
        tri_pa=tri["pa"], tri_pb=tri["pb"],
        tri_pc=tri["pc"], tri_na=tri["na"],
        tri_nb=tri["nb"], tri_nc=tri["nc"],
        tri_ua=tri["ua"], tri_ub=tri["ub"],
        tri_uc=tri["uc"],
        tri_material=tri["mat"],
    )

    cam = builder.camera
    camera = CameraTables(
        aspect_ratio=np.asarray(cam.aspect_ratio, np.float32),
        tan_half_fov=np.asarray(np.tan(0.5 * cam.fov), np.float32),
        focal_dist=np.asarray(cam.focal_dist, np.float32),
        lens_radius=np.asarray(cam.lens_radius, np.float32),
        orientation=np.asarray(cam.orientation(), np.float32),
        position=np.asarray(cam.position, np.float32),
    )

    # Acceleration choice:
    # - "flash" (= "auto", = "pallas"): the one Pallas path — XLA-built
    #   front-to-back cluster queues + streaming per-block closest hit
    #   (ops/flash.py; two earlier kernel generations were consolidated
    #   into it, see its module docstring)
    # - "dense": MXU matmul brute force (ops/dense.py rationale)
    # - "cluster": Morton-cluster two-level accel with per-lane traversal
    # - "brute": plain VPU brute force, the List-semantics oracle
    accel_struct = None
    if accel in ("flash", "auto", "pallas"):
        from potato_tpu.ops.flash import build_flash_accel

        accel_struct = build_flash_accel(tables, ns, ntr)
    elif accel == "dense":
        from potato_tpu.ops.dense import build_dense_accel

        accel_struct = build_dense_accel(tables, ns, ntr)
    elif accel == "cluster":
        from potato_tpu.scene.bvh import build_cluster_accel

        accel_struct = build_cluster_accel(
            s_center if ns else np.zeros((0, 3), np.float32),
            s_radius if ns else np.zeros((0,), np.float32),
            s_material if ns else np.zeros((0,), np.int32),
            {k: (v if ntr else v[:0]) for k, v in tri.items()},
            cluster_size=cluster_size,
        )

    features = SceneFeatures(
        scatter_kinds=frozenset(m.scatter.kind for m in mats),
        absorb_kinds=frozenset(m.absorb.kind for m in mats),
        emit_kinds=(frozenset(m.emit.kind for m in mats)
                    | {builder.background.kind}),
        material_emit_kinds=frozenset(m.emit.kind for m in mats),
        texture_kinds=frozenset(t.kind for t in texs),
        has_lens=bool(float(cam.lens_radius) > 0.0),
        checker_depth=_checker_depth(texs),
    )

    # single tree-wide upload (accel leaves are already device arrays)
    tables = jax.tree_util.tree_map(jnp.asarray, tables)
    camera = jax.tree_util.tree_map(jnp.asarray, camera)

    return CompiledScene(
        tables=tables, camera=camera, accel=accel_struct,
        num_spheres=ns, num_triangles=ntr, features=features,
    )
