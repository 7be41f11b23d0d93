"""Render driver: chunked, jitted, deterministic full-frame rendering.

Replaces the reference's worker pool + mutex tile queue (src/main.rs:36-103)
with static work partitioning: the flat (pixel x sample) ray index space is
cut into equal chunks; each chunk is one jit call (one compiled program,
reused across chunks). Determinism is total — every ray's randomness is a
pure function of (seed, ray id) — so chunk size, chunk order, and device
count never change the image (the reference's renders differ run to run,
SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from potato_tpu.core import color as pcolor
from potato_tpu.ops.intersect import intersect_brute_force
from potato_tpu.ops.traverse import intersect_clustered
from potato_tpu.render.camera import generate_rays
from potato_tpu.render.integrator import TraceResult, trace_paths
from potato_tpu.scene.tables import CompiledScene


@dataclass
class RenderOutput:
    """Full-frame results (reference main.rs buffers: color, foreground)."""

    color: np.ndarray      # (H, W, 3) float32 linear radiance (spp-averaged)
    normal: np.ndarray     # (H, W, 3) first-hit normal AOV
    coverage: np.ndarray   # (H, W) float32 foreground fraction
    segments: int = 0      # path segments traced (rays/s numerator)

    def srgb(self) -> np.ndarray:
        """(H, W, 4) uint8, gamma 1/2.2 (reference src/utility.rs:212-220)."""
        return np.asarray(pcolor.to_srgb_u8(jnp.asarray(self.color)))


def make_intersect_fn(scene: CompiledScene):
    """Pick the acceleration entry point compiled into the render fn."""
    from potato_tpu.ops.dense import DenseAccel, intersect_dense
    from potato_tpu.ops.pallas_intersect import PallasAccel, intersect_pallas
    from potato_tpu.scene.bvh import ClusterAccel

    accel = scene.accel
    if isinstance(accel, PallasAccel):
        # interpret mode on CPU (tests); compiled Mosaic on TPU
        interp = jax.default_backend() != "tpu"
        return lambda tables, rays: intersect_pallas(accel, tables, rays,
                                                     interpret=interp)
    if isinstance(accel, DenseAccel):
        return lambda tables, rays: intersect_dense(accel, tables, rays)
    if isinstance(accel, ClusterAccel):
        return lambda tables, rays: intersect_clustered(accel, rays)
    return intersect_brute_force


def render_chunk(tables, camera, ray_ids, *, intersect_fn, width, height,
                 spp, max_bounce, seed) -> TraceResult:
    """Jittable: trace one chunk of global ray ids to radiance + AOVs."""
    rays = generate_rays(camera, width, height, spp, ray_ids, seed)
    return trace_paths(tables, intersect_fn, rays, ray_ids, max_bounce, seed)


def render(scene: CompiledScene, width: int, height: int, spp: int = 4,
           max_bounce: int = 8, seed: int = 0,
           chunk_size: Optional[int] = None,
           progress: bool = False,
           with_aovs: bool = True) -> RenderOutput:
    """Render a full frame (reference defaults: 800x600, spp 4, bounce 8,
    src/main.rs:13-32).

    with_aovs=False skips fetching the normal/coverage AOVs to the host —
    on a remote-tunneled chip those device->host copies are a measurable
    slice of frame time (the AOVs are still computed on device).
    """
    total = width * height * spp
    if chunk_size is None:
        chunk_size = min(total, 1 << 18)
    chunk_size = min(chunk_size, total)
    num_chunks = (total + chunk_size - 1) // chunk_size

    intersect_fn = make_intersect_fn(scene)
    traced = jax.jit(partial(
        render_chunk, intersect_fn=intersect_fn, width=width, height=height,
        spp=spp, max_bounce=max_bounce, seed=seed))

    colors, normals, hits, seg_parts = [], [], [], []
    for c in range(num_chunks):
        start = c * chunk_size
        # fixed chunk shape: the tail chunk wraps around (duplicate work on
        # <1 chunk of rays, zero recompilation)
        ids = (jnp.arange(chunk_size, dtype=jnp.uint32) + start) % total
        out = traced(scene.tables, scene.camera, ray_ids=ids)
        # keep chunk outputs on device; fetch everything once at the end so
        # host transfers overlap nothing and happen in few large copies
        colors.append(out.color)
        seg_parts.append(out.segments)
        if with_aovs:
            normals.append(out.aov_normal)
            hits.append(out.aov_hit)
        if progress:
            print(f"\rchunk {c + 1}/{num_chunks}", end="", flush=True)
    if progress:
        print()

    color = np.asarray(jnp.concatenate(colors))[:total]
    segments = int(np.sum(np.asarray(jnp.stack(seg_parts))))

    # spp average (reference main.rs:88-90)
    color = color.reshape(height, width, spp, 3).mean(axis=2)
    if with_aovs:
        normal = np.asarray(jnp.concatenate(normals))[:total]
        hit = np.asarray(jnp.concatenate(hits))[:total]
        normal = normal.reshape(height, width, spp, 3).mean(axis=2)
        coverage = hit.reshape(height, width, spp).mean(axis=2).astype(np.float32)
    else:
        normal = np.zeros_like(color)
        coverage = np.zeros(color.shape[:2], np.float32)
    return RenderOutput(color=color, normal=normal, coverage=coverage,
                        segments=segments)
