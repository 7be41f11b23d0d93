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
    from potato_tpu.ops.flash import FlashAccel, intersect_flash
    from potato_tpu.ops.grouped import GroupedAccel, intersect_grouped
    from potato_tpu.ops.pallas_intersect import PallasAccel, intersect_pallas
    from potato_tpu.scene.bvh import ClusterAccel

    accel = scene.accel
    # interpret mode on CPU (tests); compiled Mosaic on TPU
    interp = jax.default_backend() != "tpu"
    if isinstance(accel, FlashAccel):
        return lambda tables, rays: intersect_flash(accel, tables, rays,
                                                    interpret=interp)
    if isinstance(accel, GroupedAccel):
        return lambda tables, rays: intersect_grouped(accel, tables, rays,
                                                      interpret=interp)
    if isinstance(accel, PallasAccel):
        return lambda tables, rays: intersect_pallas(accel, tables, rays,
                                                     interpret=interp)
    if isinstance(accel, DenseAccel):
        return lambda tables, rays: intersect_dense(accel, tables, rays)
    if isinstance(accel, ClusterAccel):
        return lambda tables, rays: intersect_clustered(accel, rays)
    return intersect_brute_force


def coherent_intersect(intersect_fn, world_min, world_max):
    """Wrap an intersector with live-first, spatially-coherent ray ordering.

    The grouped kernels cull clusters per 64-ray *group*, so a group's cost
    is the union of its lanes' cluster lists. Sorting rays by (retired,
    origin Morton cell, direction octant) packs similar rays into the same
    groups: dead lanes collapse into groups that visit nothing, and
    coherent lanes share cluster visits. Origin locality leads the key —
    after a bounce it is the hit position, not the direction, that decides
    which clusters a ray can enter. Per-ray hits are order-independent, so
    the image is bit-identical with or without this wrapper.
    """
    extent = jnp.maximum(world_max - world_min, 1e-9)

    def wrapped(tables, rays):
        live = rays.t_max >= rays.t_min
        d = rays.direction
        octant = ((d[..., 0] < 0).astype(jnp.int32)
                  + 2 * (d[..., 1] < 0).astype(jnp.int32)
                  + 4 * (d[..., 2] < 0).astype(jnp.int32))
        q = jnp.clip((rays.origin - world_min) / extent * 64.0,
                     0.0, 63.0).astype(jnp.int32)

        def spread(x):  # 6-bit Morton interleave (scene/bvh.py, 6-bit form)
            x = (x | (x << 10)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x

        cell = ((spread(q[..., 0]) << 2) | (spread(q[..., 1]) << 1)
                | spread(q[..., 2]))
        key = jnp.where(live, (cell << 3) | octant, jnp.int32(1 << 30))
        perm = jnp.argsort(key, stable=True)
        sorted_rays = jax.tree_util.tree_map(lambda a: a[perm], rays)
        hit = intersect_fn(tables, sorted_rays)
        inv = jnp.argsort(perm)
        return jax.tree_util.tree_map(lambda a: a[inv], hit)

    return wrapped


def render_chunk(tables, camera, ray_ids, *, intersect_fn, width, height,
                 spp, max_bounce, seed, features=None,
                 early_exit: bool = False) -> TraceResult:
    """Jittable: trace one chunk of global ray ids to radiance + AOVs."""
    rays = generate_rays(camera, width, height, spp, ray_ids, seed)
    return trace_paths(tables, intersect_fn, rays, ray_ids, max_bounce, seed,
                       features=features, early_exit=early_exit)


def _build_frame_fn(scene: CompiledScene, width: int, height: int, spp: int,
                    max_bounce: int, chunk_size: int, sort_rays: bool,
                    per_chunk: bool = False):
    """One jitted function rendering ALL chunks of a frame in one dispatch.

    `seed` and the chunk start offsets are dynamic arguments, so reseeding
    or re-rendering never retraces or recompiles; `lax.map` serializes the
    chunks on device (bounded memory, zero per-chunk dispatch latency).

    per_chunk=True returns instead a jitted single-chunk function
    (tables, camera, seed, start) -> TraceResult, dispatched once per chunk
    by the caller — the progress-reporting path."""
    intersect_fn = make_intersect_fn(scene)
    if sort_rays:
        intersect_fn = coherent_intersect(intersect_fn, scene.accel.world_min,
                                          scene.accel.world_max)
    total = width * height * spp

    def one_chunk(tables, camera, seed, start):
        ids = (jax.lax.iota(jnp.uint32, chunk_size) + start) % jnp.uint32(total)
        return render_chunk(tables, camera, ids,
                            intersect_fn=intersect_fn, width=width,
                            height=height, spp=spp,
                            max_bounce=max_bounce, seed=seed,
                            features=scene.features, early_exit=True)

    if per_chunk:
        return jax.jit(one_chunk)

    def frame(tables, camera, seed, starts):
        return jax.lax.map(
            lambda start: one_chunk(tables, camera, seed, start), starts)

    return jax.jit(frame)


def compile_frame(scene: CompiledScene, width: int, height: int, spp: int = 4,
                  max_bounce: int = 8, chunk_size: Optional[int] = None):
    """Compile (or fetch cached) the single-dispatch frame function.

    Returns (frame_fn, starts): frame_fn(tables, camera, seed_u32, starts)
    -> TraceResult of stacked chunks, entirely on device. This is the
    device-only benchmarking surface — timing it with block_until_ready
    measures TPU compute without host-transfer latency (bench.py).
    """
    total = width * height * spp
    if chunk_size is None:
        chunk_size = min(total, 1 << 18)
    chunk_size = min(chunk_size, total)
    num_chunks = (total + chunk_size - 1) // chunk_size
    key = (width, height, spp, max_bounce, chunk_size, False, False)
    frame_fn = scene.fn_cache.get(key)
    if frame_fn is None:
        frame_fn = _build_frame_fn(scene, width, height, spp, max_bounce,
                                   chunk_size, sort_rays=False)
        scene.fn_cache[key] = frame_fn
    starts = jnp.arange(num_chunks, dtype=jnp.uint32) * jnp.uint32(chunk_size)
    return frame_fn, starts


def render(scene: CompiledScene, width: int, height: int, spp: int = 4,
           max_bounce: int = 8, seed: int = 0,
           chunk_size: Optional[int] = None,
           progress: bool = False,
           with_aovs: bool = True) -> RenderOutput:
    """Render a full frame (reference defaults: 800x600, spp 4, bounce 8,
    src/main.rs:13-32).

    with_aovs controls only which buffers are fetched to the host.
    """
    total = width * height * spp
    if chunk_size is None:
        chunk_size = min(total, 1 << 18)
    chunk_size = min(chunk_size, total)
    num_chunks = (total + chunk_size - 1) // chunk_size

    # Ray sorting (coherent_intersect) is off by default: profiling on v5e
    # shows the ~21 permute-gathers per bounce (~0.3 ms each at the TPU's
    # ~1 elem/cycle gather rate) cost more than the cluster-list sharing
    # they buy. The per-ray cluster selection already adapts to incoherent
    # rays, and camera order itself is pixel-coherent.
    sort_rays = False
    key = (width, height, spp, max_bounce, chunk_size, sort_rays, progress)
    frame_fn = scene.fn_cache.get(key)
    if frame_fn is None:
        frame_fn = _build_frame_fn(scene, width, height, spp, max_bounce,
                                   chunk_size, sort_rays, per_chunk=progress)
        scene.fn_cache[key] = frame_fn

    # fixed chunk shape: the tail chunk wraps around (duplicate work on
    # <1 chunk of rays, zero recompilation)
    starts = jnp.arange(num_chunks, dtype=jnp.uint32) * jnp.uint32(chunk_size)
    if progress:
        # per-chunk dispatch + a progress line per completed chunk — the
        # reference's per-tile indicatif bar (src/main.rs:37,92). Costs one
        # dispatch round trip per chunk; progress=False renders the whole
        # frame in a single dispatch.
        import sys

        chunks = []
        for i in range(num_chunks):
            chunks.append(jax.block_until_ready(frame_fn(
                scene.tables, scene.camera, jnp.asarray(seed, jnp.uint32),
                starts[i])))
            done = min((i + 1) * chunk_size, total)
            print(f"\r[{done}/{total} rays, chunk {i + 1}/{num_chunks}]",
                  end="" if i + 1 < num_chunks else "\n",
                  file=sys.stderr, flush=True)
        out = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *chunks)
    else:
        out = frame_fn(scene.tables, scene.camera,
                       jnp.asarray(seed, jnp.uint32), starts)

    # spp average (reference main.rs:88-90) on device: the host fetch is a
    # quarter the bytes (and remote-attached chips pay real transfer cost)
    color = np.asarray(
        out.color.reshape(-1, 3)[:total].reshape(height, width, spp, 3)
        .mean(axis=2))
    segments = int(np.asarray(jnp.sum(out.segments)))
    if with_aovs:
        normal = np.asarray(
            out.aov_normal.reshape(-1, 3)[:total]
            .reshape(height, width, spp, 3).mean(axis=2))
        coverage = np.asarray(
            out.aov_hit.reshape(-1)[:total].astype(jnp.float32)
            .reshape(height, width, spp).mean(axis=2))
    else:
        normal = np.zeros_like(color)
        coverage = np.zeros(color.shape[:2], np.float32)
    return RenderOutput(color=color, normal=normal, coverage=coverage,
                        segments=segments)
