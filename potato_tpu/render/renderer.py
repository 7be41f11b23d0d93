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


def scene_digest(scene: CompiledScene) -> int:
    """Order-stable 63-bit digest of the scene content (tables + camera).

    Folded into the render-checkpoint signature so a checkpoint written for
    one scene can never be resumed into a render of another (or of the same
    scene after edits). Fetches the tables to the host once — only called
    on checkpointing paths.
    """
    import hashlib

    h = hashlib.blake2b(digest_size=8)
    for leaf in jax.tree_util.tree_leaves((scene.tables, scene.camera)):
        a = np.asarray(leaf)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return int.from_bytes(h.digest(), "little") >> 1  # fits int64


def make_intersect_fn(scene: CompiledScene):
    """Pick the acceleration entry point compiled into the render fn.

    Note on ray sorting: a live-first, Morton-cell + direction-octant sort
    of rays before intersection (packing coherent rays into the same kernel
    blocks) was implemented and profiled on v5e; the ~21 permute-gathers
    per bounce (~0.3 ms each at the TPU's ~1 elem/cycle gather rate) cost
    more than the cluster-list sharing they bought, so it was removed. The
    per-block cluster selection already adapts to incoherent rays, and
    camera order itself is pixel-coherent.
    """
    from potato_tpu.ops.dense import DenseAccel, intersect_dense
    from potato_tpu.ops.flash import FlashAccel, intersect_flash
    from potato_tpu.scene.bvh import ClusterAccel

    accel = scene.accel
    # interpret mode on CPU (tests); compiled Mosaic on TPU
    interp = jax.default_backend() != "tpu"
    if isinstance(accel, FlashAccel):
        return lambda tables, rays: intersect_flash(accel, tables, rays,
                                                    interpret=interp)
    if isinstance(accel, DenseAccel):
        return lambda tables, rays: intersect_dense(accel, tables, rays)
    if isinstance(accel, ClusterAccel):
        return lambda tables, rays: intersect_clustered(accel, rays)
    return intersect_brute_force


TILE_W, TILE_H = 16, 8   # pixels per ray-order tile (x spp rays)


def _tiles_apply(width: int, height: int) -> bool:
    return width % TILE_W == 0 and height % TILE_H == 0


def tile_swizzle_ids(lin, width: int, spp: int):
    """Permute the linear ray order so consecutive ids cover a compact
    TILE_W x TILE_H pixel tile (x spp samples) instead of a 1-pixel-high
    scanline strip.

    The flash kernel builds one cluster list per 512 consecutive rays; a
    tile's list is the union over a compact screen patch (the reference's
    32x32 tiles, src/main.rs:36, serve the same locality role for its
    per-thread BVH walks) instead of a width-spanning strip — measured ~2x
    fewer cluster visits on the bunny bench. Pure permutation: each ray's
    RNG and pixel assignment are functions of the *physical* id, so the
    rendered image is bit-identical to scanline order after unpermuting.
    """
    from potato_tpu.core.math import divmod_u32

    lin = lin.astype(jnp.uint32)
    t_idx, within = divmod_u32(lin, TILE_W * TILE_H * spp)
    pix, sample = divmod_u32(within, spp)
    ty, tx = divmod_u32(t_idx, width // TILE_W)
    pr, pc = divmod_u32(pix, TILE_W)
    px = tx * TILE_W + pc
    py = ty * TILE_H + pr
    return (py * jnp.uint32(width) + px) * jnp.uint32(spp) + sample


def tile_unswizzle_perm(width: int, height: int, spp: int) -> np.ndarray:
    """Host-side: physical ray id for each raw (traversal-order) row."""
    lin = np.arange(width * height * spp, dtype=np.uint64)
    tile = TILE_W * TILE_H * spp
    t_idx, within = lin // tile, lin % tile
    pix, sample = within // spp, within % spp
    tiles_x = width // TILE_W
    px = (t_idx % tiles_x) * TILE_W + pix % TILE_W
    py = (t_idx // tiles_x) * TILE_H + pix // TILE_W
    return ((py * width + px) * spp + sample).astype(np.int64)


def render_chunk(tables, camera, ray_ids, *, intersect_fn, width, height,
                 spp, max_bounce, seed, features=None,
                 early_exit: bool = False, live=None,
                 ior_score: bool = False, jitter: bool = True,
                 aovs: bool = True) -> TraceResult:
    """Jittable: trace one chunk of global ray ids to radiance + AOVs."""
    rays = generate_rays(
        camera, width, height, spp, ray_ids, seed, jitter=jitter,
        lens=features.has_lens if features is not None else True)
    return trace_paths(tables, intersect_fn, rays, ray_ids, max_bounce, seed,
                       features=features, early_exit=early_exit, live=live,
                       ior_score=ior_score, aovs=aovs)


def _build_frame_fn(scene: CompiledScene, width: int, height: int, spp: int,
                    max_bounce: int, chunk_size: int,
                    per_chunk: bool = False, jitter: bool = True,
                    aovs: bool = True):
    """One jitted function rendering ALL chunks of a frame in one dispatch.

    `seed` and the chunk start offsets are dynamic arguments, so reseeding
    or re-rendering never retraces or recompiles; `lax.map` serializes the
    chunks on device (bounded memory, zero per-chunk dispatch latency).

    per_chunk=True returns instead a jitted single-chunk function
    (tables, camera, seed, start) -> TraceResult, dispatched once per chunk
    by the caller — the progress-reporting path."""
    intersect_fn = make_intersect_fn(scene)
    total = width * height * spp
    tiles = _tiles_apply(width, height)

    def one_chunk(tables, camera, seed, start):
        # The tail chunk's lanes beyond `total` are born dead (live=False):
        # they trace zero segments (the kernels' dead-lane culling skips
        # them) and are excluded from the segments counter, so the bench
        # numerator counts each frame ray exactly once.
        raw = jax.lax.iota(jnp.uint32, chunk_size) + start
        lin = raw % jnp.uint32(total)
        ids = tile_swizzle_ids(lin, width, spp) if tiles else lin
        return render_chunk(tables, camera, ids,
                            intersect_fn=intersect_fn, width=width,
                            height=height, spp=spp,
                            max_bounce=max_bounce, seed=seed,
                            features=scene.features, early_exit=True,
                            live=raw < jnp.uint32(total), jitter=jitter,
                            aovs=aovs)

    if per_chunk:
        return jax.jit(one_chunk)

    def frame(tables, camera, seed, starts):
        return jax.lax.map(
            lambda start: one_chunk(tables, camera, seed, start), starts)

    return jax.jit(frame)


def default_driver(scene: CompiledScene) -> str:
    """Frame-driver policy, measured per scene on v5e (PERF_SCENES_r05).

    "compact" (render/compact.py) wins when bounce passes run at low mean
    liveness — scenes whose paths diverge in length (dielectrics keep
    bouncing while neighbours retire) — by packing survivors densely so
    every kernel block is fully live. "chunked" wins on short-coherent-
    path scenes (bunny/earth, mean path ~1.6) where passes are near-full
    anyway and compaction is pure overhead.
    """
    from potato_tpu.scene import description as d

    diverges = d.SCATTER_DIELECTRIC in scene.features.scatter_kinds
    return "compact" if diverges else "chunked"


def compile_frame(scene: CompiledScene, width: int, height: int, spp: int = 4,
                  max_bounce: int = 8, chunk_size: Optional[int] = None,
                  aovs: bool = False, driver: Optional[str] = None):
    """Compile (or fetch cached) the single-dispatch frame function.

    Returns (frame_fn, starts): frame_fn(tables, camera, seed_u32, starts)
    -> TraceResult of stacked chunks, entirely on device. This is the
    device-only benchmarking surface — timing it with block_until_ready
    measures TPU compute without host-transfer latency (bench.py).

    driver: "chunked" (lax.map over chunks, each running its bounce loop
    to completion) or "compact" (bounce-major with live-ray compaction,
    render/compact.py). None = per-scene default (default_driver).
    """
    total = width * height * spp
    if chunk_size is None:
        chunk_size = min(total, 1 << 15)  # swept on v5e: 2^15 beats 2^14..2^20 (finer early-exit granularity wins; tools/profile_chunksize.py)
    chunk_size = min(chunk_size, total)
    num_chunks = (total + chunk_size - 1) // chunk_size
    if driver is None:
        driver = default_driver(scene)
    key = (width, height, spp, max_bounce, chunk_size, False, True, aovs,
           driver)
    frame_fn = scene.fn_cache.get(key)
    if frame_fn is None:
        if driver == "compact":
            from potato_tpu.render.compact import build_compact_frame_fn
            frame_fn = build_compact_frame_fn(scene, width, height, spp,
                                              max_bounce, chunk_size,
                                              aovs=aovs)
        else:
            frame_fn = _build_frame_fn(scene, width, height, spp, max_bounce,
                                       chunk_size, aovs=aovs)
        scene.fn_cache[key] = frame_fn
    starts = jnp.arange(num_chunks, dtype=jnp.uint32) * jnp.uint32(chunk_size)
    return frame_fn, starts


def render(scene: CompiledScene, width: int, height: int, spp: int = 4,
           max_bounce: int = 8, seed: int = 0,
           chunk_size: Optional[int] = None,
           progress: bool = False,
           with_aovs: bool = True,
           checkpoint_path: Optional[str] = None,
           checkpoint_every: int = 1,
           jitter: bool = True,
           driver: Optional[str] = None,
           metrics=None) -> RenderOutput:
    """Render a full frame (reference defaults: 800x600, spp 4, bounce 8,
    src/main.rs:13-32).

    with_aovs controls only which buffers are fetched to the host.

    metrics: optional utils.metrics.MetricsLogger (or POTATO_METRICS env
    path) — emits structured render_start / chunk / render_complete
    JSONL events, the per-step metrics stream the reference's progress
    bar + single println (src/main.rs:37,92,105-106) lacked.

    checkpoint_path: running-image checkpoint for long renders (the
    subsystem the reference lacks: its tiles are completed-or-lost,
    src/main.rs:100-122, SURVEY.md §5). Completed chunks are saved every
    `checkpoint_every` chunks (atomic write-then-rename); a rerun with the
    same arguments resumes after the last saved chunk and — because every
    ray's randomness is a pure function of (seed, ray id) — produces a
    final image bit-identical to an uninterrupted render. Implies
    per-chunk dispatch (the progress path).
    """
    import time

    from potato_tpu.utils.metrics import from_env_or

    metrics = from_env_or(metrics)
    t_start = time.perf_counter()

    total = width * height * spp
    if chunk_size is None:
        chunk_size = min(total, 1 << 15)  # swept on v5e: 2^15 beats 2^14..2^20 (finer early-exit granularity wins; tools/profile_chunksize.py)
    chunk_size = min(chunk_size, total)
    num_chunks = (total + chunk_size - 1) // chunk_size
    per_chunk = progress or checkpoint_path is not None
    metrics.log("render_start", width=width, height=height, spp=spp,
                max_bounce=max_bounce, seed=seed, chunk_size=chunk_size,
                num_chunks=num_chunks, per_chunk=per_chunk)

    # driver choice: the compact (bounce-major) driver applies to the
    # single-dispatch path only — the per-chunk progress/checkpoint path
    # needs chunk-granular results and stays chunked.
    if driver is None:
        driver = default_driver(scene)
    if per_chunk:
        driver = "chunked"

    key = (width, height, spp, max_bounce, chunk_size, per_chunk, jitter,
           driver)
    frame_fn = scene.fn_cache.get(key)
    if frame_fn is None:
        if driver == "compact":
            from potato_tpu.render.compact import build_compact_frame_fn
            frame_fn = build_compact_frame_fn(scene, width, height, spp,
                                              max_bounce, chunk_size,
                                              aovs=True, jitter=jitter)
        else:
            frame_fn = _build_frame_fn(scene, width, height, spp, max_bounce,
                                       chunk_size, per_chunk=per_chunk,
                                       jitter=jitter)
        scene.fn_cache[key] = frame_fn

    # fixed chunk shape: the tail chunk's out-of-range lanes are born dead
    # (zero traced segments, excluded from the counter)
    starts = jnp.arange(num_chunks, dtype=jnp.uint32) * jnp.uint32(chunk_size)
    if per_chunk:
        # per-chunk dispatch + a progress line per completed chunk — the
        # reference's per-tile indicatif bar (src/main.rs:37,92). Costs one
        # dispatch round trip per chunk; progress=False renders the whole
        # frame in a single dispatch.
        import os
        import sys

        # The checkpoint is only valid for an identical render request OF
        # THE SAME SCENE: the signature folds in a digest of the scene
        # tables + camera so editing the scene (or pointing a different
        # scene at the same path) invalidates stale chunks instead of
        # silently resuming into a mixed frame.
        signature = np.asarray([width, height, spp, max_bounce, seed,
                                chunk_size, int(jitter),
                                scene_digest(scene)], np.int64)
        chunks = []      # device (or resumed-host) TraceResults, in order
        host_chunks = []  # numpy copies already serialized to the checkpoint
        if checkpoint_path and os.path.exists(checkpoint_path):
            ckpt = np.load(checkpoint_path)
            if np.array_equal(ckpt["signature"], signature):
                for i in range(int(ckpt["chunks_done"])):
                    chunks.append(TraceResult(
                        color=ckpt["color"][i],
                        aov_normal=ckpt["aov_normal"][i],
                        aov_hit=ckpt["aov_hit"][i],
                        segments=ckpt["segments"][i]))
                host_chunks = [jax.tree_util.tree_map(np.asarray, c)
                               for c in chunks]
                if progress and chunks:
                    print(f"[resumed at chunk {len(chunks)}/{num_chunks}]",
                          file=sys.stderr, flush=True)

        def save_checkpoint():
            # each chunk is fetched to the host exactly once (host_chunks
            # caches the numpy copies), so a save is O(new chunks) transfer
            # + O(total) local stacking, not O(n^2) device fetches
            while len(host_chunks) < len(chunks):
                host_chunks.append(jax.tree_util.tree_map(
                    np.asarray, chunks[len(host_chunks)]))
            tmp = checkpoint_path + ".tmp.npz"
            with open(tmp, "wb") as f:
                np.savez(f, signature=signature, chunks_done=len(host_chunks),
                         color=np.stack([c.color for c in host_chunks]),
                         aov_normal=np.stack([c.aov_normal for c in host_chunks]),
                         aov_hit=np.stack([c.aov_hit for c in host_chunks]),
                         segments=np.stack([c.segments for c in host_chunks]))
            os.replace(tmp, checkpoint_path)  # atomic: never a torn file

        for i in range(len(chunks), num_chunks):
            t_c = time.perf_counter()
            chunks.append(jax.block_until_ready(frame_fn(
                scene.tables, scene.camera, jnp.asarray(seed, jnp.uint32),
                starts[i])))
            metrics.log("chunk", chunk=i, of=num_chunks,
                        seconds=round(time.perf_counter() - t_c, 4))
            if checkpoint_path and ((i + 1) % checkpoint_every == 0
                                    or i + 1 == num_chunks):
                save_checkpoint()
                metrics.log("checkpoint", chunks_done=i + 1)
            if progress:
                done = min((i + 1) * chunk_size, total)
                print(f"\r[{done}/{total} rays, chunk {i + 1}/{num_chunks}]",
                      end="" if i + 1 < num_chunks else "\n",
                      file=sys.stderr, flush=True)
        out = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *chunks)
    else:
        out = frame_fn(scene.tables, scene.camera,
                       jnp.asarray(seed, jnp.uint32), starts)

    # rows come back in traversal order; under tile swizzle, scatter them
    # to their physical (pixel, sample) slots before the spp average
    if _tiles_apply(width, height):
        perm = tile_unswizzle_perm(width, height, spp)

        def unswizzle(rows):
            flat = np.empty_like(rows)
            flat[perm] = rows
            return flat
    else:
        def unswizzle(rows):
            return rows

    # spp average (reference main.rs:88-90) on device: the host fetch is a
    # quarter the bytes (and remote-attached chips pay real transfer cost)
    color = unswizzle(np.asarray(out.color.reshape(-1, 3)[:total])) \
        .reshape(height, width, spp, 3).mean(axis=2)
    segments = int(np.asarray(jnp.sum(out.segments)))
    if with_aovs:
        normal = unswizzle(np.asarray(out.aov_normal.reshape(-1, 3)[:total])) \
            .reshape(height, width, spp, 3).mean(axis=2)
        coverage = unswizzle(
            np.asarray(out.aov_hit.reshape(-1)[:total].astype(jnp.float32))) \
            .reshape(height, width, spp).mean(axis=2)
    else:
        normal = np.zeros_like(color)
        coverage = np.zeros(color.shape[:2], np.float32)
    wall = time.perf_counter() - t_start
    metrics.log("render_complete", segments=segments,
                seconds=round(wall, 4),
                rays_per_s=round(segments / max(wall, 1e-9), 1))
    return RenderOutput(color=color, normal=normal, coverage=coverage,
                        segments=segments)
