"""Breadth-first frame driver with global live-ray compaction.

The chunked driver (renderer.py) runs each chunk's bounce loop to
completion: its `lax.while_loop` can only skip a bounce once EVERY lane
in the chunk has retired, so on divergent scenes (dielectric interiors,
thousands of spheres) almost every block still contains a live lane and
the intersection kernel runs at full per-pass cost over mostly-dead
lanes — glass_bunny spends ~80% of its frame in the kernel at ~40% mean
liveness (PROFILE_r05.json).

This driver flips the loop nest to bounce-major and compacts between
bounces, the wavefront formulation of the reference's recursion
(`trace_path_continue`, /root/reference/src/render.rs:125-146 — its
CPU recursion simply *returns* on retirement; lane compaction is the
SIMD analogue of that return):

  bounce 0:  every chunk traces one segment (camera rays, AOVs);
             survivors are packed into a dense HBM pool
  bounce b:  only ceil(n_live / C) pool chunks are processed (a
             while_loop with a data-dependent trip count); retiring
             lanes scatter their final radiance to the output buffer by
             ray id; survivors are compacted back into the pool prefix
  flush:     paths still alive after max_bounce segments write their
             radiance (they contribute their last emission but no
             further scatter, render.rs:128-131)

Every pass therefore runs on (nearly) fully-live lanes and the total
pass count drops to the utilization floor ceil(total_segments / C).
Per-pass overhead is one packed (C,13) row scatter for the compaction +
one (C,3) scatter for retirements — both row-count-bound (~1.5 ns/row
on v5e, PROFILE_r05.json), ~0.1 ms against per-pass costs of 0.2-1 ms.

Bit-identity: a path's radiance is a per-lane function of (seed, ray
id, bounce) only — the VPU computes the same values wherever the lane
sits — and the accel kernels return exact nearest hits regardless of
how rays are grouped into blocks, so the compacted image equals the
chunked image bit for bit (tests/test_compact.py asserts this).

In-place safety of the compaction: chunks are processed in order inside
the while_loop; before chunk j's scatter, survivors written so far
occupy [0, n_out) with n_out <= j*C, and the chunk writes at most C
rows at [n_out, n_out + C) ⊆ [0, (j+1)*C) — never past the region
already read. Rows beyond the final n are stale and masked dead
(idx >= n) on the next bounce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from potato_tpu.core.types import BIG, RAY_EPSILON, RayBatch
from potato_tpu.render.camera import generate_rays
from potato_tpu.render.integrator import (PathState, TraceResult, init_state,
                                          make_bounce_step)

# pool row: origin 3, direction 3, throughput 3, radiance 3, ray id 1.
# t_min/t_max are not carried: every pooled lane is an active path
# (t_min = RAY_EPSILON, t_max = BIG by construction).
_COLS = 13


def _pack(state: PathState, raw) -> jnp.ndarray:
    idf = jax.lax.bitcast_convert_type(raw.astype(jnp.uint32), jnp.float32)
    return jnp.concatenate(
        [state.rays.origin, state.rays.direction, state.throughput,
         state.radiance, idf[:, None]], axis=1)


def _unpack(block, valid):
    zb = block[:, 0] * 0.0                   # varying-typed zeros
    rays = RayBatch(
        origin=block[:, 0:3], direction=block[:, 3:6],
        t_min=zb + RAY_EPSILON,
        # stale rows beyond the live prefix are masked dead (t_max < t_min
        # -> the kernels' block-level culling skips all-dead blocks)
        t_max=jnp.where(valid, zb + BIG, zb - 1.0))
    raw = jax.lax.bitcast_convert_type(block[:, 12], jnp.uint32)
    state = PathState(
        rays=rays, radiance=block[:, 9:12], throughput=block[:, 6:9],
        active=valid, aov_normal=zb[:, None] + jnp.zeros(3, jnp.float32),
        aov_hit=zb > 0.0, segments=jnp.sum(zb).astype(jnp.int32))
    return state, raw


def build_compact_frame_fn(scene, width: int, height: int, spp: int,
                           max_bounce: int, chunk_size: int,
                           aovs: bool = False, jitter: bool = True):
    """Jitted (tables, camera, seed, starts) -> TraceResult, drop-in for
    renderer._build_frame_fn's single-dispatch form (same stacked
    (num_chunks, C, ...) output rows in traversal order; `segments`
    carries the frame total in element 0)."""
    from potato_tpu.render.renderer import (_tiles_apply, make_intersect_fn,
                                            tile_swizzle_ids)

    intersect_fn = make_intersect_fn(scene)
    total = width * height * spp
    C = chunk_size
    num_chunks = (total + C - 1) // C
    T = num_chunks * C
    tiles = _tiles_apply(width, height)
    features = scene.features
    i32 = jnp.int32

    def frame(tables, camera, seed, starts):
        step0 = make_bounce_step(tables, intersect_fn, seed,
                                 features=features, aovs=aovs)
        step_n = make_bounce_step(tables, intersect_fn, seed,
                                  features=features, aovs=False)

        out_color = jnp.zeros((T, 3), jnp.float32)
        out_normal = jnp.zeros((T, 3) if aovs else (1, 3), jnp.float32)
        out_hit = jnp.zeros((T,) if aovs else (1,), bool)
        pool = jnp.zeros((T, _COLS), jnp.float32)

        def compact_into(pool, state, raw, n_out):
            # Survivors-to-front via a stable pair sort + ONE row gather +
            # a contiguous dynamic_update_slice. A row scatter into the
            # loop-carried pool (`pool.at[dst].set`) measured 3.2 ms/pass
            # on v5e — the TPU scatter lowering walks the whole (T,13)
            # operand — while sort+gather+DUS is ~0.1 ms and the DUS
            # updates the carried buffer in place. The DUS writes all C
            # rows (survivors first, then garbage): garbage rows beyond
            # the final live count stay masked dead (idx >= n) and the
            # next chunk's DUS overwrites them (see in-place note above).
            keep = state.active
            idx = jax.lax.iota(i32, C)
            # Coherence key: survivors sorted by direction octant (then
            # stable screen order). The sort is happening anyway — keying
            # it groups same-octant rays into the same 512-ray kernel
            # blocks, re-tightening the per-block interval slabs that
            # incoherent bounce rays otherwise blow up. (A standalone
            # octant/Morton sort was a measured LOSS in the chunked
            # driver — ~21 permute gathers per bounce, renderer.py note —
            # but compaction's permutation is free.)
            d = state.rays.direction
            octant = ((d[:, 0] < 0).astype(i32) * 4 +
                      (d[:, 1] < 0).astype(i32) * 2 +
                      (d[:, 2] < 0).astype(i32))
            # ... and below the octant, a 4-bit/axis Morton code of the
            # scatter origin normalized to the chunk's own bounding box
            # (octant-major measured best: glass_bunny 28.4 -> 30.1M,
            # more_balls 36.8 -> 38.3M; position-major was a wash)
            p = state.rays.origin
            lo = jnp.min(p, axis=0)
            hi = jnp.max(p, axis=0)
            q = jnp.clip((p - lo) / jnp.maximum(hi - lo, 1e-6) * 15.999,
                         0, 15).astype(i32)
            morton = jnp.zeros(p.shape[0], i32)
            for bit in range(4):
                for axis in range(3):
                    morton = morton | (((q[:, axis] >> bit) & 1)
                                       << (3 * bit + axis))
            sort_key = ((~keep).astype(i32) * (8 << 12)
                        + octant * (1 << 12) + morton)
            _, order = jax.lax.sort((sort_key, idx), num_keys=1,
                                    is_stable=True)
            rows = _pack(state, raw)[order]
            pool = jax.lax.dynamic_update_slice(
                pool, rows, (n_out, jnp.zeros((), i32)))
            return pool, n_out + jnp.sum(keep.astype(i32))

        # ---- bounce 0: camera rays, chunk by chunk (static trip count)
        def bounce0(carry, start):
            pool, out_color, out_normal, out_hit, n, segments = carry
            raw = jax.lax.iota(jnp.uint32, C) + start
            lin = raw % jnp.uint32(total)
            ids = tile_swizzle_ids(lin, width, spp) if tiles else lin
            live = raw < jnp.uint32(total)
            rays = generate_rays(camera, width, height, spp, ids, seed,
                                 jitter=jitter, lens=features.has_lens)
            st = step0(init_state(rays, live=live), 0, ids)
            # retired (and dead-born) lanes are final now; survivors get 0
            # here and their true value by scatter at retirement/flush
            write = jnp.where(st.active[:, None], 0.0, st.radiance)
            s0 = start.astype(i32)
            out_color = jax.lax.dynamic_update_slice(
                out_color, write, (s0, jnp.zeros((), i32)))
            if aovs:
                out_normal = jax.lax.dynamic_update_slice(
                    out_normal, st.aov_normal, (s0, jnp.zeros((), i32)))
                out_hit = jax.lax.dynamic_update_slice(
                    out_hit, st.aov_hit, (s0,))
            pool, n = compact_into(pool, st, raw, n)
            return (pool, out_color, out_normal, out_hit, n,
                    segments + st.segments), None

        carry0 = (pool, out_color, out_normal, out_hit,
                  jnp.zeros((), i32), jnp.zeros((), i32))
        (pool, out_color, out_normal, out_hit, n, segments), _ = \
            jax.lax.scan(bounce0, carry0, starts)

        # ---- bounces 1..max_bounce-1 over the live prefix only
        def chunk_pass(carry):
            pool, out_color, n_in, n_out, segments, bounce, j = carry
            block = jax.lax.dynamic_slice(pool, (j * C, 0), (C, _COLS))
            idx = j * C + jax.lax.iota(i32, C)
            valid = idx < n_in
            st, raw = _unpack(block, valid)
            # stale-lane ids are garbage bits; they only feed counter RNG
            # and the (masked-dead) shade path — never an indexed load
            lin = raw % jnp.uint32(total)
            ids = tile_swizzle_ids(lin, width, spp) if tiles else lin
            st = step_n(st, bounce, ids)
            retired = valid & ~st.active
            out_idx = jnp.where(retired, raw.astype(i32), T)
            out_color = out_color.at[out_idx].set(
                st.radiance, mode="drop", unique_indices=True)
            pool, n_out = compact_into(pool, st, raw, n_out)
            return (pool, out_color, n_in, n_out,
                    segments + st.segments, bounce, j + 1)

        def one_bounce(carry):
            pool, out_color, n, segments, bounce = carry
            c2 = (pool, out_color, n, jnp.zeros((), i32), segments, bounce,
                  jnp.zeros((), i32))
            c2 = jax.lax.while_loop(
                lambda c: c[6] < (c[2] + (C - 1)) // C, chunk_pass, c2)
            pool, out_color, _, n2, segments, _, _ = c2
            return (pool, out_color, n2, segments, bounce + 1)

        carry = jax.lax.while_loop(
            lambda c: (c[4] < max_bounce) & (c[2] > 0), one_bounce,
            (pool, out_color, n, segments, jnp.asarray(1, i32)))
        pool, out_color, n, segments, _ = carry

        # ---- flush: paths alive after max_bounce segments are final
        def flush(carry):
            out_color, j = carry
            block = jax.lax.dynamic_slice(pool, (j * C, 0), (C, _COLS))
            idx = j * C + jax.lax.iota(i32, C)
            valid = idx < n
            raw = jax.lax.bitcast_convert_type(block[:, 12], jnp.uint32)
            out_idx = jnp.where(valid, raw.astype(i32), T)
            out_color = out_color.at[out_idx].set(
                block[:, 9:12], mode="drop", unique_indices=True)
            return out_color, j + 1

        out_color, _ = jax.lax.while_loop(
            lambda c: c[1] < (n + (C - 1)) // C, flush,
            (out_color, jnp.zeros((), i32)))

        if aovs:
            normal = out_normal.reshape(num_chunks, C, 3)
            hit = out_hit.reshape(num_chunks, C)
        else:
            normal = jnp.zeros((num_chunks, C, 3), jnp.float32)
            hit = jnp.zeros((num_chunks, C), bool)
        # frame-total segments in element 0: callers sum over chunks
        seg = jnp.zeros((num_chunks,), i32).at[0].set(segments)
        return TraceResult(color=out_color.reshape(num_chunks, C, 3),
                           aov_normal=normal, aov_hit=hit, segments=seg)

    return jax.jit(frame)
