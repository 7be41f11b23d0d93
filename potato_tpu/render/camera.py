"""Vectorized thin-lens camera ray generation.

Batched analogue of `Camera::shoot` + `Multisampler::make_uv_jitter`
(reference src/render.rs:31-82): one fused kernel maps global ray ids to
jittered pixel samples to world-space rays. All randomness is counter-based
on the ray id, so any sub-batch of rays is reproducible in isolation
(the reference's per-worker entropy streams are not, src/main.rs:52).
"""

from __future__ import annotations

import jax.numpy as jnp

from potato_tpu.core import math as pmath
from potato_tpu.core import rng as prng
from potato_tpu.core import sampling
from potato_tpu.core.types import BIG, RAY_EPSILON, RayBatch
from potato_tpu.scene.tables import CameraTables


def generate_rays(camera: CameraTables, width: int, height: int, spp: int,
                  ray_ids, seed, jitter: bool = True,
                  lens: bool = True) -> RayBatch:
    """ray_ids (B,) int32 global ids in [0, width*height*spp).

    id -> pixel = id // spp (row-major i + j*width), sample = id % spp.
    Jitter and lens draws are threefry streams keyed on the ray id.

    jitter=False uses the reference's regular-grid `Multisampler::make_uv`
    (src/render.rs:66-71): uv = (i/width, j/height), every sample of a
    pixel identical (only the lens draw then differs between samples).
    """
    ray_ids = ray_ids.astype(jnp.uint32)
    # exact fast divmod (ray ids < 2^22 for every supported frame size):
    # plain // and % by the non-power-of-two width cost ~1.2 ms/frame
    pixel, _ = pmath.divmod_u32(ray_ids, spp)
    j_u, i_u = pmath.divmod_u32(pixel, width)
    i = i_u.astype(jnp.float32)
    j = j_u.astype(jnp.float32)

    if jitter:
        # pixel jitter (reference Multisampler::make_uv_jitter, render.rs:74-82)
        j1, j2 = prng.uniform2(seed, prng.STREAM_PIXEL_JITTER, ray_ids)
    else:
        j1 = j2 = jnp.zeros_like(i)
    u = (i + j1) / jnp.float32(width)
    v = (j + j2) / jnp.float32(height)

    if lens:
        # lens disk sample (reference Camera::shoot, render.rs:35-37)
        l1, l2 = prng.uniform2(seed, prng.STREAM_LENS, ray_ids)
        disk = sampling.unit_disk(l1, l2) * camera.lens_radius
    else:
        # pinhole camera (lens_radius == 0, statically known from the
        # scene): the disk sample is all-zero anyway — skip its threefry
        # block + sincos + sqrt. Bit-identical: STREAM_LENS is a
        # dedicated counter stream, so no other draw shifts.
        l1 = jnp.zeros_like(i)
        disk = jnp.zeros(i.shape + (2,), jnp.float32)

    # local-frame origin and direction (render.rs:38-45); X right, Y up,
    # Z behind => forward is -Z
    origin_local = jnp.stack(
        [disk[..., 0], disk[..., 1], jnp.zeros_like(l1)], axis=-1)
    scale = camera.tan_half_fov * camera.focal_dist
    target_local = jnp.stack([
        (2.0 * u - 1.0) * scale * camera.aspect_ratio,
        (2.0 * v - 1.0) * scale,
        -camera.focal_dist * jnp.ones_like(u),
    ], axis=-1)
    direction_local = pmath.normalize(target_local - origin_local)

    # world frame: the orientation may be non-orthonormal (lookat quirk,
    # src/utility.rs:173-178) so world directions are not renormalized —
    # exactly like the reference (render.rs:46-52)
    direction = jnp.sum(camera.orientation * direction_local[..., None, :], axis=-1)
    origin = jnp.sum(camera.orientation * origin_local[..., None, :], axis=-1) + camera.position

    # derive the t bounds from ray data (not literals) so every RayBatch
    # field carries the same varying-axis type under shard_map
    zb = origin[..., 0] * 0.0
    return RayBatch(
        origin=origin, direction=direction,
        t_min=zb + RAY_EPSILON,
        t_max=zb + BIG,
    )
