"""shard_map-based sharded rendering and sharded differentiable training.

The ray dimension shards across the mesh; scene tables replicate. The
sharded render needs NO collectives at all (each chip writes its image
shard); the training step psums scene-parameter gradients and the scalar
loss across chips — the gradient all-reduce rides ICI concurrently with
XLA's scheduling of the backward shading pass (SURVEY.md §5).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from potato_tpu.parallel.mesh import RAY_AXIS
from potato_tpu.render.renderer import make_intersect_fn, render_chunk
from potato_tpu.scene.tables import CompiledScene


def make_sharded_render_fn(scene: CompiledScene, mesh: Mesh, *, width: int,
                           height: int, spp: int, max_bounce: int,
                           seed: int) -> Callable:
    """Returns jitted f(tables, camera, ray_ids) -> TraceResult with ray_ids
    sharded over the mesh and the scene replicated. ray_ids length must be
    divisible by the mesh size."""
    intersect_fn = make_intersect_fn(scene)
    chunk_fn = partial(render_chunk, intersect_fn=intersect_fn, width=width,
                       height=height, spp=spp, max_bounce=max_bounce, seed=seed)

    def local_render(tables, camera, ray_ids):
        out = chunk_fn(tables, camera, ray_ids)
        # the per-shard segment counter becomes a global psum — the only
        # collective in the forward render
        return out._replace(segments=jax.lax.psum(out.segments, RAY_AXIS))

    from potato_tpu.render.integrator import TraceResult

    sharded = jax.shard_map(
        local_render, mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS)),
        out_specs=TraceResult(color=P(RAY_AXIS), aov_normal=P(RAY_AXIS),
                              aov_hit=P(RAY_AXIS), segments=P()),
        # pallas_call's out_shape (flash kernel) cannot declare varying
        # mesh axes, which trips shard_map's vma validation; the specs
        # above are the full truth of what varies
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_train_step(scene: CompiledScene, mesh: Mesh, *, width: int,
                            height: int, spp: int, max_bounce: int,
                            seed: int, learning_rate: float = 0.5) -> Callable:
    """Texture-parameter optimization step (BASELINE.json config 5).

    f(atlas, tables, camera, ray_ids, target) -> (atlas', loss): renders the
    sharded ray chunk with `atlas` substituted into the tables, takes the
    L2 pixel loss against the target shard, backprops to the texel atlas,
    psums gradients over ICI, and applies plain SGD. The atlas (and its
    gradient) is replicated; rays and targets are sharded.
    """
    intersect_fn = make_intersect_fn(scene)
    chunk_fn = partial(render_chunk, intersect_fn=intersect_fn, width=width,
                       height=height, spp=spp, max_bounce=max_bounce, seed=seed)

    def local_step(atlas, tables, camera, ray_ids, target):
        def loss_fn(a):
            out = chunk_fn(tables._replace(atlas=a), camera, ray_ids)
            # local sum of squared error (normalized globally below)
            return jnp.sum((out.color - target) ** 2)

        loss, grad = jax.value_and_grad(loss_fn)(atlas)
        # the only cross-chip collectives in the whole training step
        loss = jax.lax.psum(loss, RAY_AXIS)
        grad = jax.lax.psum(grad, RAY_AXIS)
        n = target.size * jax.lax.psum(1, RAY_AXIS)
        new_atlas = atlas - learning_rate * grad / n
        return new_atlas, loss / n

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,  # see make_sharded_render_fn
    )
    return jax.jit(sharded)
