"""Multi-chip scale-out: device meshes, sharded rendering, sharded training.

Replaces the reference's OS-thread pool + mutex tile queue
(src/main.rs:36-103) with static SPMD over a `jax.sharding.Mesh`: the flat
(pixel x sample) ray dimension is the data-parallel axis; scene tables are
replicated per chip (the reference's Arc<Scene> analogue); the only
cross-chip communication is the image gather (sharded output) and the
psum of scene-parameter gradients over ICI during optimization.
"""

from potato_tpu.parallel.mesh import make_ray_mesh  # noqa: F401
from potato_tpu.parallel.shard import (  # noqa: F401
    make_sharded_render_fn,
    make_sharded_train_step,
)
