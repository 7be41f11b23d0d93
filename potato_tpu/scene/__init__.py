"""Scene layer: description API, flat device tables, BVH build, examples.

The reference keeps its scene as index-addressed tables
(`SceneData {material_table, texture_table, mesh_table}`, src/render.rs:10-14)
plus a `Hittable` tree. Here the same idea goes all the way: a scene is
*data* — a `SceneTables` pytree of flat SoA jnp arrays that every kernel
gathers from branchlessly. Scenes are built host-side with `SceneBuilder`
(numpy), compiled once, and uploaded to every chip (replicated sharding).
"""

from potato_tpu.scene.description import (  # noqa: F401
    Absorb,
    Emit,
    Material,
    Scatter,
    SceneBuilder,
    Texture,
)
from potato_tpu.scene.tables import SceneTables  # noqa: F401
