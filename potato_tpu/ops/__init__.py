"""Device-side ops: intersection, traversal, texture sampling, shading.

All ops are pure functions over SoA batches with static shapes — the hot
path of the renderer. Dispatch that the reference does with enum `match`
(src/hittable.rs:18-34, src/material.rs:27-34, src/texture.rs:21-35) is
done branchlessly here: compute every variant on the VPU, select by kind.
"""
