"""Per-scene TPU throughput matrix (VERDICT r5 item #3).

Round 4's perf evidence was bunny-only; this measures every structurally
distinct scene on real hardware with the bench.py sustained methodology
(BATCH frames per dispatch, best of 3 reps) so the accel constants are
validated against: a triangle-mesh scene with env map (bunny), a
bounce-heavy dielectric mesh (glass_bunny), a 3786-sphere scene running
the IN-KERNEL sphere phase (more_balls_optimized), and a small
XLA-sphere-path scene with an image texture (earth).

Run:  python tools/perf_scenes.py [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCENES = ["bunny", "glass_bunny", "more_balls_optimized", "earth",
          "three_balls"]

# One-sentence read on each scene's number (VERDICT r5 item #3), kept
# here so regenerating the matrix never drops them.
FINDINGS = {
    "bunny": "the r5 headline scene - accel constants (TOP_P=2, W=16, "
             "chunk 2^15) tuned and re-swept here; stays on the CHUNKED "
             "driver (compact measured 62.9M: at mean path 1.57 most "
             "passes are the always-full bounce 0, so compaction is pure "
             "overhead); bench.py additionally pipelines dispatch "
             "submits, hence its higher headline",
    "glass_bunny": "2.1x via the compacted breadth-first driver "
             "(render/compact.py): chunked ran 451 passes at 39% mean "
             "liveness (80% of frame = kernel on mostly-dead blocks); "
             "compact runs 179 passes (floor 175) fully live, and the "
             "free coherence-keyed compaction sort (direction octant + "
             "origin Morton) re-tightens the per-block interval slabs. "
             "Still kernel-bound (~63%): incoherent interior segments "
             "cost ~29 ns vs 2.2 ns for coherent bounce-0 rays - per-ray "
             "traversal remains the next design if this scene must go "
             "faster",
    "more_balls_optimized": "4.9x its round-5 start (10.5M): the "
             ">16-material record fetch became one row gather + selector "
             "dot, the hybrid sphere split XLA-brutes the SPH_BRUTE_MAX "
             "largest spheres (re-swept under compact: 16 still beats "
             "64/128), the compact driver packs its 39%-live bounce "
             "passes dense (25.7 -> 39.1M), and the small-texture-table "
             "fetch became one one-hot MXU dot (ops/texture.py: even a "
             "3-row per-lane gather costs row-rate, ~24 ms/frame here; "
             "39.1 -> 51.5M)",
    "earth": "a near-trivial-intersection scene showing the non-kernel "
             "pipeline floor (raygen+shade+RNG+state) supports >160M "
             "rays/s; stays chunked (compact 66.0M)",
    "three_balls": "thin-lens camera (the lens disk draw + its trig live "
             "here, unlike pinhole bunny) + 4-sphere XLA-brute path + "
             "dielectric bounces; compact driver + one-hot texture fetch 68.1 -> 101.2M",
}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PERF_SCENES_r05.json"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from potato_tpu.cache import enable_persistent_cache
    from potato_tpu.render.renderer import compile_frame, default_driver
    from potato_tpu.scene import examples

    enable_persistent_cache()
    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    width, height, spp, max_bounce = 800, 600, 4, 8
    BATCH = int(os.environ.get("POTATO_BENCH_BATCH", "8"))
    results = {}

    for name in SCENES:
        t0 = time.time()
        scene = examples.SCENES[name]().build(accel="flash")
        build_s = time.time() - t0
        log(f"{name}: built in {build_s:.1f}s ({scene.num_triangles} tris, "
            f"{scene.num_spheres} spheres)")

        t0 = time.time()
        frame_fn, starts = compile_frame(scene, width, height, spp=spp,
                                         max_bounce=max_bounce)

        @jax.jit
        def batch_fn(tables, camera, seeds, starts, frame_fn=frame_fn):
            return jnp.sum(jax.lax.map(
                lambda seed: jnp.sum(
                    frame_fn(tables, camera, seed, starts).segments),
                seeds))

        seeds0 = jnp.arange(1, 1 + BATCH, dtype=jnp.uint32)
        segs = int(np.asarray(batch_fn(scene.tables, scene.camera, seeds0,
                                       starts)))
        compile_s = time.time() - t0

        best = 0.0
        for rep in range(3):
            seeds = jnp.arange(1 + rep * BATCH, 1 + (rep + 1) * BATCH,
                               dtype=jnp.uint32)
            t0 = time.perf_counter()
            segs = int(np.asarray(batch_fn(scene.tables, scene.camera,
                                           seeds, starts)))
            dt = time.perf_counter() - t0
            best = max(best, segs / dt)
        mean_path = segs / BATCH / (width * height * spp)
        log(f"{name}: {best / 1e6:.1f}M rays/s sustained, "
            f"mean path length {mean_path:.2f} "
            f"(compile+warm {compile_s:.0f}s)")
        results[name] = {
            "rays_per_s_sustained": round(best, 1),
            "segments_per_frame": segs // BATCH,
            "mean_path_length": round(mean_path, 3),
            "num_triangles": scene.num_triangles,
            "num_spheres": scene.num_spheres,
            "sphere_path": ("in-kernel clusters"
                            if scene.num_spheres > 16 else "xla-brute"),
            "driver": default_driver(scene),
        }

    doc = {
        "hardware": "TPU v5e (1 chip, axon tunnel)",
        "workload": f"{width}x{height} x {spp}spp x <={max_bounce} bounces, "
                    f"flash accel, sustained {BATCH} frames/dispatch "
                    "sequential (bench.py additionally pipelines submits), "
                    "best of 3",
        "scenes": results,
        "findings": {k: FINDINGS[k] for k in results},
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
