"""Benchmark: bunny-scene path-tracing throughput on one chip.

Workload = the reference's default render (src/main.rs:13-32): bunny.obj
(4,968 triangles + ground sphere, BVH) at 800x600, 4 spp, max 8 bounces.
Metric = traced path segments per second (each segment is one scene
intersection + material evaluation, the reference's per-ray unit of work).
Baseline target: 200M rays/s/chip (BASELINE.json north star).

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time


def main():
    import jax

    from potato_tpu.render.renderer import render
    from potato_tpu.scene import examples

    # persistent compile cache: first-ever run pays the (remote) compile,
    # every later process reuses the serialized executable
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    width, height, spp, max_bounce = 800, 600, 4, 8
    t0 = time.time()
    scene = examples.bunny().build(accel="flash")
    print(f"scene build: {time.time() - t0:.2f}s "
          f"({scene.num_triangles} tris, {scene.num_spheres} spheres)",
          file=sys.stderr)

    chunk = 1 << 18

    # warmup / compile
    t0 = time.time()
    out = render(scene, width, height, spp=spp, max_bounce=max_bounce,
                 seed=0, chunk_size=chunk, with_aovs=False)
    print(f"warmup (compile + render): {time.time() - t0:.2f}s, "
          f"segments={out.segments}", file=sys.stderr)

    # timed
    best = None
    for rep in range(3):
        t0 = time.time()
        out = render(scene, width, height, spp=spp, max_bounce=max_bounce,
                     seed=rep + 1, chunk_size=chunk, with_aovs=False)
        dt = time.time() - t0
        rays_per_s = out.segments / dt
        print(f"rep {rep}: {dt * 1e3:.1f} ms, {out.segments} segments, "
              f"{rays_per_s / 1e6:.1f}M rays/s", file=sys.stderr)
        best = max(best or 0.0, rays_per_s)

    try:
        from potato_tpu.io import tga
        tga.save(out.srgb(), "/tmp/bench_bunny.tga")
    except Exception as e:  # noqa: BLE001 - bench must still report
        print(f"image save skipped: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "bunny_rays_per_second_per_chip",
        "value": round(best, 1),
        "unit": "rays/s",
        "vs_baseline": round(best / 200e6, 4),
    }))


if __name__ == "__main__":
    main()
