"""Command-line renderer.

The config/flag system the reference never had (all its parameters are code
constants, src/main.rs:13-32, and scenes are chosen by editing code,
src/main.rs:16-21). Usage:

    python -m potato_tpu.cli render --scene bunny --width 800 --height 600 \
        --spp 4 --max-bounce 8 --output output.tga
    python -m potato_tpu.cli list-scenes
    python -m potato_tpu.cli bench --scene bunny
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_render_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--scene", default="bunny", help="scene name (see list-scenes)")
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=600)
    p.add_argument("--spp", type=int, default=4, help="samples per pixel")
    p.add_argument("--max-bounce", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--accel",
                   choices=["auto", "flash", "pallas", "dense", "cluster",
                            "brute"],
                   default="auto",
                   help="acceleration structure (auto = flash, the "
                        "supported Pallas path; see scene/tables.py)")
    p.add_argument("--no-progress", action="store_true",
                   help="single-dispatch render without per-chunk progress")
    p.add_argument("--cluster-size", type=int, default=64)
    p.add_argument("--chunk-size", type=int, default=None,
                   help="rays per jit call (default: min(total, 2^15))")
    p.add_argument("--driver", choices=["auto", "chunked", "compact"],
                   default="auto",
                   help="frame driver: chunked (per-chunk bounce loops) or "
                        "compact (breadth-first with live-ray compaction; "
                        "wins on path-length-divergent scenes). auto = "
                        "measured per-scene policy. Progress/checkpoint "
                        "renders always use chunked.")
    p.add_argument("--no-jitter", action="store_true",
                   help="regular-grid pixel sampling (reference "
                        "Multisampler::make_uv, src/render.rs:66-71) "
                        "instead of jittered")
    p.add_argument("--assets", default=None, help="assets directory override")
    p.add_argument("--metrics", default=None, metavar="PATH",
                   help="write structured JSONL metrics (render_start/"
                        "chunk/render_complete) to PATH ('-' = stderr; "
                        "POTATO_METRICS env also works)")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="potato_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_render = sub.add_parser("render", help="render a scene to a TGA file")
    _add_render_args(p_render)
    p_render.add_argument("--output", default="output.tga")
    p_render.add_argument("--aov-normal", default=None,
                          help="also write the first-hit normal AOV here")
    p_render.add_argument("--alpha-coverage", action="store_true",
                          help="write foreground coverage into alpha "
                               "(reference src/main.rs:111-118, off by default)")

    sub.add_parser("list-scenes", help="list available scenes")

    p_bench = sub.add_parser("bench", help="timed render, prints rays/s")
    _add_render_args(p_bench)

    args = parser.parse_args(argv)

    from potato_tpu.scene import examples

    if args.command == "list-scenes":
        for name in examples.SCENES:
            print(name)
        return 0

    import os

    if args.assets:
        os.environ["POTATO_ASSETS"] = args.assets
        examples.ASSETS_DIR = args.assets

    import numpy as np

    from potato_tpu.cache import enable_persistent_cache
    from potato_tpu.io import tga
    from potato_tpu.render.renderer import render

    enable_persistent_cache()

    if args.scene not in examples.SCENES:
        print(f"unknown scene {args.scene!r}; try list-scenes", file=sys.stderr)
        return 2

    t0 = time.time()
    scene = examples.SCENES[args.scene]().build(
        accel=args.accel, cluster_size=args.cluster_size)
    print(f"scene build: {time.time() - t0:.2f}s "
          f"({scene.num_triangles} tris, {scene.num_spheres} spheres)",
          file=sys.stderr)

    # bench times a single-dispatch frame; render shows per-chunk progress
    show_progress = args.command == "render" and not args.no_progress
    t0 = time.time()
    from potato_tpu.utils.metrics import MetricsLogger

    metrics = MetricsLogger(args.metrics) if args.metrics else None
    out = render(scene, args.width, args.height, spp=args.spp,
                 max_bounce=args.max_bounce, seed=args.seed,
                 chunk_size=args.chunk_size, progress=show_progress,
                 jitter=not args.no_jitter, metrics=metrics,
                 driver=None if args.driver == "auto" else args.driver)
    dt = time.time() - t0
    print(f"Rendering done in {dt:.2f} seconds "
          f"({out.segments / dt / 1e6:.1f}M rays/s)", file=sys.stderr)

    if args.command == "bench":
        print(json.dumps({"rays_per_s": out.segments / dt, "seconds": dt,
                          "segments": out.segments}))
        return 0

    rgba = out.srgb()
    if args.alpha_coverage:
        rgba = np.array(rgba)
        rgba[..., 3] = (255.0 * out.coverage).astype(np.uint8)
    tga.save(rgba, args.output)
    print(f"wrote {args.output}", file=sys.stderr)

    if args.aov_normal:
        from potato_tpu.core import color as pcolor
        import jax.numpy as jnp

        normal01 = 0.5 * out.normal + 0.5
        tga.save(np.asarray(pcolor.to_u8(jnp.asarray(normal01))), args.aov_normal)
        print(f"wrote {args.aov_normal}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
