"""Frame time vs chunk size: how much per-chunk fixed overhead costs."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    from potato_tpu.render.renderer import compile_frame
    from potato_tpu.scene import examples

    scene = examples.bunny().build(accel="flash")
    width, height, spp = 800, 600, 4
    seed = jnp.uint32(0)

    for shift in (13, 14, 15, 16):
        frame_fn, starts = compile_frame(scene, width, height, spp=spp,
                                         max_bounce=8, chunk_size=1 << shift)
        out = frame_fn(scene.tables, scene.camera, seed, starts)
        segs = int(np.asarray(jnp.sum(out.segments)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = frame_fn(scene.tables, scene.camera, seed, starts)
            int(np.asarray(jnp.sum(out.segments)))
            best = min(best, time.perf_counter() - t0)
        log(f"chunk 2^{shift} ({len(starts)} chunks): {best*1e3:7.1f} ms, "
            f"{segs/best/1e6:.1f}M rays/s")


if __name__ == "__main__":
    main()
