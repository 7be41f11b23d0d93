"""Frame time vs max_bounce: how much each bounce depth costs in the real
pipeline (early-exit while_loop, all chunks)."""

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

    prev = 0.0
    for mb in (1, 2, 3, 4, 8):
        frame_fn, starts = compile_frame(scene, width, height, spp=spp,
                                         max_bounce=mb)
        out = frame_fn(scene.tables, scene.camera, seed, starts)
        segs = int(np.asarray(jnp.sum(out.segments)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = frame_fn(scene.tables, scene.camera, seed, starts)
            s = int(np.asarray(jnp.sum(out.segments)))
            best = min(best, time.perf_counter() - t0)
        log(f"max_bounce={mb}: {best*1e3:7.1f} ms, {segs} segments "
            f"(+{(best-prev)*1e3:6.1f} ms vs prev)")
        prev = best


if __name__ == "__main__":
    main()
