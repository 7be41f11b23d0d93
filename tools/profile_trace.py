"""Per-op device-time profile of the bench frame via jax.profiler xplane.

The round-4/5 perf campaigns are driven by op-level A/B on the real chip:
frame-level timing says WHETHER a change helped, this says WHERE the time
went. Captures a jax.profiler trace of the sustained bench dispatch
(4 frames per dispatch, the bench.py methodology), parses the xplane.pb
on the host, and prints every TPU op aggregated by name, descending
self-time.

Reading the output (hard-won, see PROFILE_r04.json "method"):
- Only the "XLA Ops" line of the TPU device plane carries real op cost.
- `*-start`/`*-done` pairs are ASYNC in-flight markers: a `-start` event's
  duration is time-until-done, NOT occupancy — they are reported
  separately and excluded from the sync total.
- The tunnel adds ~25 ms per blocked dispatch on the HOST side; device
  plane times are unaffected.

Run:  python tools/profile_trace.py [scene] [top_n]
Writes the raw trace under /tmp/potato_trace/ for manual inspection.
"""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def parse_xplane(trace_dir):
    """Aggregate (name -> total_ps, count) over the TPU 'XLA Ops' line."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    # newest capture wins: jax.profiler.trace writes a fresh timestamped
    # subdir per run, and a reused trace_dir keeps the old ones around
    pbs = [os.path.join(root, f)
           for root, _, files in os.walk(trace_dir)
           for f in files if f.endswith(".xplane.pb")]
    if not pbs:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    pb = max(pbs, key=os.path.getmtime)
    space = xplane_pb2.XSpace()
    with open(pb, "rb") as f:
        space.ParseFromString(f.read())

    sync = defaultdict(lambda: [0, 0])    # name -> [total_ps, count]
    async_ = defaultdict(lambda: [0, 0])
    line_totals = {}
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            total = 0
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                total += ev.duration_ps
                if line.name == "XLA Ops":
                    bucket = async_ if (name.endswith("-start")
                                        or name.endswith("-done")) else sync
                    b = bucket[name]
                    b[0] += ev.duration_ps
                    b[1] += 1
            line_totals[f"{plane.name} :: {line.name}"] = \
                line_totals.get(f"{plane.name} :: {line.name}", 0) + total
    return sync, async_, line_totals


def classify(name):
    """Rough bucket for a fused-op name (for the grouped summary)."""
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n:
        return "pallas"
    if "sort" in n:
        return "sort"
    if "gather" in n or "dynamic-slice" in n:
        return "gather"
    if "while" in n:
        return "while-overhead"
    if "dot" in n or "convolution" in n:
        return "dot"
    if "copy" in n or "bitcast" in n or "transpose" in n:
        return "layout"
    return "fusion"


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    import jax
    import jax.numpy as jnp
    import numpy as np

    from potato_tpu.cache import enable_persistent_cache
    from potato_tpu.render.renderer import compile_frame
    from potato_tpu.scene import examples

    enable_persistent_cache()
    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    scene = examples.SCENES[scene_name]().build(accel="flash")
    frame_fn, starts = compile_frame(scene, 800, 600, spp=4, max_bounce=8)

    BATCH = 4

    @jax.jit
    def batch_fn(tables, camera, seeds, starts):
        def one(seed):
            return jnp.sum(frame_fn(tables, camera, seed, starts).segments)
        return jnp.sum(jax.lax.map(one, seeds))

    seeds = jnp.arange(1, 1 + BATCH, dtype=jnp.uint32)
    t0 = time.time()
    int(np.asarray(batch_fn(scene.tables, scene.camera, seeds, starts)))
    log(f"warmup: {time.time() - t0:.1f}s")

    trace_dir = "/tmp/potato_trace"
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        segs = int(np.asarray(batch_fn(scene.tables, scene.camera, seeds,
                                       starts)))
        wall = time.perf_counter() - t0
    log(f"traced dispatch: {wall * 1e3:.1f} ms wall, {segs} segments, "
        f"{segs / wall / 1e6:.1f}M rays/s")

    sync, async_, line_totals = parse_xplane(trace_dir)
    per_frame = 1.0 / BATCH

    total_sync = sum(v[0] for v in sync.values())
    print(f"\n== line totals (ms, whole {BATCH}-frame dispatch) ==")
    for k, v in sorted(line_totals.items(), key=lambda kv: -kv[1]):
        print(f"  {v / 1e9:9.2f}  {k}")

    print(f"\n== top {top_n} sync ops (ms per frame; total "
          f"{total_sync / 1e9 * per_frame:.1f} ms/frame) ==")
    rows = sorted(sync.items(), key=lambda kv: -kv[1][0])[:top_n]
    for name, (ps, cnt) in rows:
        print(f"  {ps / 1e9 * per_frame:8.3f}  x{cnt // BATCH:<5} "
              f"[{classify(name):14}] {name[:110]}")

    groups = defaultdict(float)
    for name, (ps, _) in sync.items():
        groups[classify(name)] += ps / 1e9 * per_frame
    print("\n== grouped (ms per frame) ==")
    for k, v in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {v:8.2f}  {k}")

    if async_:
        tot = sum(v[0] for v in async_.values())
        print(f"\n== async in-flight markers (NOT cost): "
              f"{tot / 1e9 * per_frame:.1f} ms/frame across "
              f"{len(async_)} names ==")
        for name, (ps, cnt) in sorted(async_.items(),
                                      key=lambda kv: -kv[1][0])[:10]:
            print(f"  {ps / 1e9 * per_frame:8.3f}  x{cnt // BATCH:<5} "
                  f"{name[:110]}")


if __name__ == "__main__":
    main()
