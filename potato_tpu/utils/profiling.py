"""Profiling and metrics: phase timers, rays/s counters, device traces.

The observability layer the reference lacks (its entire apparatus is one
wall-clock println and a progress bar, src/main.rs:45,106; SURVEY.md §5).
Timers fence with jax.block_until_ready so measured intervals are real
device time, not dispatch time; `trace` wraps jax.profiler for TensorBoard
/ xprof captures.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


@dataclass
class PhaseTimer:
    """Accumulates wall time per named phase across repeated passes."""

    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, fence=None):
        """Time a phase; `fence` (a pytree of device arrays) is
        block_until_ready'd before the clock stops."""
        t0 = time.perf_counter()
        yield
        if fence is not None:
            jax.block_until_ready(fence)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total * 1e3:.1f} ms total, "
                         f"{total / n * 1e3:.2f} ms/call ({n} calls)")
        return "\n".join(lines)


@dataclass
class RenderMetrics:
    """Structured per-render metrics (rays/s, segments, utilization)."""

    wall_seconds: float
    segments: int
    num_rays: int
    max_bounce: int

    @property
    def rays_per_second(self) -> float:
        return self.segments / max(self.wall_seconds, 1e-12)

    @property
    def mean_path_length(self) -> float:
        return self.segments / max(self.num_rays, 1)

    @property
    def lane_utilization(self) -> float:
        """Fraction of wavefront lanes doing useful work: traced segments
        over (rays x max_bounce) lanes processed."""
        return self.segments / max(self.num_rays * self.max_bounce, 1)

    def json_line(self, **extra) -> str:
        d = dict(wall_seconds=round(self.wall_seconds, 4),
                 segments=self.segments,
                 rays_per_second=round(self.rays_per_second, 1),
                 mean_path_length=round(self.mean_path_length, 3),
                 lane_utilization=round(self.lane_utilization, 4))
        d.update(extra)
        return json.dumps(d)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler capture around a code region (view with TensorBoard)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_render(render_fn, *args, **kwargs):
    """Run render_fn twice (warmup + timed); returns (output, RenderMetrics)."""
    render_fn(*args, **kwargs)  # warmup/compile
    t0 = time.perf_counter()
    out = render_fn(*args, **kwargs)
    dt = time.perf_counter() - t0
    num_rays = out.color.shape[0] * out.color.shape[1] if out.color.ndim == 3 else len(out.color)
    return out, RenderMetrics(
        wall_seconds=dt, segments=int(out.segments),
        num_rays=num_rays, max_bounce=kwargs.get("max_bounce", 8))
