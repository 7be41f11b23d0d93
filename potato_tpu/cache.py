"""Persistent XLA compile cache, pinned inside the repository.

The reference pays its build cost once per process (Bvh::new on the main
thread, src/main.rs:21 -> bvh.rs:70); the TPU analogue of "build cost" is
XLA compilation of the frame program, which on remote-attached chips runs
a chipless AOT compile pass on the host (~70 s cold for the bunny frame).

jax's compilation cache makes every later process reuse the serialized
executable (~12 s warmup), but the default /tmp location dies with the
machine image. Keeping the cache *inside the repo* (committed) makes the
first run on a fresh machine warm too.

Call `enable_persistent_cache()` before any compile; bench.py, cli.py and
__graft_entry__ all do.
"""

from __future__ import annotations

import os
from pathlib import Path

CACHE_DIR = Path(__file__).resolve().parent.parent / ".jax_cache"


def enable_persistent_cache(path: str | os.PathLike | None = None) -> str:
    """Point jax's compilation cache at a repo-local persistent directory.

    Respects an explicit `path` argument, then $POTATO_JAX_CACHE, then the
    in-repo default. Safe to call multiple times.
    """
    import jax

    target = str(path or os.environ.get("POTATO_JAX_CACHE") or CACHE_DIR)
    os.makedirs(target, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", target)
    # cache every executable, however fast it compiled: the driver's fresh
    # environment pays the full remote-compile latency even for "cheap"
    # programs (default threshold is 1 s of compile time)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return target
