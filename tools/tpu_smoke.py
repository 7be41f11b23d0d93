"""Run the TPU Mosaic smoke gate on the real chip.

`pytest` deliberately re-execs onto a hermetic CPU backend whenever the
TPU plugin env is present (tests/conftest.py), so tests/test_tpu_smoke.py
always SKIPS under the normal suite. This driver runs the same test
functions in a plain-python process where the TPU plugin is live —
the verify-skill drive recipe after any kernel change.

Run:  python tools/tpu_smoke.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    assert jax.default_backend() == "tpu", (
        f"needs the real TPU, got {jax.default_backend()}")
    from potato_tpu.cache import enable_persistent_cache

    enable_persistent_cache()

    import test_tpu_smoke as t

    scene = t.small_scene.__wrapped__()
    rays = t.rays.__wrapped__()
    for name in ("test_flash_compiles_on_tpu",
                 "test_flash_matches_brute_on_tpu",
                 "test_flash_gradient_on_tpu"):
        fn = getattr(t, name)
        args = [scene] + ([rays] if fn.__code__.co_argcount > 1 else [])
        fn(*args)
        print(f"{name}: ok", flush=True)
    print("TPU smoke gate: all green")


if __name__ == "__main__":
    main()
