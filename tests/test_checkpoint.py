"""Running-image checkpoint/resume for long renders (SURVEY.md §5).

The reference has no checkpointing at all — a crashed render loses
everything (tiles are completed-or-lost, src/main.rs:100-122). Here a
render interrupted after any chunk resumes from the checkpoint file and,
because every ray's randomness is a pure function of (seed, ray id),
finishes with an image bit-identical to an uninterrupted render.
"""

import numpy as np

from potato_tpu.render.renderer import render
from potato_tpu.scene import examples

import pytest

# sub-second unit tier: the pre-commit gate (tools/cpupytest -m fast)
pytestmark = pytest.mark.fast


def _truncate_checkpoint(path, keep):
    """Simulate a crash: rewrite the checkpoint as if only `keep` chunks
    had been saved when the process died."""
    ckpt = dict(np.load(path))
    ckpt["chunks_done"] = keep
    for k in ("color", "aov_normal", "aov_hit", "segments"):
        ckpt[k] = ckpt[k][:keep]
    with open(path, "wb") as f:
        np.savez(f, **ckpt)


def test_checkpoint_resume_bit_identical(tmp_path):
    scene = examples.three_balls().build(accel="brute")
    kw = dict(width=16, height=12, spp=2, max_bounce=3, seed=11,
              chunk_size=96)  # 384 rays -> 4 chunks
    straight = render(scene, **kw)

    path = str(tmp_path / "render.ckpt.npz")
    render(scene, **kw, checkpoint_path=path)
    _truncate_checkpoint(path, keep=2)           # "crash" after chunk 2
    resumed = render(scene, **kw, checkpoint_path=path)

    np.testing.assert_array_equal(resumed.color, straight.color)
    np.testing.assert_array_equal(resumed.normal, straight.normal)
    np.testing.assert_array_equal(resumed.coverage, straight.coverage)
    assert resumed.segments == straight.segments


def test_checkpoint_signature_mismatch_restarts(tmp_path):
    """A checkpoint from different render arguments must be ignored, not
    silently merged into the wrong frame."""
    scene = examples.three_balls().build(accel="brute")
    path = str(tmp_path / "render.ckpt.npz")
    render(scene, width=16, height=12, spp=2, max_bounce=3, seed=11,
           chunk_size=96, checkpoint_path=path)
    out = render(scene, width=16, height=12, spp=2, max_bounce=3, seed=12,
                 chunk_size=96, checkpoint_path=path)
    want = render(scene, width=16, height=12, spp=2, max_bounce=3, seed=12,
                  chunk_size=96)
    np.testing.assert_array_equal(out.color, want.color)
