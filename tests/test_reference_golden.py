"""Anchor against the reference's own published golden image.

The reference ships exactly one rendered artifact: images/demo.png
(README.md:20) — the glass_bunny scene (example_scenes.rs:265-306: green
dielectric bunny, fuzzy metal ground, SkyGradient background) at 800x600.
Every other correctness test in this repo compares against our own scalar
oracle; a shared misreading of reference semantics (orientation, sky
mapping, material wiring) would pass all of them. This test compares a
low-res render of our glass_bunny against the reference's actual pixels.

Pixel equality is impossible (different RNG, different spp), so the
comparison is statistical: downsample both images to a coarse cell grid
and require high per-channel correlation of cell means, plus an explicit
vertical-orientation check (sky above the horizon, reflective ground
below). A flipped, transposed, or materially mis-wired render fails all
of these immediately.
"""

import os

import numpy as np
import pytest

GOLDEN = "/root/reference/images/demo.png"


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference golden absent")
def test_glass_bunny_matches_reference_demo_png():
    from PIL import Image

    from potato_tpu.render.renderer import render
    from potato_tpu.scene import examples

    w, h = 96, 72  # exact 4:3 like the 800x600 golden, tile-aligned
    # brute accel: this anchors scene/camera/material semantics, not the
    # kernel (kernel == brute is property-tested in tests/test_flash.py),
    # and dense XLA-CPU is much faster than interpret-mode Pallas here.
    scene = examples.glass_bunny().build(accel="brute")
    out = render(scene, w, h, spp=8, max_bounce=8, seed=3, with_aovs=False)
    # srgb() rows are bottom-origin (TGA convention, reference
    # src/image.rs:95-99); the PNG golden is top-origin — flip to compare
    ours = np.asarray(out.srgb())[::-1, :, :3].astype(np.float64)  # (h, w, 3)

    golden = np.asarray(
        Image.open(GOLDEN).convert("RGB").resize((w, h), Image.BILINEAR),
        dtype=np.float64)

    # --- cell-mean correlation per channel ---
    # Gate calibration (measured): the correct render scores ~0.82-0.86
    # per channel — the residual is a 1-2 px silhouette halo (sub-pixel
    # registration of the downsampled golden) plus a ~20/255 global
    # brightness offset (demo.png predates the scene constants we mirror,
    # or used different spp). A vertically flipped render scores ~0.15,
    # a transposed one similarly — so 0.75 cleanly separates structural
    # errors from render-version drift.
    cy, cx = 8, 8
    gh, gw = h // cy * cy, w // cx * cx

    def cells(img):
        return img[:gh, :gw].reshape(gh // cy, cy, gw // cx, cx, 3).mean((1, 3))

    a = cells(ours)
    b = cells(golden)
    for ch in range(3):
        x = a[..., ch].ravel()
        y = b[..., ch].ravel()
        r = np.corrcoef(x, y)[0, 1]
        assert r > 0.75, f"channel {ch}: cell-mean correlation {r:.3f}"

    # overall brightness in the same regime (catches gamma/scale errors)
    assert abs(ours.mean() - golden.mean()) < 25.0, (ours.mean(), golden.mean())

    # --- vertical orientation: the horizon line sits in the upper part of
    # the frame; above it the SkyGradient, below it the fuzzy-metal ground.
    # The golden's top row of cells is brighter than its bottom row; ours
    # must agree (a vertically flipped render inverts this).
    top_ours = a[0].mean()
    bot_ours = a[-1].mean()
    top_gold = b[0].mean()
    bot_gold = b[-1].mean()
    assert (top_gold > bot_gold) == (top_ours > bot_ours)

    # --- horizontal placement: the bunny silhouette (dark vs sky) is
    # left-of-center in the golden; require the darkest column region of
    # the upper half to match sides.
    def dark_col(img):
        upper = img[: img.shape[0] // 2].mean(axis=(0, 2))
        return float(np.argmin(upper)) / img.shape[1]

    assert abs(dark_col(a) - dark_col(b)) < 0.25
