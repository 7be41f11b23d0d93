"""Native C++ host runtime: build + exact parity with the Python oracles."""

import numpy as np
import pytest

from potato_tpu.io import native, obj, tga

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native lib not built")

OBJ_TEXT = """
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 0.0 1.0 0.0
vn 0.0 0.0 1.0
vt 0.5 0.5
junk line
f 1//1 2//1 3//1
f 1/1/1 2/1/1 3/1/1
"""


def test_obj_native_matches_python():
    py = obj.load(OBJ_TEXT, use_native=False)
    p, n, u, i = native.obj_parse(OBJ_TEXT)
    np.testing.assert_allclose(p, py.positions)
    np.testing.assert_allclose(n, py.normals)
    np.testing.assert_allclose(u, py.uvs)
    np.testing.assert_array_equal(i, py.indices)


def test_obj_native_rejects_quads():
    with pytest.raises(ValueError):
        native.obj_parse("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3 4\n")


def test_obj_native_bunny_parity():
    import os
    path = "/root/reference/assets/bunny.obj"
    if not os.path.exists(path):
        pytest.skip("no assets")
    text = open(path).read()
    py = obj.load(text, use_native=False)
    p, n, u, i = native.obj_parse(text)
    np.testing.assert_array_equal(i, py.indices)
    np.testing.assert_allclose(p, py.positions, atol=1e-6)
    np.testing.assert_allclose(n, py.normals, atol=1e-6)


def test_tga_native_roundtrip_and_parity():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(11, 7, 4), dtype=np.uint8)
    enc = native.tga_encode(img)
    np.testing.assert_array_equal(tga.load(enc, use_native=False), img)
    np.testing.assert_array_equal(native.tga_decode(enc), img)


def test_tga_native_flip_bit():
    import struct
    hdr = struct.pack("<BBB5sHHHHBB", 0, 0, 2, b"\0" * 5, 0, 0, 1, 2, 24, 1 << 5)
    body = bytes([0, 0, 255, 255, 0, 0])
    np.testing.assert_array_equal(native.tga_decode(hdr + body),
                                  tga.load(hdr + body, use_native=False))


def test_morton_argsort_matches_numpy():
    from potato_tpu.scene.bvh import morton_codes
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (4097, 3)).astype(np.float32)
    got = native.morton_argsort(pts)
    codes = morton_codes(pts, pts.min(0), pts.max(0))
    want = np.argsort(codes, kind="stable")
    np.testing.assert_array_equal(got.astype(np.int64), want)
