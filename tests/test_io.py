"""TGA codec round-trip and OBJ loader tests (reference src/image.rs:42-138,
src/mesh.rs:39-183; bunny.obj facts from SURVEY.md §0)."""

import os

import numpy as np
import pytest

from potato_tpu.io import obj, tga

# sub-second unit tier: the pre-commit gate (tools/cpupytest -m fast)
pytestmark = pytest.mark.fast

ASSETS = "/root/reference/assets"

OBJ_TEXT = """
# comment line that must be skipped
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 0.0 1.0 0.0
vn 0.0 0.0 1.0
vt 0.5 0.5
junk line
f 1//1 2//1 3//1
f 1/1/1 2/1/1 3/1/1
"""


def test_tga_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(13, 17, 4), dtype=np.uint8)
    path = str(tmp_path / "t.tga")
    tga.save(img, path)
    back = tga.load(path)
    np.testing.assert_array_equal(back, img)


def test_tga_rgb_gets_opaque_alpha(tmp_path):
    img = np.zeros((4, 4, 3), np.uint8)
    path = str(tmp_path / "t.tga")
    tga.save(img, path)
    back = tga.load(path)
    assert back.shape == (4, 4, 4)
    np.testing.assert_array_equal(back[..., 3], 255)


def test_tga_rejects_compressed():
    # datatype 10 = RLE true-color: reference rejects it (src/image.rs:81-88)
    import struct
    hdr = struct.pack("<BBB5sHHHHBB", 0, 0, 10, b"\0" * 5, 0, 0, 2, 2, 24, 0)
    with pytest.raises(tga.TgaError):
        tga.load(hdr + b"\0" * 12)


def test_tga_vertical_flip_bit(tmp_path):
    # hand-build a 1x2 24bpp file with flip bit set (bit 5 of descriptor)
    import struct
    hdr = struct.pack("<BBB5sHHHHBB", 0, 0, 2, b"\0" * 5, 0, 0, 1, 2, 24, 1 << 5)
    # rows in file order: row0 = red (BGR: 0,0,255), row1 = blue (255,0,0)
    body = bytes([0, 0, 255, 255, 0, 0])
    img = tga.load(hdr + body)
    # flip bit set -> reference flips rows on load (src/image.rs:95-99)
    np.testing.assert_array_equal(img[0, 0], [0, 0, 255, 255])  # blue first
    np.testing.assert_array_equal(img[1, 0], [255, 0, 0, 255])


def test_obj_parse_and_dedup():
    mesh = obj.load(OBJ_TEXT)
    # triples (v,-1,n) and (v,t,n) differ -> no cross-face dedup here
    assert mesh.num_triangles == 2
    assert mesh.num_vertices == 6
    np.testing.assert_allclose(mesh.positions[:3], [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    np.testing.assert_allclose(mesh.normals[0], [0, 0, 1])
    np.testing.assert_allclose(mesh.uvs[0], [0, 0])  # v//vn -> uv defaults 0
    np.testing.assert_allclose(mesh.uvs[3], [0.5, 0.5])


def test_obj_rejects_quads():
    text = "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3 4\n"
    with pytest.raises(obj.ObjError):
        obj.load(text)


@pytest.mark.skipif(not os.path.exists(f"{ASSETS}/bunny.obj"), reason="no assets")
def test_obj_bunny_counts():
    """SURVEY.md §0: bunny.obj has 4,968 faces in v//vn format, 2,503 vn."""
    mesh = obj.load(f"{ASSETS}/bunny.obj")
    assert mesh.num_triangles == 4968
    assert mesh.indices.min() == 0
    assert mesh.indices.max() == mesh.num_vertices - 1
    # v//vn means real normals, zero uvs
    assert np.abs(mesh.normals).max() > 0
    np.testing.assert_array_equal(mesh.uvs, 0)


@pytest.mark.skipif(not os.path.exists(f"{ASSETS}/earthmap.tga"), reason="no assets")
def test_tga_earthmap_loads():
    img = tga.load(f"{ASSETS}/earthmap.tga")
    assert img.ndim == 3 and img.shape[2] == 4
    assert img.shape[0] > 100 and img.shape[1] > 100
