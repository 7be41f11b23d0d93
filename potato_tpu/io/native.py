"""ctypes bindings to the native C++ host runtime (native/potato_native.cpp).

Fast paths for OBJ parsing, TGA decode/encode, and Morton argsort. Loading
is lazy and optional: if the shared library hasn't been built
(`make -C native`), callers fall back to the pure-Python implementations —
which remain the behavioral oracles in tests either way.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir,
                         "native", "libpotato_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


class _ObjResult(ctypes.Structure):
    _fields_ = [
        ("positions", ctypes.POINTER(ctypes.c_float)),
        ("normals", ctypes.POINTER(ctypes.c_float)),
        ("uvs", ctypes.POINTER(ctypes.c_float)),
        ("indices", ctypes.POINTER(ctypes.c_int32)),
        ("num_vertices", ctypes.c_int64),
        ("num_triangles", ctypes.c_int64),
        ("error", ctypes.c_int32),
    ]


def _build_if_possible() -> None:
    makefile_dir = os.path.dirname(os.path.abspath(_LIB_PATH))
    try:
        subprocess.run(["make", "-C", makefile_dir], check=True,
                       capture_output=True, timeout=120)
    except Exception:  # noqa: BLE001 - any failure means "no native lib"
        pass


def get_lib(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building on first use if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path) and auto_build:
        _build_if_possible()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.obj_parse.restype = ctypes.POINTER(_ObjResult)
    lib.obj_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.obj_free.argtypes = [ctypes.POINTER(_ObjResult)]
    lib.tga_dims.restype = ctypes.c_int32
    lib.tga_dims.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                             ctypes.POINTER(ctypes.c_int32),
                             ctypes.POINTER(ctypes.c_int32)]
    lib.tga_decode.restype = ctypes.c_int32
    lib.tga_decode.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                               ctypes.c_void_p]
    lib.tga_encode.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                               ctypes.c_int32, ctypes.c_void_p]
    lib.morton_argsort.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_void_p]
    _lib = lib
    return _lib


def obj_parse(text: str):
    """Native OBJ parse -> (positions, normals, uvs, indices) or None.

    Raises ValueError on non-triangular faces (same contract as the Python
    loader / reference src/mesh.rs:170-171).
    """
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode()
    res = lib.obj_parse(raw, len(raw))
    try:
        r = res.contents
        if r.error == 1:
            raise ValueError("Non-triangular faces are not supported")
        nv, nt = r.num_vertices, r.num_triangles
        positions = np.ctypeslib.as_array(r.positions, (nv, 3)).copy() if nv else np.zeros((0, 3), np.float32)
        normals = np.ctypeslib.as_array(r.normals, (nv, 3)).copy() if nv else np.zeros((0, 3), np.float32)
        uvs = np.ctypeslib.as_array(r.uvs, (nv, 2)).copy() if nv else np.zeros((0, 2), np.float32)
        indices = np.ctypeslib.as_array(r.indices, (nt, 3)).copy() if nt else np.zeros((0, 3), np.int32)
        return positions, normals, uvs, indices
    finally:
        lib.obj_free(res)


def tga_decode(data: bytes) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    if lib.tga_dims(data, len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None  # unsupported header: let the Python path raise its error
    out = np.empty((h.value, w.value, 4), np.uint8)
    rc = lib.tga_decode(data, len(data), out.ctypes.data)
    return out if rc == 0 else None


def tga_encode(rgba: np.ndarray) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    h, w = rgba.shape[:2]
    rgba = np.ascontiguousarray(rgba)
    out = np.empty(18 + w * h * 4, np.uint8)
    lib.tga_encode(rgba.ctypes.data, w, h, out.ctypes.data)
    return out.tobytes()


def morton_argsort(points: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    order = np.empty(pts.shape[0], np.uint32)
    lib.morton_argsort(pts.ctypes.data, pts.shape[0], order.ctypes.data)
    return order
