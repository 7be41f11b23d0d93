"""Host-side asset IO: TGA codec and OBJ mesh loading.

Cold-path analogue of the reference's src/image.rs (TGA) and src/mesh.rs
(OBJ). Arrays produced here are numpy; the scene compiler moves them to
device. A native C++ fast path (potato_tpu.io.native) accelerates large
assets and is used automatically when the shared library is built.
"""
