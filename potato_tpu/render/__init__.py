"""Render layer: camera ray generation, wavefront integrator, driver.

TPU-native replacement of the reference's L4 integrator + L6 driver
(src/render.rs, src/main.rs): the recursive per-pixel megaloop becomes a
fixed-depth wavefront loop over SoA ray batches with a throughput
accumulator; the OS-thread tile queue becomes static sharding of the
(pixel x sample) ray dimension.
"""
