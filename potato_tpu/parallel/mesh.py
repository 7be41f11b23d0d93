"""Device mesh construction for ray-parallel rendering."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

RAY_AXIS = "rays"


def make_ray_mesh(num_devices: Optional[int] = None,
                  devices: Optional[Sequence] = None) -> Mesh:
    """1D mesh over the ray axis.

    Rays are embarrassingly parallel (SURVEY.md §5: no ring/Ulysses
    analogue needed), so a single data-parallel axis is the whole story;
    multi-host pods simply contribute more devices to the same axis, with
    XLA routing the image all-gather over ICI/DCN.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))
