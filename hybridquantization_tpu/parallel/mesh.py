"""Device-mesh construction for the quantization engine.

The workload's two parallel axes (SURVEY.md section 2f):
  - "data":  independent images of a batch (DP; BASELINE configs 4-5)
  - "pixel": row-sharding of each image across chips (the CP/SP-analog —
    the separable convolution needs a halo exchange across this axis)

The reference had no distributed backend at all (single JVM + one OpenCL
queue); collectives here ride ICI via psum/ppermute inside shard_map.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PIXEL_AXIS = "pixel"


def make_mesh(n_data: int = 1, n_pixel: int | None = None, devices=None) -> Mesh:
    """(data, pixel) mesh over the available devices.

    If n_pixel is None, uses all remaining devices for the pixel axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_pixel is None:
        if len(devices) % n_data:
            raise ValueError(f"{len(devices)} devices not divisible by n_data={n_data}")
        n_pixel = len(devices) // n_data
    need = n_data * n_pixel
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_pixel} needs {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_data, n_pixel)
    return Mesh(grid, (DATA_AXIS, PIXEL_AXIS))


def batch_image_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, 3) images: batch over data, rows over pixel."""
    return NamedSharding(mesh, P(DATA_AXIS, PIXEL_AXIS, None, None))


def batch_state_sharding(mesh: Mesh) -> NamedSharding:
    """Per-image annealing state: batch over data, replicated over pixel."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
