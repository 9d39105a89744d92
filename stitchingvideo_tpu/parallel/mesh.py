"""Device-mesh construction for multi-chip scaling.

The reference's parallelism is OpenMP threads + one shared-memory producer
process per camera on a single Windows host (SURVEY §2.3). The TPU-native
scaling axes are:

  * canvas — panorama columns sharded across chips: the composite hot loop is
    an independent gather per output pixel (the LUT makes every pixel local),
    so strips need no halo exchange and no collectives.
  * camera — registration fan-out: per-camera feature extraction/warping
    shards across chips; pairwise statistics (gain N/I matrices) reduce with
    psum over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(canvas: Optional[int] = None, camera: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with ('camera', 'canvas') axes. Defaults: all devices on canvas."""
    devs = list(devices if devices is not None else jax.devices())
    if canvas is None:
        canvas = len(devs) // camera
    if camera * canvas > len(devs):
        raise ValueError(f"need {camera * canvas} devices, have {len(devs)}")
    arr = np.array(devs[:camera * canvas]).reshape(camera, canvas)
    return Mesh(arr, ("camera", "canvas"))


def canvas_sharding(mesh: Mesh, ndim: int, col_axis: int = 1) -> NamedSharding:
    """Shard panorama columns (axis `col_axis`) over the canvas mesh axis."""
    spec = [None] * ndim
    spec[col_axis] = "canvas"
    return NamedSharding(mesh, P(*spec))


def camera_sharding(mesh: Mesh, ndim: int, cam_axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[cam_axis] = "camera"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
