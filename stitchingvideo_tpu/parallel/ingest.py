"""Multi-host ingest: per-process camera captures -> one global device array.

The reference's transport is single-host shared memory (one GetFromRtsp.exe
per camera feeding named mappings, SURVEY §1 L2). On a multi-host TPU slice
the analogous topology is: each HOST runs the decode producers for the
cameras physically attached to it (video/producer.py + ShmRing stay
unchanged — they are per-host), and the per-host frame batches assemble into
ONE camera-sharded global jax.Array; XLA moves bytes over ICI/DCN only where
a consumer needs a remote shard.

    mesh = make_mesh(canvas=..., camera=n_hosts * cams_per_host)
    local = np.stack(my_sources.read())           # this host's cameras
    frames = global_camera_batch(mesh, local)     # [N_total, H, W, 3] global

Downstream stages that are camera-parallel (feature extraction, seam warps,
gain statistics — parallel/compose.py) then consume `frames` with zero
manual communication; the gain-stat psums ride ICI (SURVEY §2.3).

Single-process (tests, single host) degenerates to a plain shard: every
"host" is this process, so the helper is exercised end-to-end on the
8-virtual-device CPU mesh.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def global_camera_batch(mesh: Mesh, local_frames: np.ndarray,
                        axis: str = "camera") -> jax.Array:
    """Assemble the global camera batch from this process's local cameras.

    local_frames: [n_local, H, W, C] — the cameras THIS host captured, in
    global camera order restricted to this host (jax's process-local-data
    contract). Returns a global [N_total, H, W, C] array sharded over `axis`.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_frames)


def local_camera_slice(mesh: Mesh, n_cameras: int,
                       axis: str = "camera") -> slice:
    """Which global camera indices this process must capture/publish.

    The camera axis is laid out across processes in mesh-device order; this
    returns the contiguous global slice assigned to the current process so
    each host knows which RTSP URLs / rings to open.
    """
    axis_size = mesh.shape[axis]
    if n_cameras % axis_size != 0:
        raise ValueError(f"{n_cameras} cameras not divisible by "
                         f"{axis}={axis_size}")
    per_shard = n_cameras // axis_size
    ax = mesh.axis_names.index(axis)
    coords = sorted({idx[ax] for idx, d in np.ndenumerate(mesh.devices)
                     if d.process_index == jax.process_index()})
    if not coords:
        return slice(0, 0)
    if coords != list(range(coords[0], coords[-1] + 1)):
        raise ValueError("this process's camera-axis shards are not "
                         "contiguous; use a process-major mesh layout")
    return slice(coords[0] * per_shard, (coords[-1] + 1) * per_shard)
