"""Device mesh and sharding helpers.

The reference's only scale-out story is "run one process per GPU"
(info_replication.md:14) with NCCL named solely in training configs
(SURVEY.md §2.3). The TPU-native equivalent: one ``jax.sharding.Mesh``
with a ``cam`` axis (camera streams are data-parallel) and a ``frame``
axis (video time is embarrassingly parallel outside tracker state), with
weights replicated and XLA inserting collectives over ICI — e.g. the
cross-view stage's implicit all-gather of per-camera detections.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("cam", "frame"),
    cam_axis_size: Optional[int] = None,
) -> Mesh:
    """Build a 2D (cam, frame) mesh over the available devices.

    ``cam_axis_size`` fixes the camera axis (e.g. 4 or 8 streams); the frame
    axis absorbs the remaining devices. With fewer devices than cameras the
    cam axis shrinks to the device count and camera streams round-robin.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if cam_axis_size is None:
        cam_axis_size = min(n, 8)
        while n % cam_axis_size != 0:
            cam_axis_size -= 1
    frame_axis = n // cam_axis_size
    arr = np.asarray(devices).reshape(cam_axis_size, frame_axis)
    return Mesh(arr, axis_names=tuple(axis_names))


def shard_over(mesh: Mesh, *axis_names: Optional[str]) -> NamedSharding:
    """NamedSharding placing array dims on the given mesh axes (None =
    replicated dim). E.g. ``shard_over(mesh, 'cam', 'frame')`` shards a
    (n_cam, n_frame, ...) batch."""
    return NamedSharding(mesh, P(*axis_names))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def device_put_sharded_batch(x, mesh: Mesh, *axis_names):
    return jax.device_put(x, shard_over(mesh, *axis_names))
