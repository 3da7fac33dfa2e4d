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


# ------------------------------------------------------------------
# Production-pipeline sharding: batch-axis SPMD with padding.
#
# Every stage device program (perception chunk programs, step2
# affinity/SVT, step4 viterbi/DLT/refine) is batched along one leading
# axis whose elements are independent. Sharding that axis over the whole
# mesh and replicating the weights turns the SAME jitted program into an
# SPMD program — XLA partitions the batch and inserts collectives only
# where an output needs regrouping. The batch is padded up to a multiple
# of the device count (XLA requires even sharding); callers slice the
# original length back off the (host-fetched) result.


def batch_spec(mesh: Mesh, axis: int = 0) -> P:
    """PartitionSpec sharding array dim ``axis`` over ALL mesh axes."""
    return P(*([None] * axis + [tuple(mesh.axis_names)]))


def pad_to_multiple(x: np.ndarray, m: int, axis: int = 0):
    """Pad ``axis`` with edge copies up to a multiple of ``m``. Edge
    padding (not zeros) keeps padded lanes numerically tame in solvers;
    callers drop them regardless."""
    n = x.shape[axis]
    rem = (-n) % m
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(x, pad, mode="edge"), n


def put_batch_sharded(x, mesh: Optional[Mesh], axis: int = 0):
    """Pad + place ``x`` with dim ``axis`` sharded over the mesh.

    Returns ``(array, orig_len)``. With ``mesh=None`` this is a no-op
    pass-through (single-device path)."""
    x = np.asarray(x)
    if mesh is None:
        return x, x.shape[axis]
    x, n = pad_to_multiple(x, mesh.size, axis)
    arr = jax.device_put(x, NamedSharding(mesh, batch_spec(mesh, axis)))
    return arr, n


def put_replicated(tree, mesh: Optional[Mesh]):
    """Replicate a pytree (weights, camera params) over the mesh."""
    if mesh is None:
        return tree
    return jax.device_put(tree, NamedSharding(mesh, P()))
