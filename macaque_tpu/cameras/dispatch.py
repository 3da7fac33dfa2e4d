"""Model-generic camera operations.

Every camera model in this package (omnidir/Mei, pinhole, equidistant
fisheye) is a NamedTuple pytree with ``pmat`` plus a pair of pure
functions ``<model>_project`` / ``<model>_undistort``. The geometry
solvers (DLT, RANSAC, LM refinement, bundle adjustment) are written
against that interface; these two dispatchers pick the right pair so
solvers stay model-agnostic — the reference gets the same genericity
from Camera-subclass virtual methods (aniposelib cameras.py:173-557).
"""

from __future__ import annotations

import jax.numpy as jnp

from macaque_tpu.cameras.fisheye import (
    FisheyeCamera,
    fisheye_project,
    fisheye_undistort,
)
from macaque_tpu.cameras.omnidir import (
    OmnidirCamera,
    omnidir_project,
    omnidir_undistort,
)
from macaque_tpu.cameras.pinhole import (
    PinholeCamera,
    pinhole_project,
    pinhole_undistort,
)

_PROJECT = {
    OmnidirCamera: omnidir_project,
    PinholeCamera: pinhole_project,
    FisheyeCamera: fisheye_project,
}
_UNDISTORT = {
    OmnidirCamera: omnidir_undistort,
    PinholeCamera: pinhole_undistort,
    FisheyeCamera: fisheye_undistort,
}


def project_fn(cam):
    """The ``project(cam, world_points)`` function for this camera type."""
    try:
        return _PROJECT[type(cam)]
    except KeyError:
        raise TypeError(f"unknown camera model: {type(cam)}") from None


def undistort_fn(cam):
    """The ``undistort(cam, pixels)`` function for this camera type."""
    try:
        return _UNDISTORT[type(cam)]
    except KeyError:
        raise TypeError(f"unknown camera model: {type(cam)}") from None


def project_points(cam, points: jnp.ndarray) -> jnp.ndarray:
    """World points ``(..., N, 3)`` -> pixels ``(..., N, 2)``."""
    return project_fn(cam)(cam, points)


def undistort_points(cam, pixels: jnp.ndarray) -> jnp.ndarray:
    """Pixels ``(..., N, 2)`` -> ideal z=1-plane coords ``(..., N, 2)``."""
    return undistort_fn(cam)(cam, pixels)
