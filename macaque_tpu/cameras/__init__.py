"""Pure-JAX camera models: omnidirectional (Mei), pinhole, fisheye.

The reference pipeline delegates all camera math to OpenCV C++
(``cv2.omnidir.*``, ``cv2.fisheye.*``, ``cv2.Rodrigues`` — see
reference: src/utils/multicam_toolbox.py:393-431 and
src/third_party/aniposelib/cameras.py:487-516).  Here every model is a pure,
vmappable JAX function so projection / undistortion / triangulation stay on
the TPU and differentiate for bundle adjustment.
"""

from macaque_tpu.cameras.rotation import rodrigues, rodrigues_inv, rotate_points
from macaque_tpu.cameras.dispatch import (
    project_points,
    undistort_points,
)
from macaque_tpu.cameras.fisheye import (
    FisheyeCamera,
    fisheye_project,
    fisheye_undistort,
)
from macaque_tpu.cameras.omnidir import (
    OmnidirCamera,
    omnidir_project,
    omnidir_undistort,
    omnidir_unproject_ray,
)
from macaque_tpu.cameras.pinhole import (
    PinholeCamera,
    pinhole_project,
    pinhole_undistort,
)
from macaque_tpu.cameras.rig import CameraRig

__all__ = [
    "rodrigues",
    "rodrigues_inv",
    "rotate_points",
    "OmnidirCamera",
    "omnidir_project",
    "omnidir_undistort",
    "omnidir_unproject_ray",
    "PinholeCamera",
    "pinhole_project",
    "pinhole_undistort",
    "FisheyeCamera",
    "fisheye_project",
    "fisheye_undistort",
    "project_points",
    "undistort_points",
    "CameraRig",
]
