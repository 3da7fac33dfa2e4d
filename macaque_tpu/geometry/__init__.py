"""Batched multi-view geometry: DLT triangulation, RANSAC, reprojection
error, constrained 3D refinement — all statically shaped, masked JAX.

Replaces the reference's numba DLT (``triangulate_simple``,
aniposelib/cameras.py:20-32), the pinv DLT
(``multicam_toolbox.triangulatePoints``, mct:433-486), the exhaustive
camera-subset RANSAC (cameras.py:639-724), and the scipy sparse TRF
``optim_points`` (cameras.py:1116-1190).
"""

from macaque_tpu.geometry.triangulate import (
    triangulate_dlt,
    triangulate_dlt_pinv,
    reprojection_error,
    reprojection_error_mean,
)
from macaque_tpu.geometry.ransac import triangulate_ransac
from macaque_tpu.geometry.refine3d import refine_points_3d, RefineConfig

__all__ = [
    "triangulate_dlt",
    "triangulate_dlt_pinv",
    "reprojection_error",
    "reprojection_error_mean",
    "triangulate_ransac",
    "refine_points_3d",
    "RefineConfig",
]
