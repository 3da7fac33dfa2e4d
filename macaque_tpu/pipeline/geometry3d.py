"""Batched pose-triangulation helpers shared by steps 2/3 and tools.

Replaces the reference's per-call ``calc_3dpose`` / ``reproject`` chain
(step2_crossviewmatching.py:436-489, step3:254-272), which re-reads camera
parameters per invocation and loops keypoints in Python, with jitted
device functions batched over an arbitrary leading axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from macaque_tpu.cameras.omnidir import (
    OmnidirCamera,
    omnidir_project,
    omnidir_undistort,
)
from macaque_tpu.geometry.triangulate import triangulate_dlt_pinv

THR_KP = 0.1  # reference step2:21


@jax.jit
def triangulate_poses(cam: OmnidirCamera, kp2d: jnp.ndarray) -> jnp.ndarray:
    """kp2d: (..., C, J, 3) raw pixels [x, y, score] -> (..., J, 3) 3D.

    Semantics of reference ``calc_3dpose`` (step2:436-461): undistort, mask
    NaN or score < 0.1, pinv-DLT per joint, NaN when <2 cameras.
    """
    und = omnidir_undistort(cam, kp2d[..., :2])  # cams broadcast over (...)
    valid = (~jnp.isnan(kp2d[..., 0])) & (kp2d[..., 2] >= THR_KP)
    # axes: (..., C, J, *) -> per joint (..., J, C, *)
    undJ = jnp.swapaxes(jnp.nan_to_num(und), -3, -2)
    validJ = jnp.swapaxes(valid, -2, -1)
    return triangulate_dlt_pinv(undJ, cam.pmat, validJ)


@jax.jit
def reproject_poses(cam: OmnidirCamera, p3d: jnp.ndarray) -> jnp.ndarray:
    """p3d: (..., J, 3) -> (..., C, J, 2) pixel reprojections (reference
    ``reproject``, step2:465-489)."""
    batch = p3d.shape[:-2]
    J = p3d.shape[-2]
    flat = p3d.reshape(-1, J, 3)

    def per_sample(p):
        return omnidir_project(cam, p)  # (C, J, 2)

    out = jax.vmap(per_sample)(flat)
    return out.reshape(*batch, out.shape[1], J, 2)


@jax.jit
def reprojection_rmse(cam: OmnidirCamera, p3d: jnp.ndarray,
                      kp2d: jnp.ndarray, use_cam: jnp.ndarray) -> jnp.ndarray:
    """Per-sample RMSE of reprojection vs observed keypoints over selected
    cameras and confident joints (reference get_best_comb scoring,
    step2:621-642: residuals stacked over cams/joints, sqrt(mean(d^2))
    over both x and y components).

    p3d (..., J, 3); kp2d (..., C, J, 3); use_cam (..., C) bool.
    """
    proj = reproject_poses(cam, p3d)
    valid = (kp2d[..., 2] > THR_KP) & use_cam[..., None]
    diff = jnp.where(valid[..., None], kp2d[..., :2] - proj, 0.0)
    diff = jnp.nan_to_num(diff)
    n = jnp.sum(valid, axis=(-2, -1)) * 2
    ss = jnp.sum(diff ** 2, axis=(-3, -2, -1))
    return jnp.sqrt(ss / jnp.maximum(n, 1))
