"""Equidistant (Kannala-Brandt) fisheye camera model in pure JAX.

The reference's aniposelib supports fisheye rigs via ``cv2.fisheye``
(reference: src/third_party/aniposelib/cameras.py:339-421 FisheyeCamera;
selected by the anipose project config ``calibration.fisheye = true``,
src/third_party/anipose/calibrate.py:181). This module reimplements the
model from its math so fisheye rigs run on the TPU compute path like the
omnidir and pinhole models.

Projection of a camera-frame point ``Xc`` (cv2.fisheye.projectPoints):
  1. pinhole normalize                  ``x = Xc_xy / Xc_z``
  2. equidistant distortion             ``r = |x|``, ``theta = atan(r)``,
     ``theta_d = theta * (1 + k1 th^2 + k2 th^4 + k3 th^6 + k4 th^8)``
  3. radial rescale                     ``xd = x * theta_d / r``
  4. pixels via fx, fy, cx, cy (cv2.fisheye takes skew as a separate
     ``alpha`` argument which the reference never passes -> 0)

Undistortion inverts step 2 with a fixed-count Newton iteration (the same
scheme cv2.fisheye.undistortPoints uses), then converts ``theta`` back to
the z=1 plane with ``tan``. Static shapes, fixed iteration counts — jits
to one fused TPU kernel and differentiates for bundle adjustment.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from macaque_tpu.cameras.rotation import rodrigues

_NEWTON_ITERS = 10  # matches cv2.fisheye.undistortPoints' iteration budget


class FisheyeCamera(NamedTuple):
    """Batched equidistant-fisheye camera parameters (a JAX pytree).

    All fields may carry leading batch dims (e.g. ``(n_cam, ...)``).
    """

    K: jnp.ndarray     # (..., 3, 3) pinhole intrinsics (skew unused)
    D: jnp.ndarray     # (..., 4) distortion [k1, k2, k3, k4]
    rvec: jnp.ndarray  # (..., 3) world->camera rotation (Rodrigues)
    tvec: jnp.ndarray  # (..., 3) world->camera translation

    @property
    def R(self) -> jnp.ndarray:
        return rodrigues(self.rvec)

    @property
    def pmat(self) -> jnp.ndarray:
        """Extrinsics matrix ``[R | t]`` of shape (..., 3, 4)."""
        return jnp.concatenate([self.R, self.tvec[..., :, None]], axis=-1)


def _theta_d(theta: jnp.ndarray, D: jnp.ndarray) -> jnp.ndarray:
    k1, k2, k3, k4 = D[..., 0], D[..., 1], D[..., 2], D[..., 3]
    t2 = theta * theta
    return theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))


def fisheye_distort(
    x: jnp.ndarray, y: jnp.ndarray, D: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Equidistant-distort z=1-plane coords (cv2.fisheye step 2+3).

    At ``r <= 1e-8`` cv2 uses scale 1 (theta ~= r there)."""
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan(r)
    scale = jnp.where(r > 1e-8, _theta_d(theta, D) / jnp.where(
        r > 1e-8, r, 1.0), 1.0)
    return x * scale, y * scale


def fisheye_project(cam: FisheyeCamera, points: jnp.ndarray) -> jnp.ndarray:
    """Project world points ``(..., N, 3)`` to pixel coords ``(..., N, 2)``.

    Replaces ``cv2.fisheye.projectPoints`` as called by the reference's
    FisheyeCamera.project (cameras.py:384-390; alpha defaulted to 0).
    Batched over cameras and points; differentiable for bundle adjustment.
    """
    R = cam.R
    Xc = jnp.einsum("...ij,...nj->...ni", R, points,
                    precision=jax.lax.Precision.HIGHEST) + cam.tvec[..., None, :]
    x = Xc[..., 0] / Xc[..., 2]
    y = Xc[..., 1] / Xc[..., 2]
    xd, yd = fisheye_distort(x, y, cam.D[..., None, :])
    fx = cam.K[..., None, 0, 0]
    fy = cam.K[..., None, 1, 1]
    cx = cam.K[..., None, 0, 2]
    cy = cam.K[..., None, 1, 2]
    return jnp.stack([fx * xd + cx, fy * yd + cy], axis=-1)


def fisheye_undistort(cam: FisheyeCamera, pixels: jnp.ndarray) -> jnp.ndarray:
    """Undistort pixel coords ``(..., N, 2)`` to ideal normalized coords on
    the ``z=1`` plane (shape ``(..., N, 2)``).

    Semantics of ``cv2.fisheye.undistortPoints(points, K, D)`` as called by
    the reference's FisheyeCamera.undistort_points (cameras.py:376-382):
    invert K (fx, fy, cx, cy — cv2.fisheye ignores skew here), clamp
    ``theta_d`` to [-pi/2, pi/2], invert the distortion polynomial with
    Newton's method, rescale by ``tan(theta)/theta_d``. Points whose
    iteration diverges (theta sign flip) get cv2's ``-1e6`` sentinel.

    NaN inputs propagate to NaN outputs (the pipeline's universal
    missing-value convention).
    """
    fx = cam.K[..., None, 0, 0]
    fy = cam.K[..., None, 1, 1]
    cx = cam.K[..., None, 0, 2]
    cy = cam.K[..., None, 1, 2]
    pwx = (pixels[..., 0] - cx) / fx
    pwy = (pixels[..., 1] - cy) / fy

    D = cam.D[..., None, :]
    k1, k2, k3, k4 = D[..., 0], D[..., 1], D[..., 2], D[..., 3]

    theta_d_raw = jnp.sqrt(pwx * pwx + pwy * pwy)
    theta_d = jnp.clip(theta_d_raw, -jnp.pi / 2, jnp.pi / 2)

    def body(_, theta):
        t2 = theta * theta
        t4 = t2 * t2
        t6 = t4 * t2
        t8 = t6 * t2
        num = theta * (1 + k1 * t2 + k2 * t4 + k3 * t6 + k4 * t8) - theta_d
        den = 1 + 3 * k1 * t2 + 5 * k2 * t4 + 7 * k3 * t6 + 9 * k4 * t8
        return theta - num / den

    theta = jax.lax.fori_loop(0, _NEWTON_ITERS, body, theta_d)

    small = jnp.abs(theta_d) <= 1e-8
    flipped = ((theta_d < 0) & (theta > 0)) | ((theta_d > 0) & (theta < 0))
    scale = jnp.where(small, 1.0,
                      jnp.tan(theta) / jnp.where(small, 1.0, theta_d))
    ux = pwx * scale
    uy = pwy * scale
    bad = flipped & ~small
    ux = jnp.where(bad, -1e6, ux)
    uy = jnp.where(bad, -1e6, uy)
    return jnp.stack([ux, uy], axis=-1)
