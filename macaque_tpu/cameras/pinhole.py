"""Pinhole (Brown-Conrady) and fisheye camera models in pure JAX.

TPU-native equivalents of the OpenCV calls used by the reference's
aniposelib ``Camera`` / ``FisheyeCamera`` classes
(reference: src/third_party/aniposelib/cameras.py:173-426) and by
``multicam_toolbox.undistortPoints`` in pinhole mode
(reference: src/utils/multicam_toolbox.py:421-429).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from macaque_tpu.cameras.rotation import rodrigues

_UNDIST_ITERS = 20


class PinholeCamera(NamedTuple):
    """Batched pinhole camera (a JAX pytree). Distortion [k1,k2,p1,p2,k3]."""

    K: jnp.ndarray     # (..., 3, 3)
    dist: jnp.ndarray  # (..., 5)
    rvec: jnp.ndarray  # (..., 3)
    tvec: jnp.ndarray  # (..., 3)

    @property
    def R(self) -> jnp.ndarray:
        return rodrigues(self.rvec)

    @property
    def pmat(self) -> jnp.ndarray:
        return jnp.concatenate([self.R, self.tvec[..., :, None]], axis=-1)


def _distort(x, y, dist):
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return xd, yd


def pinhole_project(cam: PinholeCamera, points: jnp.ndarray) -> jnp.ndarray:
    """World points ``(..., N, 3)`` -> pixels ``(..., N, 2)``
    (``cv2.projectPoints`` semantics)."""
    Xc = jnp.einsum("...ij,...nj->...ni", cam.R, points,
                    precision=jax.lax.Precision.HIGHEST) + cam.tvec[..., None, :]
    x = Xc[..., 0] / Xc[..., 2]
    y = Xc[..., 1] / Xc[..., 2]
    xd, yd = _distort(x, y, cam.dist[..., None, :])
    fx = cam.K[..., None, 0, 0]
    fy = cam.K[..., None, 1, 1]
    s = cam.K[..., None, 0, 1]
    cx = cam.K[..., None, 0, 2]
    cy = cam.K[..., None, 1, 2]
    return jnp.stack([fx * xd + s * yd + cx, fy * yd + cy], axis=-1)


def pinhole_undistort(cam: PinholeCamera, pixels: jnp.ndarray) -> jnp.ndarray:
    """Pixels ``(..., N, 2)`` -> ideal normalized coords on z=1
    (``cv2.undistortPoints`` semantics, fixed-point iteration)."""
    fx = cam.K[..., None, 0, 0]
    fy = cam.K[..., None, 1, 1]
    s = cam.K[..., None, 0, 1]
    cx = cam.K[..., None, 0, 2]
    cy = cam.K[..., None, 1, 2]
    ppy = (pixels[..., 1] - cy) / fy
    ppx = (pixels[..., 0] - cx - s * ppy) / fx

    dist = cam.dist[..., None, :]
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))

    def body(_, pu):
        x, y = pu
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        nx = (ppx - 2.0 * p1 * x * y - p2 * (r2 + 2.0 * x * x)) / radial
        ny = (ppy - 2.0 * p2 * x * y - p1 * (r2 + 2.0 * y * y)) / radial
        return (nx, ny)

    x, y = jax.lax.fori_loop(0, _UNDIST_ITERS, body, (ppx, ppy))
    return jnp.stack([x, y], axis=-1)
