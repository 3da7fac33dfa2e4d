"""Mei omnidirectional camera model in pure JAX.

The reference rig uses Basler cameras with omnidirectional lenses calibrated
with OpenCV's omnidir (Mei) model: intrinsics ``K`` (3x3 with skew), mirror
parameter ``xi``, and distortion ``D = [k1, k2, p1, p2]``
(reference: src/utils/multicam_toolbox.py:393-431,
src/third_party/aniposelib/cameras.py:487-516 call ``cv2.omnidir.*``).

This module reimplements the model from its math (Mei & Rives 2007):

Projection of a camera-frame point ``Xc``:
  1. normalize to the unit sphere           ``Xs = Xc / |Xc|``
  2. perspective from the mirror center     ``m = Xs_xy / (Xs_z + xi)``
  3. radial-tangential distortion on ``m``  (k1, k2, p1, p2)
  4. pixel coords via K (fx, fy, skew s, cx, cy)

Undistortion inverts 4..2 (fixed-point iteration for the distortion, a
closed-form quadratic for the sphere lift) — all with static shapes and a
fixed iteration count so it jits to a single fused TPU kernel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from macaque_tpu.cameras.rotation import rodrigues

_UNDIST_ITERS = 20  # matches OpenCV omnidir's fixed-point iteration count


class OmnidirCamera(NamedTuple):
    """Batched omnidir camera parameters (a JAX pytree).

    All fields may carry leading batch dims (e.g. ``(n_cam, ...)``).
    """

    K: jnp.ndarray     # (..., 3, 3) intrinsics for the omnidir model
    xi: jnp.ndarray    # (...,) mirror parameter
    D: jnp.ndarray     # (..., 4) distortion [k1, k2, p1, p2]
    rvec: jnp.ndarray  # (..., 3) world->camera rotation (Rodrigues)
    tvec: jnp.ndarray  # (..., 3) world->camera translation

    @property
    def R(self) -> jnp.ndarray:
        return rodrigues(self.rvec)

    @property
    def pmat(self) -> jnp.ndarray:
        """Extrinsics matrix ``[R | t]`` of shape (..., 3, 4)."""
        return jnp.concatenate([self.R, self.tvec[..., :, None]], axis=-1)


def _distort(mx: jnp.ndarray, my: jnp.ndarray, D: jnp.ndarray):
    """Apply radial-tangential distortion to normalized coords."""
    k1, k2, p1, p2 = D[..., 0], D[..., 1], D[..., 2], D[..., 3]
    r2 = mx * mx + my * my
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = mx * radial + 2.0 * p1 * mx * my + p2 * (r2 + 2.0 * mx * mx)
    yd = my * radial + p1 * (r2 + 2.0 * my * my) + 2.0 * p2 * mx * my
    return xd, yd


def omnidir_project(cam: OmnidirCamera, points: jnp.ndarray) -> jnp.ndarray:
    """Project world points ``(..., N, 3)`` to pixel coords ``(..., N, 2)``.

    Replaces ``cv2.omnidir.projectPoints`` (used at reference:
    src/pipeline/step2_crossviewmatching.py:485-489,
    src/pipeline/visualize_result.py:112-134). Batched over cameras and
    points; differentiable for bundle adjustment.
    """
    R = cam.R
    Xc = jnp.einsum("...ij,...nj->...ni", R, points,
                    precision=jax.lax.Precision.HIGHEST) + cam.tvec[..., None, :]

    norm = jnp.linalg.norm(Xc, axis=-1, keepdims=True)
    Xs = Xc / jnp.maximum(norm, 1e-12)

    xi = cam.xi[..., None]
    denom = Xs[..., 2] + xi
    mx = Xs[..., 0] / denom
    my = Xs[..., 1] / denom

    xd, yd = _distort(mx, my, cam.D[..., None, :])

    fx = cam.K[..., None, 0, 0]
    fy = cam.K[..., None, 1, 1]
    s = cam.K[..., None, 0, 1]
    cx = cam.K[..., None, 0, 2]
    cy = cam.K[..., None, 1, 2]
    u = fx * xd + s * yd + cx
    v = fy * yd + cy
    return jnp.stack([u, v], axis=-1)


def omnidir_undistort(cam: OmnidirCamera, pixels: jnp.ndarray) -> jnp.ndarray:
    """Undistort pixel coords ``(..., N, 2)`` to ideal normalized coords on
    the ``z=1`` plane (shape ``(..., N, 2)``).

    Semantics of ``cv2.omnidir.undistortPoints(..., R=eye(3))`` as used at
    reference: src/pipeline/step2_crossviewmatching.py:306-325 and
    src/utils/multicam_toolbox.py:404-420: invert K (incl. skew), fixed-point
    undistort, lift to the unit sphere, reproject to the plane.

    NaN inputs propagate to NaN outputs (the pipeline's universal
    missing-value convention).
    """
    fx = cam.K[..., None, 0, 0]
    fy = cam.K[..., None, 1, 1]
    s = cam.K[..., None, 0, 1]
    cx = cam.K[..., None, 0, 2]
    cy = cam.K[..., None, 1, 2]

    u = pixels[..., 0]
    v = pixels[..., 1]

    ppy = (v - cy) / fy
    ppx = (u - cx - s * ppy) / fx

    D = cam.D[..., None, :]
    k1, k2, p1, p2 = D[..., 0], D[..., 1], D[..., 2], D[..., 3]

    def body(_, pu):
        pux, puy = pu
        r2 = pux * pux + puy * puy
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        nx = (ppx - 2.0 * p1 * pux * puy - p2 * (r2 + 2.0 * pux * pux)) / radial
        ny = (ppy - 2.0 * p2 * pux * puy - p1 * (r2 + 2.0 * puy * puy)) / radial
        return (nx, ny)

    pux, puy = jax.lax.fori_loop(0, _UNDIST_ITERS, body, (ppx, ppy))

    # Lift to unit sphere: find Zs with |Xs| = 1, Xs_xy = pu * (Zs + xi).
    xi = cam.xi[..., None]
    r2 = pux * pux + puy * puy
    a = r2 + 1.0
    b = 2.0 * xi * r2
    c = r2 * xi * xi - 1.0
    Zs = (-b + jnp.sqrt(jnp.maximum(b * b - 4.0 * a * c, 0.0))) / (2.0 * a)

    scale = (Zs + xi) / Zs
    return jnp.stack([pux * scale, puy * scale], axis=-1)


def omnidir_unproject_ray(
    cam: OmnidirCamera, pixels: jnp.ndarray, depths: jnp.ndarray
) -> jnp.ndarray:
    """Back-project pixels to world-frame 3D points along the viewing ray.

    ``depths`` may be a scalar or broadcastable to ``(..., N)``. For each
    undistorted normalized point ``(x, y)`` the camera-frame point is
    ``(x d, y d, d)``; world frame is ``R^T (p - t)``, matching the
    ``deproject`` used to build ray-distance affinities at reference:
    src/pipeline/step2_crossviewmatching.py:327-355.
    """
    und = omnidir_undistort(cam, pixels)
    d = jnp.broadcast_to(jnp.asarray(depths), und.shape[:-1])[..., None]
    pc = jnp.concatenate([und * d, jnp.broadcast_to(d, und[..., :1].shape)], axis=-1)
    R = cam.R
    diff = pc - cam.tvec[..., None, :]
    return jnp.einsum("...ji,...nj->...ni", R, diff,
                      precision=jax.lax.Precision.HIGHEST)  # R^T @ diff


def unproject_ray_from_undistorted(
    cam: OmnidirCamera, und: jnp.ndarray, depths: jnp.ndarray
) -> jnp.ndarray:
    """Same as :func:`omnidir_unproject_ray` but starting from already
    undistorted normalized coords (the reference calls ``deproject`` on
    pre-undistorted points; reference: step2:918,404-405)."""
    d = jnp.broadcast_to(jnp.asarray(depths), und.shape[:-1])[..., None]
    pc = jnp.concatenate([und * d, jnp.broadcast_to(d, und[..., :1].shape)], axis=-1)
    R = cam.R
    diff = pc - cam.tvec[..., None, :]
    return jnp.einsum("...ji,...nj->...ni", R, diff,
                      precision=jax.lax.Precision.HIGHEST)
