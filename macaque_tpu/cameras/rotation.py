"""Rotation utilities: Rodrigues vector <-> matrix, fully differentiable.

TPU-native replacement for ``cv2.Rodrigues`` used throughout the reference
(e.g. reference: src/utils/multicam_toolbox.py:450,
src/third_party/aniposelib/cameras.py:154-171).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# metric geometry must not run through TPU bf16 matmul passes: at mm-scale
# coordinates the ~0.3% relative error is several mm per op (see
# docs/numerics: TPU default matmul precision)
_F32 = jax.lax.Precision.HIGHEST

_EPS = 1e-12


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector(s) ``(..., 3)`` -> rotation matrix(es) ``(..., 3, 3)``.

    Uses the Rodrigues formula ``R = I + sin(t) K + (1 - cos(t)) K^2`` with a
    Taylor-safe normalization at ``t -> 0`` (sinc-style factors), so it is
    differentiable everywhere, unlike a naive ``axis = rvec / |rvec|``.
    """
    rvec = jnp.asarray(rvec)
    theta2 = jnp.sum(rvec * rvec, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    small = theta2 < 1e-14
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))  # safe for grad at 0

    # sin(t)/t and (1-cos(t))/t^2, Taylor-switched near t = 0
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    half = theta / 2.0
    b = jnp.where(
        small, 0.5 - theta2 / 24.0, 2.0 * (jnp.sin(half) / theta) ** 2
    )

    x, y, z = rvec[..., 0], rvec[..., 1], rvec[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + a * K + b * jnp.matmul(K, K, precision=_F32)


def rodrigues_inv(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix(es) ``(..., 3, 3)`` -> rotation vector(s) ``(..., 3)``.

    Standard log map via the matrix trace and the skew-symmetric part,
    with a dedicated theta ~ pi branch: there the skew part vanishes
    (R is symmetric), so the axis is recovered from the dominant column
    of ``R + R^T - 2 cos(theta) I = 2 (1 - cos theta) v v^T``. Cameras
    facing back along a world axis sit exactly on this branch (caught by
    tests/test_golden_fixextrinsic.py — the old skew-only formula
    silently returned ~0 for them). At theta = pi exactly the sign of
    the axis is a true gauge freedom (R(pi, v) = R(pi, -v)); near pi it
    is disambiguated against the residual skew part.
    """
    R = jnp.asarray(R)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_t)

    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # w = 2 sin(theta) * axis ; rvec = theta * axis = theta / (2 sin t) * w
    sin_t = jnp.sin(theta)
    scale = jnp.where(
        sin_t > 1e-7, theta / (2.0 * sin_t + _EPS), 0.5 + theta * theta / 12.0
    )
    r_skew = w * scale[..., None]

    # near-pi branch: A = R + R^T - 2 cos(theta) I = 2 (1-cos) v v^T;
    # its largest-norm column is parallel to the axis
    A = R + jnp.swapaxes(R, -1, -2) - 2.0 * cos_t[..., None, None] * jnp.eye(
        3, dtype=R.dtype)
    col_n = jnp.linalg.norm(A, axis=-2)  # (..., 3) column norms
    j = jnp.argmax(col_n, axis=-1)
    col = jnp.take_along_axis(
        A, jnp.broadcast_to(j[..., None, None], A.shape[:-1] + (1,)),
        axis=-1)[..., 0]
    axis = col / (jnp.linalg.norm(col, axis=-1, keepdims=True) + _EPS)
    # align with the residual skew part when it is meaningful; at pi
    # exactly both signs are the same rotation
    sgn = jnp.where(jnp.sum(w * axis, axis=-1) < 0.0, -1.0, 1.0)
    r_pi = theta[..., None] * axis * sgn[..., None]

    near_pi = (sin_t < 1e-4) & (cos_t < 0.0)
    return jnp.where(near_pi[..., None], r_pi, r_skew)


def rotate_points(rvec: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``points (..., N, 3)`` by rotation vector(s) ``rvec (..., 3)``.

    Direct Rodrigues rotation without materializing R, matching the math of
    reference: src/third_party/aniposelib/cameras.py:154-171
    (``transform_points``), but batched/differentiable.
    """
    R = rodrigues(rvec)
    return jnp.einsum("...ij,...nj->...ni", R, points, precision=_F32)
