"""Masked, batched DLT triangulation.

Two variants matching the two DLT formulations in the reference:

* :func:`triangulate_dlt` — homogeneous DLT via the null space of the
  stacked ``2C x 4`` system (semantics of numba ``triangulate_simple``,
  reference: src/third_party/aniposelib/cameras.py:20-32). Implemented as a
  4x4 symmetric eigendecomposition of ``A^T A`` so a million points batch
  onto the TPU as one fused op instead of per-point SVDs.

* :func:`triangulate_dlt_pinv` — inhomogeneous 3-unknown least squares
  ``a X = b`` with ``P = -X`` (semantics of
  ``multicam_toolbox.triangulatePoints``, reference:
  src/utils/multicam_toolbox.py:433-486).

Both take undistorted normalized image coords, per-camera ``[R|t]``
projection matrices, and a validity mask; fewer than 2 valid cameras yields
NaN (the pipeline's missing-value convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# normal equations square the conditioning — TPU bf16 matmul passes would
# corrupt the null-space solve at mm scale; force true f32
_F32 = jax.lax.Precision.HIGHEST


def _dlt_rows(points: jnp.ndarray, pmats: jnp.ndarray, mask: jnp.ndarray):
    """Build masked DLT row pairs.

    points: (..., C, 2) undistorted normalized coords
    pmats:  (..., C, 3, 4) or (C, 3, 4)
    mask:   (..., C) bool — camera provides a valid observation

    Returns A of shape (..., 2C, 4) with invalid rows zeroed.
    """
    x = points[..., 0:1]  # (..., C, 1)
    y = points[..., 1:2]
    p0 = pmats[..., 0, :]  # (..., C, 4)
    p1 = pmats[..., 1, :]
    p2 = pmats[..., 2, :]
    r1 = x * p2 - p0
    r2 = y * p2 - p1
    A = jnp.concatenate([r1[..., None, :], r2[..., None, :]], axis=-2)
    A = A.reshape(*A.shape[:-3], -1, 4)  # (..., 2C, 4)
    m2 = jnp.repeat(mask, 2, axis=-1)[..., None]
    A = jnp.where(m2, A, 0.0)
    # NaN coords with mask=True would poison the system; scrub them too.
    return jnp.nan_to_num(A)


def triangulate_dlt(
    points: jnp.ndarray, pmats: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Homogeneous DLT. Returns (..., 3) 3D points; NaN where <2 cams valid.

    The minimizer of ``|A v|`` with ``|v| = 1`` is the last right-singular
    vector of ``A`` — computed via batched SVD exactly like the
    reference's ``triangulate_simple``. (An earlier eigh-of-``A^T A``
    variant squared the conditioning: on near-degenerate two-camera
    points the f32 eigenvector was unstable across compiled programs by
    >1000 mm, which poisoned the LM refinement init; the SVD stays
    within ~3 mm of an f64 oracle on the same points.)
    """
    A = _dlt_rows(points, pmats, mask)
    with jax.default_matmul_precision("float32"):  # svd iterates matmuls
        _, _, Vh = jnp.linalg.svd(A, full_matrices=False)
    v = Vh[..., -1, :]
    p3d = v[..., :3] / v[..., 3:4]
    ncam = jnp.sum(mask, axis=-1)
    return jnp.where((ncam >= 2)[..., None], p3d, jnp.nan)


def triangulate_dlt_pinv(
    points: jnp.ndarray, pmats: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Inhomogeneous DLT (mct variant): solve ``a X = b``, return ``-X``.

    Solves the 3x3 normal equations (zeroed rows contribute nothing, so
    masking by zeroing is exact), matching ``np.linalg.pinv(a) @ b`` of the
    reference on full-rank systems.
    """
    A = _dlt_rows(points, pmats, mask)
    a = A[..., :3]
    b = A[..., 3]
    with jax.default_matmul_precision("float32"):
        ata = jnp.einsum("...ri,...rj->...ij", a, a, precision=_F32)
        atb = jnp.einsum("...ri,...r->...i", a, b, precision=_F32)
        X = jnp.linalg.solve(
            ata + 1e-12 * jnp.eye(3, dtype=a.dtype), atb[..., None]
        )[..., 0]
    ncam = jnp.sum(mask, axis=-1)
    return jnp.where((ncam >= 2)[..., None], -X, jnp.nan)


def reprojection_error(cam, p3d: jnp.ndarray, p2d: jnp.ndarray) -> jnp.ndarray:
    """Per-camera signed reprojection residuals.

    cam: a camera pytree with a matching ``*_project`` (duck-typed via
      :func:`macaque_tpu.cameras.omnidir.omnidir_project` for OmnidirCamera).
    p3d: (N, 3); p2d: (C, N, 2) observed pixels (NaN = missing).
    Returns (C, N, 2) residuals ``observed - projected``
    (reference: cameras.py:325-327, 746-783).
    """
    from macaque_tpu.cameras.dispatch import project_points

    return p2d - project_points(cam, p3d)


def reprojection_error_mean(cam, p3d: jnp.ndarray, p2d: jnp.ndarray) -> jnp.ndarray:
    """Mean-over-cameras reprojection error per point, NaN if <2 cams
    observe it (reference: cameras.py:769-775)."""
    err = reprojection_error(cam, p3d, p2d)
    norm = jnp.linalg.norm(err, axis=-1)  # (C, N)
    good = ~jnp.isnan(norm)
    norm = jnp.where(good, norm, 0.0)
    denom = jnp.sum(good, axis=0).astype(norm.dtype)
    out = jnp.sum(norm, axis=0) / denom
    return jnp.where(denom < 1.5, jnp.nan, out)
