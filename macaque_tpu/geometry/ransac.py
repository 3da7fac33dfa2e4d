"""Camera-subset RANSAC triangulation, statically shaped.

The reference's ``triangulate_possible`` / ``triangulate_ransac``
(src/third_party/aniposelib/cameras.py:639-743) enumerates, per point, every
subset of the observing cameras (via ``itertools.product``), triangulates
each, and keeps the first subset whose mean reprojection error beats a
threshold (else the global best).

Here the subset enumeration is hoisted to compile time: all ``2^C`` camera
masks (in the same product order, so first-hit semantics match) are stacked
into one tensor, triangulation is vmapped over ``subsets x points``, and the
selection is an argmin/argmax — no data-dependent control flow, so the whole
RANSAC is one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from macaque_tpu.geometry.triangulate import triangulate_dlt


def _subset_masks(n_cams: int, max_drop: int | None = None) -> np.ndarray:
    """All camera subsets in the reference's product order.

    ``itertools.product([include, exclude], ...)`` counts lexicographically
    with "include" first, i.e. subset k has camera c included iff bit
    ``(n_cams-1-c)`` of k is 0. Subset 0 = all cameras.
    """
    n = 1 << n_cams
    ks = np.arange(n)[:, None]
    bits = (ks >> (n_cams - 1 - np.arange(n_cams))[None, :]) & 1
    masks = bits == 0
    if max_drop is not None:
        keep = masks.sum(axis=1) >= n_cams - max_drop
        keep[0] = True
        masks = masks[keep]
    return masks


def triangulate_ransac(
    cam,
    points: jnp.ndarray,
    min_cams: int = 2,
    threshold: float = 0.5,
    max_drop: int | None = None,
):
    """RANSAC-triangulate undistorted-pixel observations.

    cam: OmnidirCamera/PinholeCamera pytree stacked over C cameras (used for
      both DLT extrinsics and reprojection scoring).
    points: (C, N, 2) raw pixel observations, NaN = missing.
    Returns (p3d (N,3), picked (C,N) bool, points_2d (C,N,2), errors (N,)).

    Reference parity: src/third_party/aniposelib/cameras.py:639-743 with
    n_possible = 1.
    """
    from macaque_tpu.cameras.dispatch import project_fn, undistort_fn

    project, undistort = project_fn(cam), undistort_fn(cam)

    n_cams = points.shape[0]
    masks = jnp.asarray(_subset_masks(n_cams, max_drop))  # (S, C)

    und = undistort(cam, points)  # (C, N, 2)
    valid = ~jnp.isnan(points[..., 0])  # (C, N)
    pmats = cam.pmat  # (C, 3, 4)

    undT = jnp.swapaxes(und, 0, 1)      # (N, C, 2)
    validT = jnp.swapaxes(valid, 0, 1)  # (N, C)

    def solve_subset(mask):  # mask: (C,)
        eff = validT & mask[None, :]                      # (N, C)
        p3d = triangulate_dlt(undT, pmats, eff)           # (N, 3)
        proj = project(cam, p3d)                          # (C, N, 2)
        resid = jnp.where(eff.T[..., None], points - proj, jnp.nan)
        norm = jnp.linalg.norm(resid, axis=-1)            # (C, N)
        good = ~jnp.isnan(norm)
        ssum = jnp.sum(jnp.where(good, norm, 0.0), axis=0)
        denom = jnp.sum(good, axis=0).astype(norm.dtype)
        err = jnp.where(denom < 1.5, jnp.inf, ssum / denom)
        n_eff = jnp.sum(eff, axis=1)
        n_valid = jnp.sum(validT, axis=1)
        accept = (n_eff >= min_cams) | (n_eff == n_valid)
        # the reference's initial best_error=200 acts as an outlier ceiling
        accept = accept & (err < 200.0)
        err = jnp.where(accept & (n_eff >= 2), err, jnp.inf)
        return p3d, err, eff

    p3d_all, err_all, eff_all = jax.lax.map(solve_subset, masks)
    # p3d_all: (S, N, 3); err_all: (S, N); eff_all: (S, N, C)

    err_clean = jnp.where(jnp.isnan(err_all), jnp.inf, err_all)
    hit = err_clean < threshold                         # (S, N)
    any_hit = jnp.any(hit, axis=0)                      # (N,)
    first_hit = jnp.argmax(hit, axis=0)                 # (N,)
    best = jnp.argmin(err_clean, axis=0)                # (N,) first min on ties
    sel = jnp.where(any_hit, first_hit, best)           # (N,)

    n_idx = jnp.arange(points.shape[1])
    p3d = p3d_all[sel, n_idx]                           # (N, 3)
    err = err_clean[sel, n_idx]
    picked = eff_all[sel, n_idx].T                      # (C, N)

    no_solution = jnp.isinf(err)
    p3d = jnp.where(no_solution[:, None], jnp.nan, p3d)
    err = jnp.where(no_solution, 0.0, err)
    picked = picked & ~no_solution[None, :]
    points_2d = jnp.where(picked[..., None], points, jnp.nan)
    return p3d, picked, points_2d, err
