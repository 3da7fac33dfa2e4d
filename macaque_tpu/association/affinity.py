"""Cross-view geometric affinity from 3D viewing-ray distances.

The reference (step2 ``geometry_affinity2`` + ``calc_dist_btw_lines``,
src/pipeline/step2_crossviewmatching.py:359-432) deprojects every
detection's keypoints to rays and computes, for every detection pair from
different cameras, the mean line-line distance over mutually confident
joints — O(M^2 J) Python loops per keyframe.

Here the rays for all (keyframe, detection, joint) triples are built in one
batched unprojection, pairwise distances are one broadcasted tensor op, and
the z-score + sigmoid normalization is vectorized over keyframes.
"""

from __future__ import annotations

import jax.numpy as jnp

from macaque_tpu.cameras.omnidir import (
    OmnidirCamera,
    unproject_ray_from_undistorted,
)

THR_KP = 0.1      # keypoint confidence threshold (reference step2:21)
DTH2 = 150.0      # affinity distance cutoff, mm (reference step2:391)
SIGMOID_SLOPE = 5.0  # (reference step2:430)


def build_rays(
    cam: OmnidirCamera,
    und_points: jnp.ndarray,
    cam_idx: jnp.ndarray,
    far_depth: float = 1000.0,
):
    """Viewing rays for detections assigned to cameras.

    und_points: (..., M, J, 2) undistorted normalized keypoint coords.
    cam_idx: (M,) camera index per detection.
    Returns (origin (..., M, J, 3), direction unit (..., M, J, 3)).
    """
    # per-detection camera params, shape (M, ...); the unprojection's
    # trailing point axis is J and batch dims broadcast (M,..) vs (T, M,..)
    sub_cam = OmnidirCamera(
        K=cam.K[cam_idx],
        xi=cam.xi[cam_idx],
        D=cam.D[cam_idx],
        rvec=cam.rvec[cam_idx],
        tvec=cam.tvec[cam_idx],
    )
    near = unproject_ray_from_undistorted(sub_cam, und_points, 0.0)
    far = unproject_ray_from_undistorted(sub_cam, und_points, far_depth)
    d = far - near
    d = d / jnp.linalg.norm(d + 1e-12, axis=-1, keepdims=True)
    return near, d


def line_distance_matrix(origins: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Pairwise line-line distances.

    origins/dirs: (..., M, J, 3). Returns (..., M, M, J) with the distance
    between detection i's joint-j ray and detection k's joint-j ray:
    ``|(p2 - p1) . (d1 x d2)| / |d1 x d2|``
    (reference step2:359-369; note the reference divides by |d1 x d2| with
    unit d1, d2 — identical formula).
    """
    p1 = origins[..., :, None, :, :]  # (..., M, 1, J, 3)
    p2 = origins[..., None, :, :, :]  # (..., 1, M, J, 3)
    d1 = dirs[..., :, None, :, :]
    d2 = dirs[..., None, :, :, :]
    c = jnp.cross(d1, d2)
    cn = jnp.linalg.norm(c, axis=-1)
    num = jnp.abs(jnp.sum((p2 - p1) * c, axis=-1))
    return num / jnp.maximum(cn, 1e-12)


def geometry_affinity(
    cam: OmnidirCamera,
    und_points: jnp.ndarray,
    scores: jnp.ndarray,
    cam_idx: jnp.ndarray,
    det_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Affinity matrix over padded detections, batched over keyframes.

    und_points: (T, M, J, 2) undistorted keypoints
    scores:     (T, M, J) keypoint confidences
    cam_idx:    (M,) static camera assignment of each padded slot
    det_valid:  (T, M) detection-present mask
    Returns affinity (T, M, M) in [0, 1]; 0 for same-camera pairs, invalid
    detections, and pairs farther than DTH2.
    """
    origins, dirs = build_rays(cam, und_points, cam_idx)
    dist = line_distance_matrix(origins, dirs)  # (T, M, M, J)

    conf = (scores > THR_KP)
    pair_conf = conf[..., :, None, :] & conf[..., None, :, :]  # (T, M, M, J)
    n_joint = jnp.sum(pair_conf, axis=-1)
    mean_dist = jnp.sum(jnp.where(pair_conf, dist, 0.0), axis=-1) / jnp.maximum(
        n_joint, 1
    )

    same_cam = cam_idx[:, None] == cam_idx[None, :]
    pair_valid = (
        det_valid[..., :, None]
        & det_valid[..., None, :]
        & ~same_cam
        & (n_joint >= 3)
    )
    dist_mat = jnp.where(pair_valid, mean_dist, DTH2 * 2)
    eye = jnp.eye(dist_mat.shape[-1], dtype=bool)
    dist_mat = jnp.where(eye, 0.0, dist_mat)

    # z-score over in-range entries (incl. the zero diagonal, as the
    # reference does: step2:426-428), then sigmoid
    in_range = dist_mat < DTH2 * 2
    cnt = jnp.sum(in_range, axis=(-2, -1))
    mean = jnp.sum(jnp.where(in_range, dist_mat, 0.0), axis=(-2, -1)) / jnp.maximum(
        cnt, 1
    )
    var = jnp.sum(
        jnp.where(in_range, (dist_mat - mean[..., None, None]) ** 2, 0.0),
        axis=(-2, -1),
    ) / jnp.maximum(cnt, 1)
    std = jnp.sqrt(jnp.maximum(var, 1e-12))
    z = -(dist_mat - mean[..., None, None]) / std[..., None, None]
    aff = 1.0 / (1.0 + jnp.exp(-SIGMOID_SLOPE * z))
    return jnp.where(dist_mat > DTH2, 0.0, aff)


def combined_affinity(
    geo_aff: jnp.ndarray,
    collar_ids: jnp.ndarray,
    cam_idx: jnp.ndarray,
    alpha_id: float = 0.2,
) -> jnp.ndarray:
    """Blend geometric affinity with collar-ID agreement
    (reference step2:556-575): ``alpha * [same id] + (1-alpha) * geo``,
    gated by ``geo > 0``.

    collar_ids: (T, M) int, -1 = unknown.
    """
    same_id = (collar_ids[..., :, None] >= 0) & (
        collar_ids[..., :, None] == collar_ids[..., None, :]
    )
    diff_cam = cam_idx[:, None] != cam_idx[None, :]
    cid_mat = (same_id & diff_cam).astype(geo_aff.dtype)
    W = alpha_id * cid_mat + (1 - alpha_id) * geo_aff
    W = W * (geo_aff > 0)
    return jnp.nan_to_num(W)
