import numpy as np
import pytest

import jax.numpy as jnp

from macaque_tpu.calib import (
    calibrate_intrinsics_omnidir,
    bundle_adjust_extrinsics,
    bundle_adjust_full,
    solve_pnp_extrinsics,
    find_chessboard_corners,
)
from macaque_tpu.calib.boards import chessboard_object_points
from macaque_tpu.cameras import omnidir_project, omnidir_undistort
from tests.test_triangulate import make_rig
from tests.test_cameras import make_omni_cam


def test_intrinsic_calibration_recovers_params():
    """Synthetic board views through a known Mei camera -> the fit must
    recover focal/xi/distortion and reach sub-0.1px reprojection."""
    import cv2

    cam = make_omni_cam(seed=11)
    K_true = np.asarray(cam.K[0])
    xi_true = float(cam.xi[0])
    D_true = np.asarray(cam.D[0])

    rng = np.random.default_rng(0)
    board = chessboard_object_points(6, 5, 80.0)
    V = 12
    rvecs, tvecs, obj, img = [], [], [], []
    for v in range(V):
        rv = rng.uniform(-0.4, 0.4, 3)
        tv = np.array([rng.uniform(-200, 200), rng.uniform(-200, 200),
                       rng.uniform(900, 1600)])
        cam_v = type(cam)(
            K=cam.K, xi=cam.xi, D=cam.D,
            rvec=jnp.asarray(rv[None]), tvec=jnp.asarray(tv[None]),
        )
        pix = np.asarray(omnidir_project(cam_v, jnp.asarray(board)))[0]
        rvecs.append(rv)
        tvecs.append(tv)
        obj.append(board)
        img.append(pix + rng.normal(0, 0.05, pix.shape))

    K, xi, D, rv_out, tv_out, rms = calibrate_intrinsics_omnidir(
        np.stack(obj), np.stack(img),
        init_f=K_true[0, 0] * 0.9,
        init_c=(K_true[0, 2] + 15, K_true[1, 2] - 10),
        init_rvecs=np.stack(rvecs) + rng.normal(0, 0.02, (V, 3)),
        init_tvecs=np.stack(tvecs) + rng.normal(0, 20, (V, 3)),
    )
    # The Mei model has a nearly flat focal<->xi gauge valley on planar
    # boards (raw fx/xi are not identifiable), so the correctness
    # criterion is reaching the injected noise floor (0.05 px).
    assert rms < 0.1, f"rms {rms}"


def test_extrinsic_bundle_adjustment():
    rig = make_rig(4, seed=21)
    rng = np.random.default_rng(1)
    P = 60
    pts = rng.uniform(-400, 400, (P, 3))
    obs = np.array(omnidir_project(rig, jnp.asarray(pts)))
    obs += rng.normal(0, 0.1, obs.shape)
    obs[1, :10] = np.nan  # some missing observations

    rv0 = np.asarray(rig.rvec) + np.concatenate(
        [np.zeros((1, 3)), rng.normal(0, 0.01, (3, 3))]
    )
    tv0 = np.asarray(rig.tvec) + np.concatenate(
        [np.zeros((1, 3)), rng.normal(0, 20, (3, 3))]
    )
    pts0 = pts + rng.normal(0, 30, pts.shape)

    rv, tv, pts_out, rms = bundle_adjust_extrinsics(
        np.asarray(rig.K), np.asarray(rig.xi), np.asarray(rig.D),
        rv0, tv0, obs, pts0,
    )
    assert rms < 0.2, f"rms {rms}"
    np.testing.assert_allclose(rv, np.asarray(rig.rvec), atol=5e-3)

    # With camera 0 fixed and the 3D points free, global scale about
    # camera 0's center is an exact gauge freedom — reprojection cannot
    # determine it, and the optimum slides along that valley with the
    # observation noise. The reference's optimize_extrinsic (scipy TRF,
    # x_scale='jac', fixcam0 — mct:488-614) has the identical freedom.
    # Compare camera centers after removing the one free scale.
    def centers(rvecs, tvecs):
        import cv2

        return np.stack([
            -(cv2.Rodrigues(r)[0].T @ t) for r, t in zip(rvecs, tvecs)
        ])

    c_est = centers(rv, tv)
    c_true = centers(np.asarray(rig.rvec), np.asarray(rig.tvec))
    rel_est = c_est - c_est[0]
    rel_true = c_true - c_true[0]
    s = float(np.sum(rel_est * rel_true) / np.sum(rel_est * rel_est))
    assert abs(s - 1.0) < 0.02, s  # drift is sub-percent in practice
    np.testing.assert_allclose(s * rel_est, rel_true, atol=15.0)


def test_full_bundle_adjustment_improves():
    rig = make_rig(4, seed=31)
    rng = np.random.default_rng(2)
    P = 80
    pts = rng.uniform(-400, 400, (P, 3))
    obs = np.asarray(omnidir_project(rig, jnp.asarray(pts)))

    K0 = np.asarray(rig.K).copy()
    K0[:, 0, 0] *= 1.02  # perturb focal lengths
    rv0 = np.asarray(rig.rvec) + np.concatenate(
        [np.zeros((1, 3)), rng.normal(0, 0.005, (3, 3))]
    )
    K, xi, D, rv, tv, pts_out, rms = bundle_adjust_full(
        K0, np.asarray(rig.xi), np.asarray(rig.D),
        rv0, np.asarray(rig.tvec), obs, pts + rng.normal(0, 10, pts.shape),
    )
    assert rms < 0.1, f"rms {rms}"


def test_pnp_and_chessboard_detection():
    import cv2

    # PnP from undistorted normalized points
    cam = make_omni_cam(seed=41)
    rng = np.random.default_rng(3)
    pts3 = rng.uniform(-300, 300, (12, 3)) + np.array([0, 0, 200.0])
    pix = omnidir_project(cam, jnp.asarray(pts3))
    und = np.asarray(omnidir_undistort(cam, pix))[0]
    rv, tv = solve_pnp_extrinsics(pts3, und)
    np.testing.assert_allclose(rv, np.asarray(cam.rvec[0]), atol=1e-4)
    np.testing.assert_allclose(tv, np.asarray(cam.tvec[0]), atol=1e-2)

    # chessboard detection on a rendered board
    cols, rows, sq = 6, 5, 40
    img = np.full(((rows + 1) * sq + 80, (cols + 1) * sq + 80), 255, np.uint8)
    for r in range(rows + 1):
        for c in range(cols + 1):
            if (r + c) % 2 == 0:
                y0, x0 = 40 + r * sq, 40 + c * sq
                img[y0:y0 + sq, x0:x0 + sq] = 0
    corners = find_chessboard_corners(img, cols, rows)
    assert corners is not None and corners.shape == (cols * rows, 2)
