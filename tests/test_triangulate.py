import numpy as np
import jax.numpy as jnp

from macaque_tpu.cameras import OmnidirCamera, omnidir_project, omnidir_undistort
from macaque_tpu.geometry import (
    triangulate_dlt,
    triangulate_dlt_pinv,
    triangulate_ransac,
    reprojection_error_mean,
)
from tests.oracles import triangulate_svd_np, triangulate_pinv_np
from tests.test_cameras import make_omni_cam, world_points


def make_rig(n_cam=4, seed=0):
    """Cameras in a rough ring around the origin looking inward."""
    import cv2

    rng = np.random.default_rng(seed)
    K = np.tile(np.array([[800.0, 0.5, 1024], [0, 805, 768], [0, 0, 1]]), (n_cam, 1, 1))
    K[:, 0, 0] += rng.uniform(-30, 30, n_cam)
    xi = 1.1 + rng.uniform(-0.1, 0.1, n_cam)
    D = rng.uniform(-0.03, 0.03, (n_cam, 4))
    rvecs, tvecs = [], []
    for i in range(n_cam):
        ang = 2 * np.pi * i / n_cam
        cam_pos = np.array([3000 * np.cos(ang), 3000 * np.sin(ang), 500.0])
        # look-at: camera z-axis points from cam_pos to the origin
        z = -cam_pos / np.linalg.norm(cam_pos)
        up = np.array([0.0, 0.0, -1.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])  # rows = camera axes in world frame
        rv, _ = cv2.Rodrigues(R)
        t = -R @ cam_pos
        rvecs.append(rv.ravel())
        tvecs.append(t)
    return OmnidirCamera(
        K=jnp.asarray(K), xi=jnp.asarray(xi), D=jnp.asarray(D),
        rvec=jnp.asarray(np.stack(rvecs)), tvec=jnp.asarray(np.stack(tvecs)),
    )


def test_dlt_recovers_points():
    cam = make_rig(4)
    pts = world_points(2, 40) * 0.3
    pix = omnidir_project(cam, jnp.asarray(pts))  # (C, N, 2)
    und = omnidir_undistort(cam, pix)
    undT = jnp.swapaxes(und, 0, 1)  # (N, C, 2)
    mask = jnp.ones(undT.shape[:2], bool)
    p3d = np.asarray(triangulate_dlt(undT, cam.pmat, mask))
    np.testing.assert_allclose(p3d, pts, atol=1e-5)


def test_dlt_matches_svd_oracle():
    cam = make_rig(5, seed=3)
    pts = world_points(4, 10) * 0.3
    und = omnidir_undistort(cam, omnidir_project(cam, jnp.asarray(pts)))
    undT = np.asarray(jnp.swapaxes(und, 0, 1))
    # perturb so the system is inconsistent (tests the least-squares branch)
    rng = np.random.default_rng(0)
    undT = undT + rng.normal(0, 1e-3, undT.shape)
    pmats = np.asarray(cam.pmat)
    mask = jnp.ones(undT.shape[:2], bool)
    got = np.asarray(triangulate_dlt(jnp.asarray(undT), cam.pmat, mask))
    for i in range(undT.shape[0]):
        want = triangulate_svd_np(undT[i], pmats)
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_pinv_matches_oracle():
    cam = make_rig(4, seed=5)
    pts = world_points(6, 8) * 0.3
    und = omnidir_undistort(cam, omnidir_project(cam, jnp.asarray(pts)))
    undT = np.asarray(jnp.swapaxes(und, 0, 1))
    rng = np.random.default_rng(1)
    undT = undT + rng.normal(0, 1e-3, undT.shape)
    pmats = np.asarray(cam.pmat)
    mask = jnp.ones(undT.shape[:2], bool)
    got = np.asarray(triangulate_dlt_pinv(jnp.asarray(undT), cam.pmat, mask))
    for i in range(undT.shape[0]):
        want = triangulate_pinv_np(undT[i], pmats)
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_masked_cameras_and_nan():
    cam = make_rig(4)
    pts = world_points(2, 5) * 0.3
    und = omnidir_undistort(cam, omnidir_project(cam, jnp.asarray(pts)))
    undT = jnp.swapaxes(und, 0, 1)
    mask = np.ones(undT.shape[:2], bool)
    mask[0, 2:] = False          # point 0: only 2 cams
    mask[1, 1:] = False          # point 1: 1 cam -> NaN
    p3d = np.asarray(triangulate_dlt(undT, cam.pmat, jnp.asarray(mask)))
    np.testing.assert_allclose(p3d[0], pts[0], atol=1e-4)
    assert np.isnan(p3d[1]).all()
    np.testing.assert_allclose(p3d[2:], pts[2:], atol=1e-5)


def test_reprojection_error_mean():
    cam = make_rig(4)
    pts = world_points(11, 6) * 0.3
    pix = omnidir_project(cam, jnp.asarray(pts))
    err = np.asarray(reprojection_error_mean(cam, jnp.asarray(pts), pix))
    np.testing.assert_allclose(err, 0.0, atol=1e-6)
    # knock out all but one camera for point 0 -> NaN
    pix0 = np.array(pix)
    pix0[1:, 0] = np.nan
    err = np.asarray(reprojection_error_mean(cam, jnp.asarray(pts), jnp.asarray(pix0)))
    assert np.isnan(err[0])


def test_ransac_rejects_outlier_camera():
    cam = make_rig(5, seed=9)
    pts = world_points(13, 12) * 0.3
    pix = np.array(omnidir_project(cam, jnp.asarray(pts)))
    pix[2, :, :] += 80.0  # corrupt camera 2 badly
    p3d, picked, p2d_sel, errs = triangulate_ransac(
        cam, jnp.asarray(pix), min_cams=2, threshold=0.5
    )
    p3d = np.asarray(p3d)
    picked = np.asarray(picked)
    np.testing.assert_allclose(p3d, pts, atol=0.5)
    # camera 2 should mostly be excluded
    assert picked[2].mean() < 0.2
    assert np.asarray(errs).max() < 1.0
