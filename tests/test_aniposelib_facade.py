"""CameraGroup facade surface: accessors, average_error,
triangulate_possible, bundle_adjust(_iter) (reference aniposelib
cameras.py:173-555 Camera accessors, :639 triangulate_possible,
:786/:894 bundle adjustment, :1883 average_error)."""

import numpy as np
import jax.numpy as jnp

from macaque_tpu.cameras.omnidir import OmnidirCamera, omnidir_project
from macaque_tpu.cameras.rig import CameraRig
from macaque_tpu.compat.aniposelib import CameraGroup


def make_group(n_cam=3, seed=0):
    rng = np.random.default_rng(seed)
    K = np.tile(np.array([[900.0, 0, 512], [0, 900, 384], [0, 0, 1]]),
                (n_cam, 1, 1))
    xi = np.full(n_cam, 0.9)
    D = np.zeros((n_cam, 4))
    rvec = rng.normal(0, 0.15, (n_cam, 3))
    tvec = np.concatenate(
        [rng.normal(0, 80, (n_cam, 2)), np.full((n_cam, 1), 2600.0)], 1)
    rig = CameraRig(camera_ids=[str(i) for i in range(n_cam)],
                    K=K, xi=xi, D=D, rvec=rvec, tvec=tvec,
                    size=(1024, 768))
    return CameraGroup(rig)


def project_points(group, p3d):
    return np.asarray(
        omnidir_project(group.rig.omni(), jnp.asarray(p3d)))


def test_camera_view_accessors_roundtrip():
    g = make_group()
    cams = g.cameras
    assert [c.get_name() for c in cams] == ["0", "1", "2"]

    cams[1].set_rotation([0.1, 0.2, 0.3])
    np.testing.assert_allclose(g.rig.rvec[1], [0.1, 0.2, 0.3])
    cams[1].set_translation([1.0, 2.0, 3.0])
    np.testing.assert_allclose(g.rig.tvec[1], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(g.get_rotations()[1], [0.1, 0.2, 0.3])

    K = cams[0].get_camera_matrix()
    assert K[0, 0] == 900.0
    cams[0].set_focal_length(800.0)
    assert g.rig.K[0][0, 0] == 800.0

    g2 = g.copy()
    g2.cameras[0].set_xi(0.5)
    assert g.cameras[0].get_xi() == 0.9  # copy is independent

    M = cams[1].get_extrinsics_mat()
    assert M.shape == (4, 4)
    np.testing.assert_allclose(M[3], [0, 0, 0, 1])


def test_resize_cameras_scales_intrinsics():
    g = make_group()
    g.resize_cameras(0.5)
    assert g.rig.K[0][0, 0] == 450.0
    assert g.rig.size == (512, 384)


def test_undistort_distort_roundtrip():
    g = make_group()
    cam = g.cameras[0]
    pix = np.array([[500.0, 380.0], [620.0, 300.0]])
    norm = cam.undistort_points(pix)
    back = cam.distort_points(norm)
    np.testing.assert_allclose(back, pix, atol=1e-2)


def test_average_error_near_zero_on_clean_projections():
    g = make_group()
    rng = np.random.default_rng(1)
    p3d = rng.normal(0, 200, (40, 3))
    p2d = project_points(g, p3d)
    assert g.average_error(p2d) < 1e-2
    assert g.average_error(p2d, median=True) < 1e-2


def test_triangulate_possible_picks_true_candidates():
    g = make_group()
    rng = np.random.default_rng(2)
    p3d = rng.normal(0, 150, (12, 3))
    pix = project_points(g, p3d)                       # (C, N, 2)
    decoy = pix + rng.uniform(60, 120, pix.shape)
    cands = np.stack([pix, decoy], axis=2)             # (C, N, 2, 2)
    # drop one camera's candidates for a few points
    cands[0, :3] = np.nan

    out, picked, p2_sel, errs = g.triangulate_possible(cands)
    assert out.shape == (12, 3)
    np.testing.assert_allclose(out, p3d, atol=1.0)
    # true candidate (slot 0) picked everywhere a camera participates
    # (with exact projections a camera may be legitimately dropped on a
    # ~zero-error tie, so compare only where camera 1 participates)
    assert picked[..., 0].sum() >= picked[..., 1].sum() * 5
    used = picked[1, :, 0]
    assert used.sum() >= 6
    np.testing.assert_allclose(p2_sel[1][used], pix[1][used], atol=1e-6)


def test_bundle_adjust_recovers_perturbed_extrinsics():
    g = make_group()
    rng = np.random.default_rng(3)
    p3d = rng.normal(0, 220, (120, 3))
    p2d = project_points(g, p3d)

    # perturb two cameras' extrinsics (camera 0 is the gauge anchor)
    g.cameras[1].set_rotation(g.cameras[1].get_rotation() + 0.01)
    g.cameras[2].set_translation(g.cameras[2].get_translation() + 8.0)
    err_before = g.average_error(p2d)
    err_after = g.bundle_adjust(p2d, verbose=False)
    assert err_after < err_before * 0.2
    assert err_after < 1.0


def test_bundle_adjust_iter_anneals_outliers():
    g = make_group()
    rng = np.random.default_rng(4)
    p3d = rng.normal(0, 220, (150, 3))
    p2d = np.array(project_points(g, p3d))  # writable copy
    # 10% gross outliers + mild extrinsic perturbation
    bad = rng.choice(150, 15, replace=False)
    p2d[1, bad] += 300.0
    g.cameras[1].set_rotation(g.cameras[1].get_rotation() + 0.008)

    err = g.bundle_adjust_iter(p2d, n_iters=4, n_samp_full=150,
                               n_samp_iter=80, verbose=False)
    assert err < 2.0  # median is robust to the planted outliers
