"""Differential golden test: the REFERENCE's own vendored aniposelib
CameraGroup (/root/reference/src/third_party/aniposelib/cameras.py —
per-point python-loop triangulation, scipy sparse-TRF bundle adjust)
against this repo's ``compat.aniposelib.CameraGroup`` facade, both
loaded from the SAME calibration.toml written by
``CameraRig.to_calibration_toml``.

Environment shims (tests/oracles.py): cv2.omnidir (NumPy Mei model),
numba (pass-through jit — installed BEFORE the aniposelib import, which
applies @jit at module scope), toml.

This pins the L4 compat surface against the reference's executable code
rather than against a re-reading of it: load casing ('omnidir' —
reference from_dicts, cameras.py:1972-1983), project, undistort+DLT
triangulation, reprojection errors, the triangulate_possible
combination search, and the bundle_adjust_iter annealed refinement.
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from macaque_tpu.compat.aniposelib import CameraGroup
from macaque_tpu.cameras import omnidir_project
from macaque_tpu.tools.synthetic import make_test_rig

N_CAM = 4


def _import_reference_aniposelib():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests.oracles import (
        install_cv2_omnidir_shim, install_numba_shim, install_toml_shim,
    )

    install_numba_shim()  # aniposelib applies @jit at module scope
    install_toml_shim()
    install_cv2_omnidir_shim()
    import src.third_party.aniposelib.cameras as ref_cameras

    return ref_cameras


def _make_groups(tmp_path, seed=5, perturb=None):
    """One calibration.toml -> (reference group, our group, rig)."""
    ref_cameras = _import_reference_aniposelib()
    rig = make_test_rig(N_CAM, seed=seed)
    if perturb is not None:
        rng = np.random.default_rng(perturb)
        rig.rvec = np.asarray(rig.rvec) + np.concatenate(
            [np.zeros((1, 3)), rng.normal(0, 0.006, (N_CAM - 1, 3))])
        rig.tvec = np.asarray(rig.tvec) + np.concatenate(
            [np.zeros((1, 3)), rng.normal(0, 20.0, (N_CAM - 1, 3))])
    path = os.path.join(str(tmp_path), "calibration.toml")
    rig.to_calibration_toml(path)
    ref_g = ref_cameras.CameraGroup.load(path)
    our_g = CameraGroup.load(path)
    # load-casing guard: the reference must reconstruct OmnidirCamera
    # (lowercase 'omnidir' key), not fall back to pinhole Camera
    assert all(isinstance(c, ref_cameras.OmnidirCamera)
               for c in ref_g.cameras)
    return ref_g, our_g, rig


def _scene_points(n, seed=0):
    rng = np.random.default_rng(seed)
    return np.column_stack([
        rng.uniform(-600, 600, n), rng.uniform(-600, 600, n),
        rng.uniform(300, 1300, n),
    ])


def test_golden_project_triangulate_errors(tmp_path):
    ref_g, our_g, rig = _make_groups(tmp_path)
    pts = _scene_points(50)

    proj_ref = ref_g.project(pts)          # (C, N, 2)
    proj_our = our_g.project(pts)
    np.testing.assert_allclose(proj_our, proj_ref, atol=1e-6)

    # noisy observations with per-camera dropouts
    rng = np.random.default_rng(1)
    obs = proj_ref + rng.normal(0, 0.2, proj_ref.shape)
    for c in range(N_CAM):
        obs[c, rng.random(len(pts)) < 0.15] = np.nan
    obs[:, 0] = np.nan
    obs[1:, 1] = np.nan  # single camera -> both must yield NaN

    p3_ref = ref_g.triangulate(obs, undistort=True)
    p3_our = our_g.triangulate(obs, undistort=True)
    nan_ref = np.isnan(p3_ref[:, 0])
    assert np.array_equal(nan_ref, np.isnan(p3_our[:, 0]))
    assert nan_ref[0] and nan_ref[1]
    ok = ~nan_ref
    # different DLT formulations (homogeneous SVD vs the reference's
    # eigenvector-of-A^T A triangulate_simple): agreement at the
    # 0.2 px-noise estimator floor (~2 mm at f~260 / 2.8 m)
    d = np.linalg.norm(p3_ref[ok] - p3_our[ok], axis=1)
    assert np.median(d) < 2.0, np.median(d)
    assert np.max(d) < 10.0, np.max(d)

    err_ref = ref_g.reprojection_error(p3_ref[ok], obs[:, ok], mean=True)
    err_our = our_g.reprojection_error(p3_ref[ok], obs[:, ok], mean=True)
    np.testing.assert_allclose(err_our, err_ref, atol=1e-5)

    # average_error wraps triangulate+reprojection_error on each side
    ae_ref = ref_g.average_error(obs[:, ok], median=True)
    ae_our = our_g.average_error(obs[:, ok], median=True)
    assert abs(ae_ref - ae_our) < 0.05, (ae_ref, ae_our)


def test_golden_triangulate_possible(tmp_path):
    ref_g, our_g, rig = _make_groups(tmp_path, seed=6)
    pts = _scene_points(8, seed=2)
    decoy = pts + np.array([250.0, -180.0, 120.0])

    proj = np.asarray(ref_g.project(pts))       # (C, N, 2)
    proj_decoy = np.asarray(ref_g.project(decoy))
    rng = np.random.default_rng(3)
    P = 2
    cand = np.full((N_CAM, len(pts), P, 2), np.nan)
    cand[:, :, 0] = proj + rng.normal(0, 0.1, proj.shape)
    # decoy candidates only in two cameras: consistent choice must win
    cand[0, :, 1] = proj_decoy[0] + rng.normal(0, 0.1, proj[0].shape)
    cand[2, :, 1] = proj_decoy[2] + rng.normal(0, 0.1, proj[2].shape)
    # drop some true candidates entirely
    cand[1, :3, 0] = np.nan
    cand[3, 5:, 0] = np.nan

    p3_ref, picked_ref, p2d_ref, err_ref = ref_g.triangulate_possible(
        cand, undistort=True)
    p3_our, picked_our, p2d_our, err_our = our_g.triangulate_possible(
        cand, undistort=True)

    assert np.array_equal(picked_ref, picked_our)
    both = ~np.isnan(p3_ref[:, 0]) & ~np.isnan(p3_our[:, 0])
    assert np.array_equal(np.isnan(p3_ref[:, 0]), np.isnan(p3_our[:, 0]))
    d = np.linalg.norm(p3_ref[both] - p3_our[both], axis=1)
    assert np.max(d) < 5.0, np.max(d)
    np.testing.assert_allclose(
        np.nan_to_num(p2d_our), np.nan_to_num(p2d_ref), atol=1e-9)
    np.testing.assert_allclose(err_our[both], err_ref[both], atol=0.05)


@pytest.mark.slow
def test_golden_bundle_adjust_iter(tmp_path):
    """Both refiners start from the same perturbed calibration and the
    same noisy observations of the same scene; each must recover the
    geometry to the observation-noise floor, and the two recovered
    calibrations must agree after removing the scale gauge."""
    ref_g, our_g, rig = _make_groups(tmp_path, seed=7, perturb=11)
    truth = make_test_rig(N_CAM, seed=7)
    pts = _scene_points(300, seed=4)
    obs = np.array(omnidir_project(truth.omni(), jnp.asarray(pts)))
    rng = np.random.default_rng(5)
    obs += rng.normal(0, 0.15, obs.shape)
    for c in range(N_CAM):
        obs[c, rng.random(len(pts)) < 0.1] = np.nan

    err_before = our_g.average_error(obs, median=True)
    ref_err = ref_g.bundle_adjust_iter(obs, n_iters=4, verbose=False)
    our_err = our_g.bundle_adjust_iter(obs, n_iters=4, verbose=False)
    assert ref_err < 0.35 and our_err < 0.35, (ref_err, our_err)
    assert our_err < 0.25 * err_before

    import cv2

    def aligned_centers(rv, tv):
        cen = np.stack([-(cv2.Rodrigues(np.asarray(r, float))[0].T
                          @ np.asarray(t, float))
                        for r, t in zip(rv, tv)])
        rel = cen - cen[0]
        return rel / np.mean(np.linalg.norm(rel[1:], axis=1))

    g_ref = aligned_centers(ref_g.get_rotations(), ref_g.get_translations())
    g_our = aligned_centers(our_g.get_rotations(), our_g.get_translations())
    g_true = aligned_centers(np.asarray(truth.rvec), np.asarray(truth.tvec))
    # both sides run the FULL 16-param-per-camera BA (intrinsics too),
    # whose focal<->xi<->depth valley is nearly flat at this scene depth
    # range — camera centers slide ~1% along it per noise realization,
    # and the two refiners subsample points differently. The reprojection
    # floor above is the sharp criterion; geometry agreement is coarse.
    np.testing.assert_allclose(g_our, g_ref, atol=2.5e-2)
    np.testing.assert_allclose(g_our, g_true, atol=2.5e-2)


def test_golden_pinhole(tmp_path):
    """Plain-pinhole calibration.toml (aniposelib Camera.get_dict schema:
    matrix + distortions, no K/xi/D) loaded by both sides: the reference
    reconstructs cv2-backed ``Camera`` objects, this repo maps them onto
    the Mei model with xi=0 (exactly the pinhole model with k1,k2,p1,p2;
    cameras/rig.py from_calibration_toml). Projection must agree to
    1e-6 px and triangulation at the estimator floor."""
    import os

    from macaque_tpu.utils.tomlwriter import dumps_toml

    ref_cameras = _import_reference_aniposelib()
    rig = make_test_rig(N_CAM, seed=9)
    rng = np.random.default_rng(3)

    doc = {}
    for i in range(N_CAM):
        f = 800.0 + 40.0 * i
        doc[f"cam_{i}"] = {
            "name": f"p{i}",
            "size": [1024, 768],
            "matrix": [[f, 0.0, 512.0 + i], [0.0, f * 1.01, 384.0 - i],
                       [0.0, 0.0, 1.0]],
            "distortions": [-0.12 + 0.01 * i, 0.03, 1e-4 * i,
                            -2e-4, 0.0],
            "rotation": np.asarray(rig.rvec)[i].tolist(),
            "translation": np.asarray(rig.tvec)[i].tolist(),
        }
    path = os.path.join(str(tmp_path), "calibration.toml")
    with open(path, "w") as fh:
        fh.write(dumps_toml(doc))

    ref_g = ref_cameras.CameraGroup.load(path)
    assert all(type(c) is ref_cameras.Camera for c in ref_g.cameras)
    our_g = CameraGroup.load(path)

    pts = _scene_points(60, seed=8)
    proj_ref = ref_g.project(pts)
    proj_our = our_g.project(pts)
    np.testing.assert_allclose(
        np.asarray(proj_our, float).reshape(N_CAM, -1, 2),
        np.asarray(proj_ref, float).reshape(N_CAM, -1, 2), atol=1e-6)

    obs = np.asarray(proj_ref, float).reshape(N_CAM, -1, 2)
    obs += rng.normal(0, 0.2, obs.shape)
    for c in range(N_CAM):
        obs[c, rng.random(len(pts)) < 0.1] = np.nan
    p3_ref = ref_g.triangulate(obs, undistort=True)
    p3_our = our_g.triangulate(obs, undistort=True)
    assert np.array_equal(np.isnan(p3_ref[:, 0]), np.isnan(p3_our[:, 0]))
    ok = ~np.isnan(p3_ref[:, 0])
    d = np.linalg.norm(p3_ref[ok] - p3_our[ok], axis=1)
    assert np.median(d) < 2.0, np.median(d)

    err_ref = ref_g.reprojection_error(p3_ref[ok], obs[:, ok], mean=True)
    err_our = our_g.reprojection_error(p3_ref[ok], obs[:, ok], mean=True)
    np.testing.assert_allclose(err_our, err_ref, atol=1e-5)


def test_pinhole_k3_warns_fisheye_rejected(tmp_path):
    """Distortion terms beyond (k1,k2,p1,p2) warn; fisheye sections load
    as the equidistant model (cameras/fisheye.py); mixing fisheye with
    omnidir sections in one rig is rejected with a clear error."""
    import os
    import warnings

    from macaque_tpu.cameras.rig import CameraRig
    from macaque_tpu.utils.tomlwriter import dumps_toml

    base = {
        "name": "c0", "size": [640, 480],
        "matrix": [[500.0, 0.0, 320.0], [0.0, 500.0, 240.0],
                   [0.0, 0.0, 1.0]],
        "rotation": [0.0, 0.0, 0.0], "translation": [0.0, 0.0, 0.0],
    }
    p1 = os.path.join(str(tmp_path), "k3.toml")
    with open(p1, "w") as fh:
        fh.write(dumps_toml({"cam_0": dict(
            base, distortions=[0.1, 0.0, 0.0, 0.0, 0.05])}))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        CameraRig.from_calibration_toml(p1)
    assert any("k1,k2,p1,p2" in str(x.message) for x in w)

    p2 = os.path.join(str(tmp_path), "fish.toml")
    with open(p2, "w") as fh:
        fh.write(dumps_toml({"cam_0": dict(
            base, distortions=[0.1, 0.0, 0.0, 0.0], fisheye=True)}))
    rig = CameraRig.from_calibration_toml(p2)
    assert rig.model == "fisheye"
    np.testing.assert_allclose(rig.D[0], [0.1, 0.0, 0.0, 0.0])

    p3 = os.path.join(str(tmp_path), "mixed.toml")
    with open(p3, "w") as fh:
        fh.write(dumps_toml({
            "cam_0": dict(base, distortions=[0.1, 0.0, 0.0, 0.0],
                          fisheye=True),
            "cam_1": dict(base, name="c1",
                          distortions=[0.0, 0.0, 0.0, 0.0]),
        }))
    with pytest.raises(ValueError, match="mixed camera models"):
        CameraRig.from_calibration_toml(p3)
