"""Differential golden test: run the REFERENCE's own extrinsic
calibration driver (/root/reference/src/utils/multicam_toolbox.py:488
``optimize_extrinsic`` — undistort -> DLT init -> scipy sparse-TRF
bundle adjustment over normalized image residuals) and this repo's
``calib.workflow.optimize_extrinsics_driver`` (same h5 protocol, LM-CGLS
over full omnidir pixel residuals) on the SAME marker-trace problem,
then compare the recovered camera geometry.

Both write ``cam_extrinsic_optim.h5`` next to their config — each run
gets its own copy of the problem directory.

Gauge note: with camera 0 fixed and the 3D points free, global scale
about camera 0's center is an exact gauge freedom of both objectives
(see tests/test_calib.py), so the comparison removes one scale factor
before asserting camera-center agreement. The two objectives also weigh
residuals differently (normalized vs pixel), so agreement is asserted
to millimetres on a ~5.6 m rig, not bitwise.
"""

import contextlib
import os
import shutil
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from macaque_tpu.calib.workflow import optimize_extrinsics_driver
from macaque_tpu.cameras import omnidir_project
from macaque_tpu.tools.synthetic import make_test_rig

N_CAM = 4
N_FRAME = 125  # reference drops the trailing 5 (mct:503)
NOISE_PX = 0.1


def _import_reference_mct():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests.oracles import install_cv2_omnidir_shim

    install_cv2_omnidir_shim()
    if not hasattr(np, "bool"):  # removed in numpy 2; mct:503 uses it
        np.bool = bool
    if "imgstore" not in sys.modules:  # imported at mct module top, unused here
        sys.modules["imgstore"] = types.ModuleType("imgstore")
    from src.utils import multicam_toolbox as mct

    return mct


@contextlib.contextmanager
def _chdir(path):
    # the reference driver side-writes a debug 'test.mat' into CWD (mct:636)
    old = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(old)


def _make_problem(tmp_path):
    """Synthetic aruco-marker trace through the cage + perturbed
    extrinsic init, written in the reference's h5/yaml protocol
    (marker_trace.h5 + cam_intrinsic.h5 + cam_extrinsic.h5, mct:493-528)."""
    rig = make_test_rig(N_CAM, seed=3)
    rng = np.random.default_rng(7)

    t = np.linspace(0, 4 * np.pi, N_FRAME)
    pts = np.stack([
        600 * np.cos(t) + 80 * np.sin(3 * t),
        600 * np.sin(0.7 * t),
        700 + 350 * np.sin(0.5 * t),
    ], axis=1)  # (F, 3) mm, inside the 5.6 m rig

    obs = np.array(omnidir_project(rig.omni(), jnp.asarray(pts)))  # (C, F, 2)
    obs += rng.normal(0, NOISE_PX, obs.shape)
    # per-camera dropouts, reference convention: x < 0 marks unseen
    # (mct:504-507); keep >=3 cameras per frame so DLT init stays easy
    for c in range(N_CAM):
        drop = rng.random(N_FRAME) < 0.12
        obs[c, drop] = -1.0

    rv_true = np.asarray(rig.rvec)
    tv_true = np.asarray(rig.tvec)
    rv0 = rv_true + np.concatenate(
        [np.zeros((1, 3)), rng.normal(0, 0.008, (N_CAM - 1, 3))])
    tv0 = tv_true + np.concatenate(
        [np.zeros((1, 3)), rng.normal(0, 25.0, (N_CAM - 1, 3))])

    base = os.path.join(tmp_path, "calib")
    cfg_path = rig.to_h5(base)  # config.yaml + cam_intrinsic.h5 (+ optim truth, unused)
    os.remove(os.path.join(base, "cam_extrinsic_optim.h5"))

    import h5py

    with h5py.File(os.path.join(base, "cam_extrinsic.h5"), "w") as f:
        for i, cid in enumerate(rig.camera_ids):
            f[f"/{cid}/rvec"] = rv0[i].reshape(3, 1)
            f[f"/{cid}/tvec"] = tv0[i].reshape(3, 1)
    with h5py.File(os.path.join(base, "marker_trace.h5"), "w") as f:
        for i, cid in enumerate(rig.camera_ids):
            f[f"/{cid}"] = obs[i].astype(np.float64)

    return rig, base, cfg_path, rv_true, tv_true, pts


def _read_optim(base, ids):
    import h5py

    rv, tv = [], []
    with h5py.File(os.path.join(base, "cam_extrinsic_optim.h5"), "r") as f:
        for cid in ids:
            rv.append(np.asarray(f[f"/{cid}/rvec"]).ravel())
            tv.append(np.asarray(f[f"/{cid}/tvec"]).ravel())
    return np.stack(rv), np.stack(tv)


def _centers(rv, tv):
    import cv2

    return np.stack([-(cv2.Rodrigues(r)[0].T @ t) for r, t in zip(rv, tv)])


def _scale_aligned(rv, tv):
    """Camera centers relative to cam0, with the one free scale factor
    normalized out (unit mean distance from cam0)."""
    rel = _centers(rv, tv) - _centers(rv, tv)[0]
    return rel / np.mean(np.linalg.norm(rel[1:], axis=1))


def test_golden_optimize_extrinsic(tmp_path):
    mct = _import_reference_mct()
    tmp_path = str(tmp_path)

    rig, base_ref, cfg_ref, rv_true, tv_true, _ = _make_problem(
        os.path.join(tmp_path, "ref"))
    base_ours = os.path.join(tmp_path, "ours", "calib")
    os.makedirs(os.path.dirname(base_ours), exist_ok=True)
    shutil.copytree(base_ref, base_ours)

    with _chdir(tmp_path):
        mct.optimize_extrinsic(cfg_ref, show_estimated_campos=False,
                               omnidir=True, fixcam0=True)
    optimize_extrinsics_driver(os.path.join(base_ours, "config.yaml"),
                               fix_cam0=True, verbose=False)

    rv_ref, tv_ref = _read_optim(base_ref, rig.camera_ids)
    rv_our, tv_our = _read_optim(base_ours, rig.camera_ids)

    # both must hold camera 0 at its (true) init — exact in the reference
    # (fun() overwrites params, mct:584-586), exact in ours (fix_cam0)
    np.testing.assert_allclose(rv_ref[0], rv_true[0], atol=1e-12)
    np.testing.assert_allclose(rv_our[0], rv_true[0], atol=1e-9)

    # rotations are gauge-free given fixed cam0: direct agreement
    np.testing.assert_allclose(rv_our, rv_ref, atol=2e-4)

    # camera centers agree after removing the scale gauge, and both sit
    # at the truth to the same tolerance (rig radius 2.8 m)
    g_ref = _scale_aligned(rv_ref, tv_ref)
    g_our = _scale_aligned(rv_our, tv_our)
    g_true = _scale_aligned(rv_true, tv_true)
    np.testing.assert_allclose(g_our, g_ref, atol=2e-3)  # ~6 mm on 2.8 m
    np.testing.assert_allclose(g_ref, g_true, atol=2e-3)
    np.testing.assert_allclose(g_our, g_true, atol=2e-3)


def test_golden_undistort_triangulate(tmp_path):
    """The reference's undistort->DLT front half (mct:393-486, camparam
    injection path) against this repo's batched undistort+DLT on the
    same trace: triangulated points must match to sub-mm."""
    mct = _import_reference_mct()
    rig, base, cfg_path, _, _, pts_true = _make_problem(str(tmp_path))

    import h5py

    with h5py.File(os.path.join(base, "marker_trace.h5"), "r") as f:
        pos_2d = [np.asarray(f[f"/{cid}"]) for cid in rig.camera_ids]

    F = pos_2d[0].shape[0] - 5
    frame_use = np.zeros((F, N_CAM), dtype=bool)
    for c in range(N_CAM):
        frame_use[:, c] = pos_2d[c][:F, 0] >= 0.0

    from macaque_tpu.calib.workflow import _load_marker_problem, \
        _triangulate_trace

    obs, K, xi, D, rvec, tvec = _load_marker_problem(
        base, list(rig.camera_ids))
    p_our = _triangulate_trace(obs, K, xi, D, rvec, tvec)

    import cv2

    # both sides triangulate with the same (perturbed-init) extrinsics
    # that cam_extrinsic.h5 carries, exactly as optimize_extrinsic's
    # structure init does (mct:511)
    pmat = [np.hstack([cv2.Rodrigues(rvec[i])[0], tvec[i].reshape(3, 1)])
            for i in range(N_CAM)]
    camparam = {
        "camera_id": list(rig.camera_ids),
        "K": [np.asarray(k) for k in rig.K],
        "xi": [float(x) for x in np.asarray(rig.xi)],
        "D": [np.asarray(d).reshape(1, 4) for d in rig.D],
        "pmat": pmat,
    }
    und = mct.undistortPoints(cfg_path, [p[:F] for p in pos_2d],
                              omnidir=True, camparam=camparam)
    p_ref = mct.triangulatePoints(cfg_path, und, frame_use, False,
                                  camparam=camparam)

    both = ~np.isnan(p_ref[:, 0]) & ~np.isnan(p_our[:, 0])
    assert np.array_equal(np.isnan(p_ref[:, 0]), np.isnan(p_our[:, 0]))
    assert both.sum() > 0.9 * F

    # The two DLT estimators differ in formulation (homogeneous SVD vs
    # the reference's inhomogeneous pinv), so under 0.1 px observation
    # noise (~1 mm at f~260 / 2.8 m) and the perturbed-init extrinsics
    # they disagree at the estimator-noise floor, not bitwise. Each must
    # sit near the truth, and near each other, at that floor.
    err_mutual = np.linalg.norm(p_ref[both] - p_our[both], axis=1)
    err_ref = np.linalg.norm(p_ref[both] - pts_true[:F][both], axis=1)
    err_our = np.linalg.norm(p_our[both] - pts_true[:F][both], axis=1)
    assert np.median(err_mutual) < 2.5, np.median(err_mutual)
    assert np.max(err_mutual) < 8.0, np.max(err_mutual)
    # truth error is dominated by the shared extrinsic-init perturbation
    assert np.median(err_ref) < 30.0 and np.median(err_our) < 30.0
    assert abs(np.median(err_ref) - np.median(err_our)) < 2.5
