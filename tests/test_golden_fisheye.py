"""Differential golden test: the REFERENCE's own vendored aniposelib
FisheyeCamera / fisheye CameraGroup (cv2.fisheye-backed; reference:
src/third_party/aniposelib/cameras.py:339-421, selected per project by
``calibration.fisheye = true``, anipose calibrate.py:181) against this
repo's JAX equidistant model (``cameras/fisheye.py``) and the
``compat.aniposelib`` facade, both loaded from the SAME
calibration.toml.

cv2.fisheye is real in this environment (no shim) — only the numba and
toml module shims are needed to import the reference's cameras.py.

Pins: per-camera project / distort_points / undistort_points, the TOML
load casing (``fisheye = true`` -> FisheyeCamera on the reference side,
model="fisheye" rig here), dump round-trip, group triangulation with
NaN patterns, reprojection errors, and bundle_adjust_iter over the
reference's fisheye parameter set (rvec/tvec/f/k1, cameras.py:392-418).
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from macaque_tpu.cameras import CameraRig
from macaque_tpu.cameras.fisheye import (
    FisheyeCamera, fisheye_project, fisheye_undistort,
)
from macaque_tpu.compat.aniposelib import CameraGroup

N_CAM = 4


def _import_reference_aniposelib():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests.oracles import install_numba_shim, install_toml_shim

    install_numba_shim()
    install_toml_shim()
    import src.third_party.aniposelib.cameras as ref_cameras

    return ref_cameras


def make_fisheye_rig(n_cam: int = N_CAM, seed: int = 0) -> CameraRig:
    """Cameras on a ring of radius ~2 m looking at the origin, 640x480
    equidistant lenses with mild Kannala-Brandt distortion."""
    import cv2

    rng = np.random.default_rng(seed)
    K = np.zeros((n_cam, 3, 3))
    D = np.zeros((n_cam, 4))
    rvec = np.zeros((n_cam, 3))
    tvec = np.zeros((n_cam, 3))
    for i in range(n_cam):
        f = 380.0 + 25.0 * rng.random()
        K[i] = [[f, 0.0, 320.0 + rng.normal(0, 4)],
                [0.0, f * (1 + rng.normal(0, 0.01)),
                 240.0 + rng.normal(0, 4)],
                [0.0, 0.0, 1.0]]
        D[i] = [-0.02 + rng.normal(0, 0.005), 0.008 + rng.normal(0, 0.002),
                rng.normal(0, 5e-4), rng.normal(0, 1e-4)]
        ang = 2 * np.pi * i / n_cam
        center = np.array([2000.0 * np.cos(ang), 2000.0 * np.sin(ang),
                           600.0 + 150.0 * rng.random()])
        z = -center / np.linalg.norm(center)  # look at the origin
        up = np.array([0.0, 0.0, -1.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])  # world->camera rows
        rvec[i] = cv2.Rodrigues(R)[0].ravel()
        tvec[i] = -R @ center
    return CameraRig(
        camera_ids=[str(10000 + i) for i in range(n_cam)],
        K=K, xi=np.zeros(n_cam), D=D, rvec=rvec, tvec=tvec,
        size=(640, 480), model="fisheye",
    )


def _scene_points(n, seed=0):
    rng = np.random.default_rng(seed)
    return np.column_stack([
        rng.uniform(-500, 500, n), rng.uniform(-500, 500, n),
        rng.uniform(100, 900, n),
    ])


def _make_groups(tmp_path, seed=3, perturb=None):
    ref_cameras = _import_reference_aniposelib()
    rig = make_fisheye_rig(seed=seed)
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
    # load-casing guard: 'fisheye = true' must reconstruct FisheyeCamera
    # on the reference side (from_dicts, cameras.py:1975-1977) and a
    # model="fisheye" rig here
    assert all(isinstance(c, ref_cameras.FisheyeCamera)
               for c in ref_g.cameras)
    assert our_g.rig.model == "fisheye"
    return ref_g, our_g, rig


def test_fisheye_project_undistort_vs_cv2():
    """The JAX kernel against cv2.fisheye directly (round-trip too)."""
    import cv2

    rig = make_fisheye_rig(seed=1)
    pts = _scene_points(200, seed=2)
    cam = FisheyeCamera(K=jnp.asarray(rig.K), D=jnp.asarray(rig.D),
                        rvec=jnp.asarray(rig.rvec),
                        tvec=jnp.asarray(rig.tvec))
    ours = np.asarray(fisheye_project(cam, jnp.asarray(pts)))
    for i in range(N_CAM):
        ref, _ = cv2.fisheye.projectPoints(
            pts.reshape(-1, 1, 3), rig.rvec[i], rig.tvec[i],
            rig.K[i], rig.D[i])
        np.testing.assert_allclose(ours[i], ref.reshape(-1, 2),
                                   rtol=0, atol=1e-8)
        ref_u = cv2.fisheye.undistortPoints(
            ref.reshape(-1, 1, 2), rig.K[i], rig.D[i]).reshape(-1, 2)
        our_u = np.asarray(fisheye_undistort(
            FisheyeCamera(K=jnp.asarray(rig.K[i]), D=jnp.asarray(rig.D[i]),
                          rvec=jnp.asarray(rig.rvec[i]),
                          tvec=jnp.asarray(rig.tvec[i])),
            jnp.asarray(ref.reshape(-1, 2))))
        np.testing.assert_allclose(our_u, ref_u, rtol=0, atol=1e-10)

    # NaN propagation (the pipeline's missing-value convention; cv2 has
    # no equivalent so this is ours alone)
    bad = np.array([[np.nan, 10.0], [5.0, np.nan]])
    out = np.asarray(fisheye_undistort(cam, jnp.asarray(
        np.tile(bad[None], (N_CAM, 1, 1)))))
    assert np.isnan(out).all()


def test_golden_fisheye_camera_ops(tmp_path):
    """Per-camera accessor parity vs the reference's FisheyeCamera."""
    ref_g, our_g, rig = _make_groups(tmp_path)
    pts = _scene_points(60, seed=5)
    norm = np.column_stack([np.linspace(-0.6, 0.6, 40),
                            np.linspace(0.5, -0.5, 40)])
    for rc, oc in zip(ref_g.cameras, our_g.cameras):
        np.testing.assert_allclose(oc.project(pts).reshape(-1, 2),
                                   rc.project(pts).reshape(-1, 2),
                                   rtol=0, atol=1e-7)
        np.testing.assert_allclose(oc.distort_points(norm),
                                   rc.distort_points(norm),
                                   rtol=0, atol=1e-7)
        px = rc.project(pts).reshape(-1, 2)
        np.testing.assert_allclose(oc.undistort_points(px),
                                   rc.undistort_points(px),
                                   rtol=0, atol=1e-9)


def test_golden_fisheye_group_triangulate(tmp_path):
    ref_g, our_g, rig = _make_groups(tmp_path)
    pts = _scene_points(80, seed=6)
    ref_p = ref_g.project(pts)
    our_p = our_g.project(pts)
    np.testing.assert_allclose(our_p.reshape(N_CAM, -1, 2),
                               ref_p.reshape(N_CAM, -1, 2),
                               rtol=0, atol=1e-7)

    obs = np.array(our_p, float).reshape(N_CAM, -1, 2)
    rng = np.random.default_rng(7)
    obs[rng.random(obs.shape[:2]) < 0.2] = np.nan
    obs[:2, 0] = np.nan  # point 0: only 2 cams left
    obs[1:, 1] = np.nan  # point 1: single camera -> NaN output

    ref_t = ref_g.triangulate(obs, progress=False)
    our_t = our_g.triangulate(obs)
    assert np.isnan(our_t[:, 0]).tolist() == np.isnan(ref_t[:, 0]).tolist()
    good = ~np.isnan(ref_t[:, 0])
    np.testing.assert_allclose(our_t[good], ref_t[good], rtol=0, atol=1e-4)
    np.testing.assert_allclose(our_t[good], pts[good], rtol=0, atol=1e-3)

    ref_err = ref_g.reprojection_error(ref_t, obs, mean=True)
    our_err = our_g.reprojection_error(our_t, obs, mean=True)
    np.testing.assert_allclose(
        our_err[good], ref_err[good], rtol=0, atol=1e-5)

    # dump round-trip keeps the fisheye casing
    out = os.path.join(str(tmp_path), "dumped.toml")
    our_g.dump(out)
    again = CameraGroup.load(out)
    assert again.rig.model == "fisheye"
    np.testing.assert_allclose(again.rig.K, our_g.rig.K)
    np.testing.assert_allclose(again.rig.D, our_g.rig.D)


@pytest.mark.slow
def test_golden_fisheye_bundle_adjust_iter(tmp_path):
    """Both refiners start from the same perturbed fisheye calibration
    and identical noisy observations; each must reach the
    observation-noise reprojection floor and agree on the gauge-aligned
    geometry."""
    ref_g, our_g, rig = _make_groups(tmp_path, seed=3, perturb=13)
    truth = make_fisheye_rig(seed=3)
    pts = _scene_points(300, seed=8)
    obs = np.array(fisheye_project(
        truth.camera(), jnp.asarray(pts)), dtype=float)
    rng = np.random.default_rng(9)
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
    np.testing.assert_allclose(g_our, g_ref, atol=2.5e-2)
    np.testing.assert_allclose(g_our, g_true, atol=2.5e-2)
