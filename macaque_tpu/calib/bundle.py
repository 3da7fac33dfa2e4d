"""Omnidir intrinsic calibration + multi-camera bundle adjustment (JAX).

All solvers minimize masked omnidir reprojection residuals with the
shared matrix-free LM-CG engine; the Mei projection
(cameras/omnidir.py) is differentiable, so no finite differences or
hand-coded jacobian sparsity (contrast: reference multicam_toolbox.py:
591-612, 753-777 builds scipy lil_matrix sparsity by hand).

Parameterizations:
  * intrinsics per camera: fx, fy, cx, cy, skew, xi, D[4]  (10)
  * extrinsics per camera: rvec[3], tvec[3]                 (6)
  * full BA: both (16/camera, reference mct:638-824 optimizes the same
    set), plus the shared 3D structure.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from macaque_tpu.cameras.fisheye import FisheyeCamera, fisheye_project
from macaque_tpu.cameras.omnidir import OmnidirCamera, omnidir_project
from macaque_tpu.geometry.lm import lm_solve, LMConfig


def _unpack_K(p):
    fx, fy, cx, cy, s = p[0], p[1], p[2], p[3], p[4]
    z = jnp.zeros(())
    o = jnp.ones(())
    return jnp.stack([
        jnp.stack([fx, s, cx]),
        jnp.stack([z, fy, cy]),
        jnp.stack([z, z, o]),
    ])


def calibrate_intrinsics_omnidir(
    obj_points: np.ndarray,
    img_points: np.ndarray,
    init_f: float = 800.0,
    init_c: Optional[tuple] = None,
    img_size: tuple = (2048, 1536),
    init_rvecs: Optional[np.ndarray] = None,
    init_tvecs: Optional[np.ndarray] = None,
    cfg: LMConfig = LMConfig(lm_iters=300, cg_iters=150, ftol=1e-12),
):
    """Single-camera omnidir (Mei) intrinsic calibration.

    obj_points: (V, N, 3) board points in board frame per view
    img_points: (V, N, 2) detected pixels (NaN = missing)
    Returns (K (3,3), xi, D (4,), rvecs (V,3), tvecs (V,3), rms).

    Replaces ``cv2.omnidir.calibrate`` (reference mct:102) — which this
    environment's OpenCV build lacks — with a direct LM fit of
    fx, fy, cx, cy, skew, xi, D and per-view poses.

    Note: on limited-FOV board data the Mei model has a nearly flat
    focal<->xi gauge valley (the optimum is a *family* of parameter sets
    reprojecting identically on the data); the fit converges to the noise
    floor but the raw fx/xi values are only identifiable with wide-angle
    coverage — same as cv2.omnidir.calibrate.
    """
    V, N, _ = obj_points.shape
    if init_c is None:
        init_c = (img_size[0] / 2, img_size[1] / 2)

    # initial per-view poses: place the board in front of the camera
    rv0 = init_rvecs if init_rvecs is not None else np.zeros((V, 3))
    tv0 = init_tvecs if init_tvecs is not None \
        else np.tile(np.array([0.0, 0.0, 1000.0]), (V, 1))

    x0 = np.concatenate([
        np.array([init_f, init_f, init_c[0], init_c[1], 0.0, 1.0]),
        np.zeros(4),
        rv0.ravel(), tv0.ravel(),
    ])

    obj_j = jnp.asarray(obj_points)
    img_j = jnp.asarray(img_points)
    valid = ~jnp.isnan(img_j[..., 0])

    def resid(x):
        K = _unpack_K(x[:5])
        xi = x[5]
        D = x[6:10]
        rv = x[10 : 10 + 3 * V].reshape(V, 3)
        tv = x[10 + 3 * V :].reshape(V, 3)

        # vmap over views with per-view pose, shared intrinsics
        def proj_view(r, t, pts):
            c = OmnidirCamera(K=K, xi=xi, D=D, rvec=r, tvec=t)
            return omnidir_project(c, pts)

        proj = jax.vmap(proj_view)(rv, tv, obj_j)
        err = jnp.where(valid[..., None], jnp.nan_to_num(img_j) - proj, 0.0)
        return err.ravel()

    x = lm_solve(resid, jnp.asarray(x0), cfg)
    r = resid(x)
    n_obs = int(np.asarray(valid).sum()) * 2
    rms = float(jnp.sqrt(jnp.sum(r ** 2) / max(n_obs, 1)))
    x = np.asarray(x)
    K = np.asarray(_unpack_K(jnp.asarray(x[:5])))
    return (K, float(x[5]), x[6:10],
            x[10 : 10 + 3 * V].reshape(V, 3),
            x[10 + 3 * V :].reshape(V, 3), rms)


def calibrate_intrinsics_fisheye(
    obj_points: np.ndarray,
    img_points: np.ndarray,
    init_f: float = 800.0,
    init_c: Optional[tuple] = None,
    img_size: tuple = (2048, 1536),
    init_rvecs: Optional[np.ndarray] = None,
    init_tvecs: Optional[np.ndarray] = None,
    nd: int = 2,
    # the f<->depth valley of planar views is long and narrow: from a
    # pinhole-seeded (biased) init the solve needs ~400+ accepted steps
    # to walk it (measured: 200 iters stalls 10% off, 600 converges to
    # 0.06% focal error). Calibration is offline — spend the budget.
    cfg: LMConfig = LMConfig(lm_iters=600, cg_iters=400, ftol=1e-15),
):
    """Single-camera equidistant-fisheye intrinsic calibration.

    obj_points: (V, N, 3) board points in board frame per view
    img_points: (V, N, 2) detected pixels (NaN = missing)
    Returns (K (3,3), D (4,), rvecs (V,3), tvecs (V,3), rms).

    The TPU-native stand-in for ``cv2.fisheye.calibrate``: a direct LM
    fit of f (fx=fy), cx, cy, the first ``nd`` Kannala-Brandt
    coefficients, and per-view board poses. Multiple tilted views make
    the focal identifiable (planar-calibration geometry), which the
    group bundle alone cannot do from a pinhole ``initCameraMatrix2D``
    seed — that seed is systematically biased on equidistant images.
    The reference has no fisheye intrinsic driver at all (its generic
    calibrate_rows feeds the biased seed straight into the bundle,
    aniposelib cameras.py:1891-1926)."""
    V, N, _ = obj_points.shape
    if init_c is None:
        init_c = (img_size[0] / 2, img_size[1] / 2)

    rv0 = init_rvecs if init_rvecs is not None else np.zeros((V, 3))
    tv0 = init_tvecs if init_tvecs is not None \
        else np.tile(np.array([0.0, 0.0, 1000.0]), (V, 1))

    x0 = np.concatenate([
        np.array([init_f, init_c[0], init_c[1]]),
        np.zeros(nd),
        rv0.ravel(), tv0.ravel(),
    ])

    obj_j = jnp.asarray(obj_points)
    img_j = jnp.asarray(img_points)
    valid = ~jnp.isnan(img_j[..., 0])

    def resid(x):
        f, cx, cy = x[0], x[1], x[2]
        K = jnp.array([[1.0, 0.0, 0.0],
                       [0.0, 1.0, 0.0],
                       [0.0, 0.0, 1.0]]) * f
        K = K.at[0, 2].set(cx).at[1, 2].set(cy).at[2, 2].set(1.0)
        D = jnp.zeros(4).at[:nd].set(x[3 : 3 + nd])
        rv = x[3 + nd : 3 + nd + 3 * V].reshape(V, 3)
        tv = x[3 + nd + 3 * V :].reshape(V, 3)

        def proj_view(r, t, pts):
            c = FisheyeCamera(K=K, D=D, rvec=r, tvec=t)
            return fisheye_project(c, pts)

        proj = jax.vmap(proj_view)(rv, tv, obj_j)
        err = jnp.where(valid[..., None], jnp.nan_to_num(img_j) - proj, 0.0)
        return err.ravel()

    x = lm_solve(resid, jnp.asarray(x0), cfg)
    r = resid(x)
    n_obs = int(np.asarray(valid).sum()) * 2
    rms = float(jnp.sqrt(jnp.sum(r ** 2) / max(n_obs, 1)))
    x = np.asarray(x)
    K = np.array([[x[0], 0.0, x[1]], [0.0, x[0], x[2]], [0.0, 0.0, 1.0]])
    D = np.zeros(4)
    D[:nd] = x[3 : 3 + nd]
    return (K, D,
            x[3 + nd : 3 + nd + 3 * V].reshape(V, 3),
            x[3 + nd + 3 * V :].reshape(V, 3), rms)


def bundle_adjust_extrinsics(
    rig_K: np.ndarray, rig_xi: np.ndarray, rig_D: np.ndarray,
    rvec0: np.ndarray, tvec0: np.ndarray,
    obs: np.ndarray, points0: np.ndarray,
    fix_cam0: bool = True,
    cfg: LMConfig = LMConfig(lm_iters=50, cg_iters=80, ftol=1e-8),
):
    """Multi-camera extrinsic BA with fixed intrinsics
    (reference ``optimize_extrinsic``, mct:488-636).

    obs: (C, P, 2) observed pixels of P shared 3D points (NaN = unseen)
    points0: (P, 3) initial triangulated points (also optimized)
    Returns (rvecs (C,3), tvecs (C,3), points (P,3), rms).
    """
    C, P, _ = obs.shape
    obs_j = jnp.asarray(obs)
    valid = ~jnp.isnan(obs_j[..., 0])
    Kj, xij, Dj = jnp.asarray(rig_K), jnp.asarray(rig_xi), jnp.asarray(rig_D)
    rv_fixed = jnp.asarray(rvec0[0])
    tv_fixed = jnp.asarray(tvec0[0])

    x0 = np.concatenate([
        rvec0.ravel(), tvec0.ravel(), points0.ravel()
    ])

    def resid(x):
        rv = x[: 3 * C].reshape(C, 3)
        tv = x[3 * C : 6 * C].reshape(C, 3)
        if fix_cam0:
            rv = rv.at[0].set(rv_fixed)
            tv = tv.at[0].set(tv_fixed)
        pts = x[6 * C :].reshape(P, 3)
        cam = OmnidirCamera(K=Kj, xi=xij, D=Dj, rvec=rv, tvec=tv)
        proj = omnidir_project(cam, pts)  # (C, P, 2)
        err = jnp.where(valid[..., None], jnp.nan_to_num(obs_j) - proj, 0.0)
        return err.ravel()

    x = lm_solve(resid, jnp.asarray(x0), cfg)
    r = resid(x)
    n_obs = int(np.asarray(valid).sum()) * 2
    rms = float(jnp.sqrt(jnp.sum(r ** 2) / max(n_obs, 1)))
    x = np.asarray(x)
    return (x[: 3 * C].reshape(C, 3), x[3 * C : 6 * C].reshape(C, 3),
            x[6 * C :].reshape(P, 3), rms)


def bundle_adjust_fisheye(
    rig_K: np.ndarray, rig_D: np.ndarray,
    rvec0: np.ndarray, tvec0: np.ndarray,
    obs: np.ndarray, points0: np.ndarray,
    fix_cam0: bool = True,
    extra_dist: bool = False,
    cfg: LMConfig = LMConfig(lm_iters=60, cg_iters=100, ftol=1e-9),
):
    """Fisheye-rig BA over the reference's FisheyeCamera parameter set:
    rvec, tvec, single focal f (fx=fy), k1 (+ k2 when ``extra_dist``),
    with cx/cy held fixed (reference cameras.py:392-418
    FisheyeCamera.set_params/get_params) + the shared 3D structure.
    Returns (K, D, rvecs, tvecs, points, rms)."""
    C, P, _ = obs.shape
    obs_j = jnp.asarray(obs)
    valid = ~jnp.isnan(obs_j[..., 0])
    rv_fixed = jnp.asarray(rvec0[0])
    tv_fixed = jnp.asarray(tvec0[0])
    K_base = jnp.asarray(rig_K)
    D_base = jnp.asarray(rig_D)

    nd = 2 if extra_dist else 1
    intr0 = np.zeros((C, 1 + nd))
    intr0[:, 0] = (rig_K[:, 0, 0] + rig_K[:, 1, 1]) / 2
    intr0[:, 1:] = rig_D[:, :nd]

    x0 = np.concatenate([
        rvec0.ravel(), tvec0.ravel(), intr0.ravel(), points0.ravel()
    ])
    ni = C * (1 + nd)

    def resid(x):
        rv = x[: 3 * C].reshape(C, 3)
        tv = x[3 * C : 6 * C].reshape(C, 3)
        if fix_cam0:
            rv = rv.at[0].set(rv_fixed)
            tv = tv.at[0].set(tv_fixed)
        intr = x[6 * C : 6 * C + ni].reshape(C, 1 + nd)
        f = intr[:, 0]
        K = K_base.at[:, 0, 0].set(f).at[:, 1, 1].set(f)
        D = D_base.at[:, :nd].set(intr[:, 1:])
        pts = x[6 * C + ni :].reshape(P, 3)
        cam = FisheyeCamera(K=K, D=D, rvec=rv, tvec=tv)
        proj = fisheye_project(cam, pts)
        err = jnp.where(valid[..., None], jnp.nan_to_num(obs_j) - proj, 0.0)
        return err.ravel()

    x = lm_solve(resid, jnp.asarray(x0), cfg)
    r = resid(x)
    n_obs = int(np.asarray(valid).sum()) * 2
    rms = float(jnp.sqrt(jnp.sum(r ** 2) / max(n_obs, 1)))
    x = np.asarray(x)
    intr = x[6 * C : 6 * C + ni].reshape(C, 1 + nd)
    K = np.asarray(rig_K, float).copy()
    K[:, 0, 0] = intr[:, 0]
    K[:, 1, 1] = intr[:, 0]
    D = np.asarray(rig_D, float).copy()
    D[:, :nd] = intr[:, 1:]
    return (K, D, x[: 3 * C].reshape(C, 3), x[3 * C : 6 * C].reshape(C, 3),
            x[6 * C + ni :].reshape(P, 3), rms)


def bundle_adjust_full(
    rig_K: np.ndarray, rig_xi: np.ndarray, rig_D: np.ndarray,
    rvec0: np.ndarray, tvec0: np.ndarray,
    obs: np.ndarray, points0: np.ndarray,
    fix_cam0: bool = True,
    cfg: LMConfig = LMConfig(lm_iters=60, cg_iters=100, ftol=1e-9),
):
    """Full 16-parameter-per-camera BA: rvec, tvec, fx, fy, cx, cy, xi,
    D[4] + structure (reference ``optimize_all_camera_params``,
    mct:638-824). Returns (K, xi, D, rvecs, tvecs, points, rms)."""
    C, P, _ = obs.shape
    obs_j = jnp.asarray(obs)
    valid = ~jnp.isnan(obs_j[..., 0])
    rv_fixed = jnp.asarray(rvec0[0])
    tv_fixed = jnp.asarray(tvec0[0])

    intr0 = np.zeros((C, 10))
    intr0[:, 0] = rig_K[:, 0, 0]
    intr0[:, 1] = rig_K[:, 1, 1]
    intr0[:, 2] = rig_K[:, 0, 2]
    intr0[:, 3] = rig_K[:, 1, 2]
    intr0[:, 4] = rig_K[:, 0, 1]
    intr0[:, 5] = rig_xi
    intr0[:, 6:10] = rig_D

    x0 = np.concatenate([
        rvec0.ravel(), tvec0.ravel(), intr0.ravel(), points0.ravel()
    ])

    def resid(x):
        rv = x[: 3 * C].reshape(C, 3)
        tv = x[3 * C : 6 * C].reshape(C, 3)
        if fix_cam0:
            rv = rv.at[0].set(rv_fixed)
            tv = tv.at[0].set(tv_fixed)
        intr = x[6 * C : 16 * C].reshape(C, 10)
        K = jax.vmap(_unpack_K)(intr[:, :5])
        xi = intr[:, 5]
        D = intr[:, 6:10]
        pts = x[16 * C :].reshape(P, 3)
        cam = OmnidirCamera(K=K, xi=xi, D=D, rvec=rv, tvec=tv)
        proj = omnidir_project(cam, pts)
        err = jnp.where(valid[..., None], jnp.nan_to_num(obs_j) - proj, 0.0)
        return err.ravel()

    x = lm_solve(resid, jnp.asarray(x0), cfg)
    r = resid(x)
    n_obs = int(np.asarray(valid).sum()) * 2
    rms = float(jnp.sqrt(jnp.sum(r ** 2) / max(n_obs, 1)))
    x = np.asarray(x)
    intr = x[6 * C : 16 * C].reshape(C, 10)
    K = np.zeros((C, 3, 3))
    K[:, 0, 0] = intr[:, 0]
    K[:, 1, 1] = intr[:, 1]
    K[:, 0, 2] = intr[:, 2]
    K[:, 1, 2] = intr[:, 3]
    K[:, 0, 1] = intr[:, 4]
    K[:, 2, 2] = 1.0
    return (K, intr[:, 5], intr[:, 6:10],
            x[: 3 * C].reshape(C, 3), x[3 * C : 6 * C].reshape(C, 3),
            x[16 * C :].reshape(P, 3), rms)
