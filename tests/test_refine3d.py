import numpy as np
import pytest
import jax.numpy as jnp

from macaque_tpu.cameras import omnidir_project, omnidir_undistort
from macaque_tpu.geometry import (
    refine_points_3d,
    RefineConfig,
    triangulate_dlt,
    reprojection_error_mean,
)
from macaque_tpu.geometry.refine3d import initialize_joint_lengths
from tests.test_triangulate import make_rig


def make_walk(F=40, J=4, seed=0):
    """A rigid 'skeleton' of J joints random-walking through the cage."""
    rng = np.random.default_rng(seed)
    offsets = rng.uniform(-120, 120, (J, 3))
    center = np.cumsum(rng.normal(0, 10, (F, 3)), axis=0)
    return center[:, None, :] + offsets[None, :, :]


def project_with_noise(cam, p3d, noise=2.0, miss_frac=0.15, seed=1):
    rng = np.random.default_rng(seed)
    F, J, _ = p3d.shape
    pix = np.array(omnidir_project(cam, jnp.asarray(p3d.reshape(-1, 3))))
    pix = pix.reshape(-1, F, J, 2)
    pix += rng.normal(0, noise, pix.shape)
    miss = rng.uniform(size=pix.shape[:-1]) < miss_frac
    pix[miss] = np.nan
    return pix


def test_refine_improves_over_noisy_triangulation():
    cam = make_rig(4)
    p3d_true = make_walk()
    F, J, _ = p3d_true.shape
    p2d = project_with_noise(cam, p3d_true, noise=3.0)

    und = omnidir_undistort(cam, jnp.asarray(p2d.reshape(4, -1, 2)))
    undT = jnp.swapaxes(und, 0, 1)
    mask = ~jnp.isnan(undT[..., 0])
    p3d_init = np.asarray(
        triangulate_dlt(jnp.nan_to_num(undT), cam.pmat, mask)
    ).reshape(F, J, 3)

    constraints = [[0, 1], [1, 2], [2, 3]]
    cfg = RefineConfig(scale_smooth=3.0, scale_length=5.0,
                       reproj_error_threshold=3.0, n_deriv_smooth=2)
    p3d_ref, jl = refine_points_3d(
        cam, jnp.asarray(p2d), jnp.asarray(p3d_init),
        constraints=constraints, constraints_weak=[[0, 2]], cfg=cfg,
    )
    p3d_ref = np.asarray(p3d_ref)

    err_init = np.nanmean(np.linalg.norm(np.nan_to_num(p3d_init) - p3d_true, axis=-1))
    err_ref = np.nanmean(np.linalg.norm(p3d_ref - p3d_true, axis=-1))
    assert np.isfinite(p3d_ref).all()
    assert err_ref < err_init
    # the smoothness prior biases a 10mm/frame random walk; ~15mm is the
    # objective's optimum here (verified against scipy in the parity test)
    assert err_ref < 20.0

    # recovered bone lengths should be near truth
    jl = np.asarray(jl)
    true_len = [np.linalg.norm(p3d_true[0, a] - p3d_true[0, b])
                for a, b in constraints]
    np.testing.assert_allclose(jl[:3], true_len, rtol=0.1)


def test_refine_fixed_joint_lengths():
    cam = make_rig(4)
    p3d_true = make_walk(F=20, J=3, seed=3)
    p2d = project_with_noise(cam, p3d_true, noise=2.0, miss_frac=0.0, seed=4)
    constraints = [[0, 1], [1, 2]]
    true_len = np.array([
        np.linalg.norm(p3d_true[0, 0] - p3d_true[0, 1]),
        np.linalg.norm(p3d_true[0, 1] - p3d_true[0, 2]),
    ])
    p3d_ref, jl = refine_points_3d(
        cam, jnp.asarray(p2d), jnp.asarray(p3d_true + 5.0),
        constraints=constraints, joint_lengths=jnp.asarray(true_len),
        cfg=RefineConfig(lm_iters=15),
    )
    np.testing.assert_allclose(np.asarray(jl), true_len)
    lengths = np.linalg.norm(
        np.asarray(p3d_ref)[:, [0, 1]] - np.asarray(p3d_ref)[:, [1, 2]], axis=-1
    )
    # fixed-length mode should keep segment lengths close to the fixed values
    assert np.abs(lengths - true_len[None]).max() < 12.0


@pytest.mark.slow
def test_refine_matches_scipy_least_squares():
    """The LM-CG solver must reach the same optimum as scipy TRF on the
    identical residual vector (the reference's solver; cameras.py:1166)."""
    from scipy import optimize
    from macaque_tpu.geometry.refine3d import _residuals
    from macaque_tpu.filters.smoothing import interpolate_nan, median_filter_1d

    cam = make_rig(4)
    p3d_true = make_walk(F=12, J=3, seed=2)
    F, J, _ = p3d_true.shape
    p2d = project_with_noise(cam, p3d_true, noise=3.0, seed=5)
    und = omnidir_undistort(cam, jnp.asarray(p2d.reshape(4, -1, 2)))
    undT = jnp.swapaxes(und, 0, 1)
    mask = ~jnp.isnan(undT[..., 0])
    p3d_init = np.asarray(
        triangulate_dlt(jnp.nan_to_num(undT), cam.pmat, mask)
    ).reshape(F, J, 3)

    cons = jnp.asarray([[0, 1], [1, 2]], jnp.int32)
    consw = jnp.zeros((0, 2), jnp.int32)
    cfg = RefineConfig(scale_smooth=3.0, scale_length=5.0,
                       reproj_error_threshold=3.0, n_deriv_smooth=2,
                       lm_iters=60, cg_iters=120, ftol=1e-8)

    flat = p3d_init.reshape(F, -1)
    interp = np.stack(
        [np.asarray(interpolate_nan(jnp.asarray(flat[:, i])))
         for i in range(flat.shape[1])], 1)
    med = np.stack(
        [np.asarray(median_filter_1d(jnp.asarray(interp[:, i]), 7))
         for i in range(interp.shape[1])], 1)
    ssf = 3.0 / np.mean(np.abs(np.diff(med.reshape(F, J, 3), axis=0)))
    jl0 = np.asarray(initialize_joint_lengths(
        jnp.asarray(interp.reshape(F, J, 3)), cons, consw))
    valid = ~np.isnan(p2d)

    def resid_np(x):
        p3 = jnp.asarray(x[: F * J * 3].reshape(F, J, 3))
        jl = jnp.asarray(x[F * J * 3:])
        return np.asarray(_residuals(
            p3, jl, cam, jnp.asarray(p2d), jnp.asarray(valid),
            cons, consw, ssf, cfg))

    x0 = np.nan_to_num(np.concatenate([interp.ravel(), jl0]))
    res = optimize.least_squares(resid_np, x0, ftol=1e-10, xtol=1e-10,
                                 max_nfev=200)

    p3d_ref, jl = refine_points_3d(
        cam, jnp.asarray(p2d), jnp.asarray(p3d_init),
        constraints=[[0, 1], [1, 2]], cfg=cfg)
    r = resid_np(np.concatenate([np.asarray(p3d_ref).ravel(), np.asarray(jl)]))
    cost_mine = 0.5 * np.dot(r, r)
    assert cost_mine < res.cost * 1.001
    p3d_scipy = res.x[: F * J * 3].reshape(F, J, 3)
    assert np.abs(np.asarray(p3d_ref) - p3d_scipy).mean() < 0.01


def test_initialize_joint_lengths_outlier_clamp():
    p3d = np.zeros((10, 3, 3))
    p3d[:, 1, 0] = 100.0
    p3d[:, 2, 0] = 5000.0  # makes constraint 1 an outlier
    jl = np.asarray(initialize_joint_lengths(
        jnp.asarray(p3d), jnp.asarray([[0, 1], [1, 2]]), jnp.zeros((0, 2), jnp.int32)
    ))
    assert jl[0] == 100.0


def test_refine_points_possible_picks_true_candidates():
    """Multi-hypothesis refinement (reference optim_points_possible,
    cameras.py:1417-1513): each observation offers P candidate pixels;
    the soft-argmax weights must converge onto the true candidate and
    the trajectory must beat the decoy-contaminated init."""
    from macaque_tpu.geometry.refine3d import refine_points_3d_possible

    rng = np.random.default_rng(11)
    cam = make_rig(4)
    p3d_true = make_walk(F=16, J=3, seed=12)
    F, J, _ = p3d_true.shape
    C, P = 4, 3

    pix = np.array(omnidir_project(cam, jnp.asarray(
        p3d_true.reshape(-1, 3)))).reshape(C, F, J, 2)
    cands = np.full((C, F, J, P, 2), np.nan)
    true_slot = rng.integers(0, P, (C, F, J))
    for p in range(P):
        sel = true_slot == p
        decoy = pix + rng.uniform(40, 90, pix.shape) * \
            np.sign(rng.normal(size=pix.shape))
        cands[..., p, :] = np.where(sel[..., None],
                                    pix + rng.normal(0, 0.5, pix.shape),
                                    decoy)
    # drop some options entirely
    drop = rng.uniform(size=(C, F, J, P)) < 0.1
    drop[true_slot[..., None] == np.arange(P)] = False
    cands[drop] = np.nan

    p3d_init = p3d_true + rng.normal(0, 15.0, p3d_true.shape)
    cfg = RefineConfig(scale_smooth=1.0, scale_length=2.0,
                       reproj_error_threshold=8.0, lm_iters=40)
    p3d_ref, alphas = refine_points_3d_possible(
        cam, jnp.asarray(cands), jnp.asarray(p3d_init),
        constraints=[[0, 1], [1, 2]], cfg=cfg,
    )
    p3d_ref = np.asarray(p3d_ref)
    alphas = np.asarray(alphas)

    err_init = np.linalg.norm(p3d_init - p3d_true, axis=-1).mean()
    err_ref = np.linalg.norm(p3d_ref - p3d_true, axis=-1).mean()
    assert np.isfinite(p3d_ref).all()
    assert err_ref < err_init * 0.5, (err_ref, err_init)
    assert err_ref < 12.0, err_ref

    # weights: argmax matches the true slot for a large majority
    pick = np.nanargmax(np.nan_to_num(alphas, nan=-1.0), axis=-1)
    acc = (pick == true_slot).mean()
    assert acc > 0.8, acc
    # weights normalized over available options
    s = np.nansum(alphas, axis=-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-6)


def test_optim_points_possible_facade():
    from macaque_tpu.cameras.rig import CameraRig
    from macaque_tpu.compat.aniposelib import CameraGroup

    cam = make_rig(3)
    rig = CameraRig(
        camera_ids=["0", "1", "2"],
        K=np.asarray(cam.K), xi=np.asarray(cam.xi),
        D=np.asarray(cam.D), rvec=np.asarray(cam.rvec),
        tvec=np.asarray(cam.tvec),
    )
    group = CameraGroup(rig)
    p3d_true = make_walk(F=8, J=2, seed=20)
    pix = np.array(omnidir_project(cam, jnp.asarray(
        p3d_true.reshape(-1, 3)))).reshape(3, 8, 2, 2)
    cands = np.stack([pix, pix + 50.0], axis=3)  # P=2, slot 0 true
    p3, alphas = group.optim_points_possible(
        cands, p3d_true + 5.0, constraints=[[0, 1]])
    assert p3.shape == (8, 2, 3)
    assert alphas.shape == (3, 8, 2, 2)
    assert (np.nanargmax(alphas, axis=-1) == 0).mean() > 0.9
