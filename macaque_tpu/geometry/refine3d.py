"""Constrained 3D trajectory refinement as matrix-free Levenberg-Marquardt.

TPU-native replacement for aniposelib's ``optim_points`` /
``optim_points_jointlenfix`` (reference: src/third_party/aniposelib/
cameras.py:1116-1270), whose residual model is:

  * soft-L1-robustified reprojection residuals per (camera, frame, joint,
    coord) — ``rp * 2 * (sqrt(1 + |e| / rp) - 1)``  (cameras.py:1591-1599)
  * temporal smoothness — n-th order time differences of the 3D points
    scaled by ``scale_smooth / mean|diff(medfilt(p3d))|`` (cameras.py:1153,
    1601-1602)
  * bone-length consistency — ``100 * (len - expected) / expected`` per
    frame for strong and weak constraint sets (cameras.py:1604-1617), with
    the expected lengths free parameters (or fixed, in jointlenfix mode).

The reference solves this with scipy's sparse TRF (host, single-threaded).
Here the damped steps are solved matrix-free by CGLS on ``J`` itself
(``J v`` via ``jvp``, ``J^T u`` via ``vjp``; see geometry/lm.py for why
CGLS and not CG on the normal equations), with a gain-ratio LM update —
everything jit-compiled, so the entire refinement runs on-device with
static shapes.
"""

from __future__ import annotations

import functools

import numpy as np
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from macaque_tpu.filters.smoothing import interpolate_nan, median_filter_1d


class RefineConfig(NamedTuple):
    scale_smooth: float = 4.0
    scale_length: float = 2.0
    scale_length_weak: float = 0.5
    reproj_error_threshold: float = 15.0
    reproj_loss: str = "soft_l1"
    n_deriv_smooth: int = 1
    # Production iteration budget, set from measured counters (lm_solve
    # return_info) on the noisy 4-cam/2-animal bench scene: the full
    # parity budget (100/300, rtol 1e-4) converges to ~2.5-3 mm of the
    # reference TRF solution with the ftol exit firing at ~80 LM iters;
    # 30/60 @ rtol 1e-3 lands ~9 mm from that solution but IDENTICAL
    # accuracy vs ground truth (median 11.0 vs 10.7 mm) at ~1/17th the
    # device time — the extra iterations only polish toward the
    # reference's exact iterate, not toward the true pose. Golden parity
    # tests (tests/test_golden_step4.py) pass explicit parity-grade
    # overrides (lm=200/cg=500/rtol=1e-5/ftol=1e-6); production keeps
    # the convergence-based budget.
    lm_iters: int = 30
    cg_iters: int = 60
    cg_rtol: float = 1e-3
    ftol: float = 1e-3
    # Initialization guard: DLT occasionally emits meter-scale outlier
    # points (near-parallel rays on a mismatched pair). The reference
    # starts TRF from them anyway and survives because its sparse
    # trust-region steps are near-exact — they move ONLY the wild
    # points. Truncated matrix-free Krylov steps are not: the huge
    # smoothness/length cost of a single 47 m spike (measured on the
    # step4 golden scene: 6.9e10 of a 6.9e10 initial cost) leaks into
    # global low-frequency directions, dragging well-observed points off
    # their observations into the soft-L1 plateau, from which the
    # gradient (~1/sqrt(e)) cannot pull them back. Clamping init points
    # further than this from the median-filtered trajectory to that
    # trajectory removes the spike cost without changing the optimum
    # (verified: converges to the reference TRF solution, ~1 mm median).
    # Same units as the scene (mm); <= 0 disables.
    init_spike_clamp: float = 100.0


def _soft_l1(e: jnp.ndarray, rp: float) -> jnp.ndarray:
    return rp * 2.0 * (jnp.sqrt(1.0 + e / rp) - 1.0)


def _huber(e: jnp.ndarray, rp: float) -> jnp.ndarray:
    return jnp.where(e > rp, rp * (2.0 * jnp.sqrt(e / rp) - 1.0), e)


def _residuals(
    p3ds: jnp.ndarray,            # (F, J, 3)
    joint_lengths: jnp.ndarray,   # (Kc + Kw,)
    cam,
    p2ds: jnp.ndarray,            # (C, F, J, 2)
    valid: jnp.ndarray,           # (C, F, J, 2) bool
    constraints: jnp.ndarray,     # (Kc, 2) int
    constraints_weak: jnp.ndarray,  # (Kw, 2) int
    scale_smooth_full: jnp.ndarray,
    cfg: RefineConfig,
    scores: Optional[jnp.ndarray] = None,
):
    from macaque_tpu.cameras.dispatch import project_points

    C, F, J, _ = p2ds.shape
    flat3d = p3ds.reshape(-1, 3)
    proj = project_points(cam, flat3d).reshape(C, F, J, 2)
    err = jnp.where(valid, jnp.nan_to_num(p2ds) - proj, 0.0)
    if scores is not None:
        err = err * scores[..., None]
    abs_err = jnp.abs(err)
    rp = cfg.reproj_error_threshold
    if cfg.reproj_loss == "soft_l1":
        r_reproj = _soft_l1(abs_err, rp)
    elif cfg.reproj_loss == "huber":
        r_reproj = _huber(abs_err, rp)
    else:
        r_reproj = abs_err
    r_reproj = jnp.where(valid, r_reproj, 0.0)

    r_smooth = jnp.diff(p3ds, n=cfg.n_deriv_smooth, axis=0) * scale_smooth_full

    def length_res(cons, expected, scale):
        if cons.shape[0] == 0:
            return jnp.zeros((0,), p3ds.dtype)
        a = cons[:, 0]
        b = cons[:, 1]
        seg = p3ds[:, a] - p3ds[:, b]            # (F, K, 3)
        lengths = jnp.linalg.norm(seg + 1e-12, axis=-1)  # (F, K)
        rel = 100.0 * (lengths - expected[None, :]) / expected[None, :]
        return (rel.T * scale).ravel()           # (K*F,) constraint-major

    Kc = constraints.shape[0]
    r_len = length_res(constraints, joint_lengths[:Kc], cfg.scale_length)
    r_len_w = length_res(
        constraints_weak, joint_lengths[Kc:], cfg.scale_length_weak
    )
    return jnp.concatenate(
        [r_reproj.ravel(), r_smooth.ravel(), r_len, r_len_w]
    )


def initialize_joint_lengths(
    p3ds: jnp.ndarray, constraints: jnp.ndarray, constraints_weak: jnp.ndarray
) -> jnp.ndarray:
    """Median segment lengths with MAD outlier clamping
    (reference: cameras.py:1670-1699)."""
    def med_len(cons):
        if cons.shape[0] == 0:
            return jnp.zeros((0,), p3ds.dtype)
        seg = p3ds[:, cons[:, 0]] - p3ds[:, cons[:, 1]]
        return jnp.nanmedian(jnp.linalg.norm(seg, axis=-1), axis=0)

    jl = med_len(constraints)
    jlw = med_len(constraints_weak)
    all_l = jnp.concatenate([jl, jlw])
    all_l = jnp.nan_to_num(all_l)
    med = jnp.median(all_l)
    med = jnp.where(med == 0, 1e-3, med)
    mad = jnp.median(jnp.abs(all_l - med))
    out = jnp.where((all_l == 0) | (all_l > med + mad * 5), med, all_l)
    return out


@partial(jax.jit,
         static_argnames=("n_p3d", "cfg", "fix_lengths", "return_info"))
def _lm_solve(
    x0: jnp.ndarray,
    n_p3d: int,
    cam,
    p2ds,
    valid,
    constraints,
    constraints_weak,
    scale_smooth_full,
    cfg: RefineConfig,
    fix_lengths: bool,
    fixed_lengths,
    scores,
    return_info: bool = False,
):
    """Jitted wrapper binding the refinement residuals to the shared
    matrix-free LM-CG engine (geometry/lm.py)."""
    from macaque_tpu.geometry.lm import lm_solve, LMConfig

    F_J3 = n_p3d

    def resid_fn(x):
        p3 = x[:F_J3].reshape(p2ds.shape[1], p2ds.shape[2], 3)
        jl = fixed_lengths if fix_lengths else x[F_J3:]
        return _residuals(
            p3, jl, cam, p2ds, valid, constraints, constraints_weak,
            scale_smooth_full, cfg, scores,
        )

    return lm_solve(
        resid_fn, x0,
        LMConfig(lm_iters=cfg.lm_iters, cg_iters=cfg.cg_iters,
                 cg_rtol=cfg.cg_rtol, ftol=cfg.ftol),
        return_info=return_info,
    )


def refine_points_3d(
    cam,
    p2ds: jnp.ndarray,
    p3ds_init: jnp.ndarray,
    constraints=(),
    constraints_weak=(),
    cfg: RefineConfig = RefineConfig(),
    joint_lengths: Optional[jnp.ndarray] = None,
    scores: Optional[jnp.ndarray] = None,
    return_info: bool = False,
):
    """Refine triangulated 3D keypoints (reference ``optim_points`` /
    ``optim_points_jointlenfix`` entry).

    cam: camera pytree stacked over C cameras.
    p2ds: (C, F, J, 2) observed pixels, NaN = missing.
    p3ds_init: (F, J, 3) initial triangulation (NaNs allowed).
    joint_lengths: if given, lengths are held fixed (jointlenfix mode).
    Returns (p3ds (F, J, 3), joint_lengths (Kc+Kw,)), plus the
    lm_solve info dict when ``return_info`` (iterations actually used —
    the counter production budgets are tuned from).
    """
    constraints = jnp.asarray(constraints, dtype=jnp.int32).reshape(-1, 2)
    constraints_weak = jnp.asarray(constraints_weak, dtype=jnp.int32).reshape(-1, 2)
    F, J, _ = p3ds_init.shape

    # interpolate + median-filter init exactly like the reference
    # (cameras.py:1149-1154)
    flat = p3ds_init.reshape(F, -1)
    interp = jax.vmap(interpolate_nan, in_axes=1, out_axes=1)(flat)
    med = jax.vmap(lambda v: median_filter_1d(v, 7), in_axes=1, out_axes=1)(interp)
    p3ds_intp = interp.reshape(F, J, 3)
    p3ds_med = med.reshape(F, J, 3)
    default_smooth = 1.0 / jnp.mean(jnp.abs(jnp.diff(p3ds_med, axis=0)))
    scale_smooth_full = cfg.scale_smooth * default_smooth

    if cfg.init_spike_clamp > 0:
        # see RefineConfig.init_spike_clamp — snap meter-scale DLT
        # outliers to the median-filtered trajectory before the solve
        dev = jnp.linalg.norm(p3ds_intp - p3ds_med, axis=-1,
                              keepdims=True)
        p3ds_intp = jnp.where(
            dev > cfg.init_spike_clamp, p3ds_med, p3ds_intp)

    jl0 = initialize_joint_lengths(p3ds_intp, constraints, constraints_weak)

    fix_lengths = joint_lengths is not None
    if fix_lengths:
        fixed = jnp.asarray(joint_lengths)
        x0 = p3ds_intp.ravel()
    else:
        fixed = jnp.zeros_like(jl0)
        x0 = jnp.concatenate([p3ds_intp.ravel(), jl0])
    x0 = jnp.nan_to_num(x0)

    valid = ~jnp.isnan(p2ds)

    out = _lm_solve(
        x0, F * J * 3, cam, p2ds, valid, constraints, constraints_weak,
        scale_smooth_full, cfg, fix_lengths, fixed, scores,
        return_info=return_info,
    )
    x, info = out if return_info else (out, None)
    p3 = x[: F * J * 3].reshape(F, J, 3)
    jl = fixed if fix_lengths else x[F * J * 3:]
    return (p3, jl, info) if return_info else (p3, jl)


@partial(jax.jit, static_argnames=("n_p3d", "cfg", "beta"))
def _lm_solve_possible(
    x0: jnp.ndarray,
    n_p3d: int,
    cam,
    p2ds,            # (C, F, J, P, 2), NaN = missing option
    constraints,
    constraints_weak,
    scale_smooth_full,
    cfg: RefineConfig,
    beta: float,
    scores,
):
    from macaque_tpu.geometry.lm import lm_solve, LMConfig

    C, F, J, P, _ = p2ds.shape
    n_len = constraints.shape[0] + constraints_weak.shape[0]
    opt_bad = jnp.isnan(p2ds[..., 0])          # (C, F, J, P)
    all_bad = jnp.all(opt_bad, axis=3)         # (C, F, J)
    valid = (~all_bad)[..., None] & jnp.ones((1, 1, 1, 2), bool)

    def resid_fn(x):
        p3 = x[:n_p3d].reshape(F, J, 3)
        jl = x[n_p3d:n_p3d + n_len]
        alphas = x[n_p3d + n_len:].reshape(C, F, J, P)
        # soft-argmax blend over the P candidate 2D points
        # (reference cameras.py:1646-1659)
        a_exp = jnp.where(opt_bad, 0.0, jnp.exp(beta * alphas))
        a_sum = jnp.where(all_bad, 1.0, jnp.sum(a_exp, axis=3))
        a_norm = a_exp / a_sum[..., None]
        p2_blend = jnp.sum(
            a_norm[..., None] * jnp.nan_to_num(p2ds), axis=3)
        r_main = _residuals(
            p3, jl, cam, p2_blend, valid, constraints, constraints_weak,
            scale_smooth_full, cfg, scores,
        )
        # keep the blend decisive: penalize low std over options
        # (reference cameras.py:1664-1666); masked where all options bad.
        # eps inside the sqrt: plain std is non-differentiable at the
        # uniform init (variance 0 -> NaN gradient kills the LM step)
        var = jnp.mean(
            (a_norm - jnp.mean(a_norm, axis=3, keepdims=True)) ** 2,
            axis=3)
        std = jnp.sqrt(var + 1e-12)
        r_alpha = jnp.where(all_bad, 0.0, (1.0 - std) * 10.0)
        return jnp.concatenate([r_main, r_alpha.ravel()])

    x = lm_solve(
        resid_fn, x0,
        LMConfig(lm_iters=cfg.lm_iters, cg_iters=cfg.cg_iters,
                 ftol=cfg.ftol),
    )
    alphas = x[n_p3d + n_len:].reshape(C, F, J, P)
    a_exp = jnp.where(opt_bad, 0.0, jnp.exp(beta * alphas))
    a_sum = jnp.where(all_bad, 1.0, jnp.sum(a_exp, axis=3))
    a_norm = jnp.where(opt_bad, jnp.nan, a_exp / a_sum[..., None])
    return x, a_norm


def refine_points_3d_possible(
    cam,
    p2ds: jnp.ndarray,
    p3ds_init: jnp.ndarray,
    constraints=(),
    constraints_weak=(),
    cfg: RefineConfig = RefineConfig(),
    beta: float = 5.0,
    scores: Optional[jnp.ndarray] = None,
):
    """Multi-hypothesis 3D refinement (reference ``optim_points_possible``,
    cameras.py:1417-1513): each (camera, frame, joint) observation comes
    with P candidate 2D points; per-candidate mixing weights are free
    parameters blended by a beta-softmax, optimized jointly with the 3D
    trajectory and bone lengths.

    p2ds: (C, F, J, P, 2) candidate pixels, NaN = missing option.
    p3ds_init: (F, J, 3) initial trajectory.
    Returns (p3ds (F, J, 3), alphas_norm (C, F, J, P) — the converged
    soft-argmax weights, NaN where the option was missing).
    """
    constraints = jnp.asarray(constraints, dtype=jnp.int32).reshape(-1, 2)
    constraints_weak = jnp.asarray(
        constraints_weak, dtype=jnp.int32).reshape(-1, 2)
    C, F, J, P, _ = p2ds.shape

    flat = p3ds_init.reshape(F, -1)
    interp = jax.vmap(interpolate_nan, in_axes=1, out_axes=1)(flat)
    med = jax.vmap(lambda v: median_filter_1d(v, 7),
                   in_axes=1, out_axes=1)(interp)
    p3ds_intp = interp.reshape(F, J, 3)
    p3ds_med = med.reshape(F, J, 3)
    default_smooth = 1.0 / jnp.mean(jnp.abs(jnp.diff(p3ds_med, axis=0)))
    scale_smooth_full = cfg.scale_smooth * default_smooth

    jl0 = initialize_joint_lengths(p3ds_intp, constraints,
                                   constraints_weak)
    alphas0 = jnp.zeros((C, F, J, P))
    x0 = jnp.nan_to_num(jnp.concatenate(
        [p3ds_intp.ravel(), jl0, alphas0.ravel()]))

    x, a_norm = _lm_solve_possible(
        x0, F * J * 3, cam, p2ds, constraints, constraints_weak,
        scale_smooth_full, cfg, float(beta), scores,
    )
    return x[: F * J * 3].reshape(F, J, 3), a_norm


def refine_points_3d_batch(
    cam,
    p2ds: jnp.ndarray,
    p3ds_init: jnp.ndarray,
    constraints=(),
    constraints_weak=(),
    cfg: RefineConfig = RefineConfig(),
    joint_lengths: Optional[jnp.ndarray] = None,
):
    """Refine several independent trajectories in ONE device program.

    Semantically identical to calling :func:`refine_points_3d` per animal
    (the reference's per-animal loop, step4:219), but vmapped over the
    leading axis so all solves share one compile + dispatch — the
    sequential per-animal programs dominated the pipeline's host wall
    clock (4 animals = 4 solver launches per recording).

    p2ds: (A, C, F, J, 2); p3ds_init: (A, F, J, 3).
    Returns (p3ds (A, F, J, 3), joint_lengths (A, Kc+Kw)).

    The whole vmapped solve runs under ONE jit (cached per config): an
    eager outer vmap executes primitive-by-primitive, which costs a
    host<->device round trip per op on a remote-tunneled device.
    """
    constraints = tuple(map(tuple, np.asarray(
        constraints, dtype=np.int64).reshape(-1, 2).tolist()))
    constraints_weak = tuple(map(tuple, np.asarray(
        constraints_weak, dtype=np.int64).reshape(-1, 2).tolist()))
    fixed = joint_lengths is not None
    fn = _batched_refine(constraints, constraints_weak, cfg, fixed)
    if fixed:
        return fn(cam, p2ds, p3ds_init, jnp.asarray(joint_lengths))
    return fn(cam, p2ds, p3ds_init)


@functools.lru_cache(maxsize=None)
def _batched_refine(constraints, constraints_weak, cfg, fixed):
    if fixed:
        def run(cam, p2ds, p3ds_init, joint_lengths):
            def one(p2, p3):
                return refine_points_3d(
                    cam, p2, p3, constraints, constraints_weak, cfg,
                    joint_lengths,
                )

            return jax.vmap(one)(p2ds, p3ds_init)
    else:
        def run(cam, p2ds, p3ds_init):
            def one(p2, p3):
                return refine_points_3d(
                    cam, p2, p3, constraints, constraints_weak, cfg, None,
                )

            return jax.vmap(one)(p2ds, p3ds_init)

    return jax.jit(run)
