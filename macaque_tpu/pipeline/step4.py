"""Stage 4 — 2D Viterbi filtering + robust constrained 3D reconstruction.

Reference: step4_aniposefiltering.py:89-339. Differences in *how*, not
*what*:
  * the Viterbi filter runs as one vmapped lax.scan over
    (animal, camera, joint) instead of a multiprocessing pool per joint
    (filter_pose.py:162-186)
  * triangulation is one batched DLT over all (animal, frame, joint)
  * the constrained refinement is the on-device LM-CG solver
    (geometry/refine3d.py) instead of scipy sparse TRF
Artifacts (kp2d_f.pickle, kp3d.pickle / kp3d_fxdJointLen.pickle,
config.toml, calibration.toml) keep the reference formats.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from macaque_tpu.cameras.rig import CameraRig
from macaque_tpu.cameras.omnidir import omnidir_undistort
from macaque_tpu.core.config import (
    FilterConfig,
    TriangulationConfig,
    PipelineConfig,
    MACAQUE_BODYPARTS,
)
from macaque_tpu.filters.viterbi import viterbi_filter_joints
from macaque_tpu.geometry.refine3d import (
    refine_points_3d_batch, RefineConfig,
)
from macaque_tpu.geometry.triangulate import triangulate_dlt


# Cached jitted device programs. Stage 4's device calls used to run as
# eager vmaps — every primitive dispatched separately, which costs a
# full host<->device round trip each on a remote-tunneled TPU (~31 ms
# measured; the Viterbi filter alone burned ~1.7 s that way while the
# same computation under jit runs in ~1 ms).
import functools


@functools.lru_cache(maxsize=None)
def _viterbi_batched(n_back, offset_threshold, score_threshold):
    import jax

    return jax.jit(jax.vmap(
        lambda p, s: viterbi_filter_joints(
            p, s, n_back, offset_threshold, score_threshold,
        )
    ))


@jax.jit
def _undistort_dlt(cam, flat_ca):
    und = omnidir_undistort(cam, flat_ca)
    undT = jnp.swapaxes(und, 0, 1)               # (N, C, 2)
    mask = ~jnp.isnan(undT[..., 0])
    mask = mask & ~jnp.isnan(jnp.swapaxes(flat_ca, 0, 1)[..., 0])
    return triangulate_dlt(jnp.nan_to_num(undT), cam.pmat, mask)
from macaque_tpu.geometry.ransac import triangulate_ransac
from macaque_tpu.pipeline.artifacts import read_pickle, write_pickle, stage_done
from macaque_tpu.pipeline.geometry3d import reproject_poses


def _get_median(points: np.ndarray, ix: int) -> np.ndarray:
    pts = points[:, ix]
    pts = pts[~np.isnan(pts[:, 0])]
    return np.median(pts, axis=0)


def correct_coordinate_frame(points: np.ndarray, bodyparts, axes_spec,
                             ref_point: str):
    """Rotate/center the 3D frame from reference bodyparts (reference
    step4:43-87): first axis from a left/right pair, second orthogonalized,
    third by a right-handed cross product; origin at the reference part."""
    bp = {b: i for i, b in enumerate(bodyparts)}
    ax = dict(zip("xyz", range(3)))
    (a_dirx, a_l, a_r), (b_dirx, b_l, b_r) = axes_spec
    a_dir, b_dir = ax[a_dirx], ax[b_dirx]
    c_dir = int(np.setdiff1d([0, 1, 2], [a_dir, b_dir])[0])

    a_diff = _get_median(points, bp[a_r]) - _get_median(points, bp[a_l])
    b_raw = _get_median(points, bp[b_r]) - _get_median(points, bp[b_l])
    b_diff = b_raw - a_diff * np.dot(a_diff, b_raw) / np.dot(a_diff, a_diff)

    M = np.zeros((3, 3))
    M[a_dir] = a_diff
    M[b_dir] = b_diff
    if (a_dir, b_dir) in [(0, 1), (2, 0), (1, 2)]:
        M[c_dir] = np.cross(a_diff, b_diff)
    else:
        M[c_dir] = np.cross(b_diff, a_diff)
    M /= np.linalg.norm(M, axis=1)[:, None]

    adj = points @ M.T
    center = _get_median(adj, bp[ref_point])
    return adj - center, M, center


def run_step4(
    result_dir: str,
    rig: CameraRig,
    pipeline_cfg: Optional[PipelineConfig] = None,
    filter_cfg: FilterConfig = FilterConfig(),
    tri_cfg: TriangulationConfig = TriangulationConfig(),
    joint_len_path: Optional[str] = None,
    axes_spec=None,
    ref_point: Optional[str] = None,
    redo: bool = False,
    mesh=None,
    refine_overrides: Optional[dict] = None,
) -> str:
    """refine_overrides: optional RefineConfig field overrides (e.g.
    tighter lm_iters/ftol for validation runs; see RefineConfig)."""
    pc = pipeline_cfg or PipelineConfig()
    fixed_mode = joint_len_path is not None and os.path.exists(joint_len_path)
    out_name = "kp3d_fxdJointLen.pickle" if fixed_mode else "kp3d.pickle"
    out_path = os.path.join(result_dir, out_name)
    if stage_done(out_path) and not redo:
        print(f"[step4] skip (exists): {out_path}")
        return out_path

    # materialize anipose-compatible configs (reference step4:101-138)
    pc.to_anipose_config_toml(os.path.join(result_dir, "config.toml"))
    rig.to_calibration_toml(os.path.join(result_dir, "calibration.toml"),
                            halve_mtx=True)

    from macaque_tpu.core.mesh import put_batch_sharded, put_replicated

    kp2d = np.asarray(read_pickle(os.path.join(result_dir, "kp2d.pickle")))
    n_animal, n_frame, n_cam, n_kp, _ = kp2d.shape
    cam = put_replicated(rig.omni(), mesh)

    # ---------------- 2D Viterbi filter, batched over (animal, cam)
    print("[step4] 2D viterbi filtering...", flush=True)
    pts = kp2d[..., :2]                  # (A, T, C, J, 2)
    scs = kp2d[..., 2]
    # (animal, camera) streams are independent -> shard them over the mesh
    pts_b, n_ac = put_batch_sharded(
        pts.transpose(0, 2, 1, 3, 4).reshape(-1, n_frame, n_kp, 1, 2), mesh
    )
    scs_b, _ = put_batch_sharded(
        scs.transpose(0, 2, 1, 3).reshape(-1, n_frame, n_kp, 1), mesh
    )
    vf = _viterbi_batched(filter_cfg.n_back,
                          filter_cfg.offset_threshold,
                          filter_cfg.score_threshold)
    f_pts, f_scs = vf(pts_b, scs_b)
    f_pts = np.asarray(f_pts)[:n_ac].reshape(
        n_animal, n_cam, n_frame, n_kp, 2)
    f_scs = np.asarray(f_scs)[:n_ac].reshape(
        n_animal, n_cam, n_frame, n_kp)

    # kp2d_f in the reference layout (n_frame, n_kp, n_animal, 3, n_cam)
    kp2d_f = np.concatenate([f_pts, f_scs[..., None]], axis=-1)
    kp2d_f_ref = kp2d_f.transpose(2, 3, 0, 4, 1)
    write_pickle(os.path.join(result_dir, "kp2d_f.pickle"), kp2d_f_ref)

    # ---------------- 3D reconstruction per animal
    print("[step4] 3D reconstruction...", flush=True)
    constraints = pc.constraints()
    constraints_weak = pc.constraints_weak()
    joint_len_fixed = None
    if fixed_mode:
        jl = np.load(joint_len_path)
        joint_len_fixed = np.median(jl, axis=0)

    kp3d = np.zeros((n_animal, n_frame, n_kp, 3))
    E = np.zeros((n_animal, n_frame, n_kp))
    S = np.zeros((n_animal, n_frame, n_kp))
    joint_len_out = []

    rcfg = RefineConfig(
        scale_smooth=tri_cfg.scale_smooth,
        scale_length=tri_cfg.scale_length,
        scale_length_weak=tri_cfg.scale_length_weak,
        reproj_error_threshold=tri_cfg.reproj_error_threshold,
        n_deriv_smooth=tri_cfg.n_deriv_smooth,
    )
    if refine_overrides:
        rcfg = rcfg._replace(**refine_overrides)

    # threshold + undistort + DLT for ALL animals in one batched program
    # (semantically the reference's per-animal loop, step4:219, but a
    # single dispatch — sequential per-animal solver launches dominated
    # the pipeline wall clock)
    points_all = f_pts.copy()                    # (A, C, T, J, 2)
    bad_all = f_scs < tri_cfg.score_threshold
    points_all[bad_all] = np.nan
    # point axis (A*T*J) is the parallel axis here; cameras stay together
    flat_ca, n_pt = put_batch_sharded(
        np.swapaxes(points_all, 0, 1).reshape(n_cam, -1, 2), mesh, axis=1
    )
    if tri_cfg.ransac:
        p3d_init_all, _, _, _ = triangulate_ransac(cam, flat_ca)
    else:
        p3d_init_all = _undistort_dlt(cam, flat_ca)
    p3d_init_all = np.asarray(p3d_init_all)[:n_pt].reshape(
        n_animal, n_frame, n_kp, 3)

    do_refine = np.array([
        tri_cfg.optim and np.isfinite(p3d_init_all[a, ..., 0]).sum() >= 20
        for a in range(n_animal)
    ])
    # Batch-solve ONLY the animals that refine. Empty (all-NaN) lanes —
    # unused animal slots — have NaN cost, so their `done` flag never
    # fires and they drag the whole vmapped while_loop to the full
    # lm_iters x cg_iters budget (a 4-slot scene with 2 animals paid
    # ~2x; the BENCH_r03 step4_3d regression was partly this).
    refine_pos = {a: i for i, a in enumerate(np.where(do_refine)[0])}
    if refine_pos:
        sel = np.where(do_refine)[0]
        p2d_sh, n_a = put_batch_sharded(points_all[sel], mesh)
        p3d_sh, _ = put_batch_sharded(p3d_init_all[sel], mesh)
        p3d_ref_all, jl_all = refine_points_3d_batch(
            cam, p2d_sh, p3d_sh,
            constraints=constraints, constraints_weak=constraints_weak,
            cfg=rcfg,
            joint_lengths=(
                jnp.asarray(joint_len_fixed) if fixed_mode else None
            ),
        )
        p3d_ref_all = np.asarray(p3d_ref_all)[:n_a]
        jl_all = np.asarray(jl_all)
        if jl_all.ndim > 1:
            jl_all = jl_all[:n_a]

    # ONE batched reprojection for all animals: through a
    # remote-tunneled device every host fetch costs a full round trip
    # (measured 0.29 s RTT inflating step4 to 1.9 s, round 5), so the
    # per-animal reproject calls are folded into a single device
    # program + fetch. Same math per point; golden-pinned by
    # tests/test_golden_step4.py.
    p3d_final = np.empty((n_animal, n_frame, n_kp, 3))
    for a in range(n_animal):
        p3d_final[a] = (p3d_ref_all[refine_pos[a]] if do_refine[a]
                        else p3d_init_all[a])
    p3d_in, n_fr = put_batch_sharded(p3d_final.reshape(-1, n_kp, 3), mesh)
    proj_all = np.asarray(reproject_poses(cam, p3d_in))[:n_fr].reshape(
        n_animal, n_frame, n_cam, n_kp, 2).transpose(0, 2, 1, 3, 4)

    for a in range(n_animal):
        points = points_all[a]
        scores = f_scs[a].copy()
        p3d = p3d_final[a]
        if do_refine[a]:
            joint_len_out.append(
                jl_all[refine_pos[a]] if jl_all.ndim > 1 else jl_all)
            min_cams = 1
        else:
            min_cams = 2

        # reprojection errors + scores (reference step4:276-319)
        proj = proj_all[a]
        err = np.linalg.norm(points - proj, axis=-1)  # (C, T, J)
        good = ~np.isnan(points[..., 0])
        denom = good.sum(axis=0).astype(float)
        errs = np.where(
            denom >= 1, np.nansum(np.where(good, err, 0), axis=0)
            / np.maximum(denom, 1), np.nan
        )
        sc = scores.copy()
        sc[~good] = 2
        scores_3d = sc.min(axis=0)
        scores_3d[denom < min_cams] = np.nan
        errs[denom < min_cams] = np.nan

        if axes_spec is not None and ref_point is not None:
            p3d, _, _ = correct_coordinate_frame(
                p3d, MACAQUE_BODYPARTS, axes_spec, ref_point
            )
        kp3d[a] = p3d
        E[a] = errs
        S[a] = scores_3d

    if joint_len_out and not fixed_mode:
        np.save(os.path.join(result_dir, "joint_len.npy"),
                np.stack(joint_len_out))

    write_pickle(out_path, {
        "kp3d": kp3d, "kp3d_score": S, "kp3d_err": E,
        "joint_len": joint_len_out,
    })
    return out_path
