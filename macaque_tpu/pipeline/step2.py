"""Stage 2 — cross-view keyframe matching, batched on device.

Pipeline (reference step2_crossviewmatching.py:854-959 + MultiEstimator
:493-713), re-architected for TPU:

  1. per-camera collar-ID voting over 2D tracklets (host, vectorized)
  2. pack every 12th frame's detections into fixed-size tensors
     (slot = camera * max_det + k)
  3. ONE device program undistorts all keypoints, builds the ray-distance
     affinity, blends collar-ID agreement, and runs SVT matching for ALL
     keyframes at once (keyframes are independent: the reference's
     temporal-continuity matrix is computed but never used, step2:563-575;
     likewise the spectral init X0 is never passed to matchSVT,
     step2:577-595)
  4. cluster extraction + per-camera best-combination refinement: all
     candidate combos across all keyframes triangulate in one batched
     device call and are scored by reprojection RMSE (reference
     get_best_comb, step2:610-646)
  5. final 3D poses per matched person -> match_keyframe.pickle
"""

from __future__ import annotations

import itertools
import os
import jax
import jax.numpy as jnp
import numpy as np

from macaque_tpu.association.affinity import geometry_affinity, combined_affinity
from macaque_tpu.association.svt import match_svt
from macaque_tpu.cameras.omnidir import omnidir_undistort
from macaque_tpu.cameras.rig import CameraRig
from macaque_tpu.core.config import CrossViewConfig
from macaque_tpu.pipeline.artifacts import read_alldata, write_pickle, stage_done
from macaque_tpu.pipeline.geometry3d import triangulate_poses, reprojection_rmse
from macaque_tpu.pipeline.idvote import collar_ids_per_camera


def pack_keyframes(
    alldata: list[list], cid2d: list[dict], keyframes: np.ndarray,
    n_cam: int, max_det: int, n_kp: int,
):
    """Pad per-keyframe detections into fixed tensors.

    Returns dict with pose (T, M, J, 3), valid (T, M), cids (T, M),
    bbox_ids (T, M) (2D track id, -1 pad), cam_idx (M,)."""
    T = len(keyframes)
    M = n_cam * max_det
    pose = np.full((T, M, n_kp, 3), np.nan)
    valid = np.zeros((T, M), bool)
    cids = np.full((T, M), -1, int)
    bids = np.full((T, M), -1, int)
    cam_idx = np.repeat(np.arange(n_cam), max_det)
    overflow = 0
    for ti, f in enumerate(keyframes):
        for cam in range(n_cam):
            dets = alldata[cam][f]
            if len(dets) > max_det:
                overflow += len(dets) - max_det
            for k, det in enumerate(dets[:max_det]):
                slot = cam * max_det + k
                pose[ti, slot] = np.asarray(det[5], float)
                valid[ti, slot] = True
                bids[ti, slot] = det[0]
                cid_arr = cid2d[cam].get(det[0])
                cids[ti, slot] = int(cid_arr[f]) if cid_arr is not None else -1
    if overflow:
        print(f"[step2] warning: {overflow} detections dropped by max_det")
    return {
        "pose": pose, "valid": valid, "cids": cids,
        "bbox_ids": bids, "cam_idx": cam_idx,
    }


def batched_best_combs(candidates, combo_tensor, cam_of, cam, n_cam,
                       mesh=None):
    """Batched get_best_comb (reference step2:610-646).

    For each ``(ti, person_slots)`` candidate, enumerate
    one-detection-per-camera combos, triangulate + reprojection-score ALL
    combos of ALL candidates in one device call, and return the
    argmin-RMSE slot list per candidate. ``combo_tensor(ti, slots)``
    materializes the padded (n_cam, J, 3) keypoint tensor for a combo.
    Handles any number of same-camera detections per candidate (the
    collision case the leftover-remnant pass must survive)."""
    combo_kp, combo_meta = [], []  # meta: (candidate_idx, combo)
    for ci, (ti, person) in enumerate(candidates):
        cam_groups = [
            [s for s in person if cam_of[s] == c] or [None]
            for c in range(n_cam)
        ]
        combos = list(itertools.product(*cam_groups))
        if len(combos) > 1:
            for combo in combos:
                slots = [s for s in combo if s is not None]
                combo_kp.append(combo_tensor(ti, slots))
                combo_meta.append((ci, combo))
    if combo_kp:
        from macaque_tpu.core.mesh import put_batch_sharded

        kp_all, n_combo = put_batch_sharded(np.stack(combo_kp), mesh)
        p3d_all = triangulate_poses(cam, kp_all)  # (NC, J, 3)
        use_cam, _ = put_batch_sharded(np.stack(
            [(~np.isnan(k[:, :, 0])).any(axis=1) for k in combo_kp]
        ), mesh)
        rmse_all = np.asarray(
            reprojection_rmse(cam, p3d_all, kp_all, use_cam)
        )[:n_combo]
        rmse_all = np.where(
            np.asarray(use_cam)[:n_combo].any(axis=1), rmse_all, np.inf
        )
    else:
        rmse_all = np.zeros((0,))
    lookup: dict[int, list] = {}
    for gi, (ci, combo) in enumerate(combo_meta):
        lookup.setdefault(ci, []).append((gi, combo))
    out = []
    for ci, (ti, person) in enumerate(candidates):
        entries = lookup.get(ci, [])
        if not entries:  # single combo: the person IS the combo
            out.append(list(person))
        else:
            errs = [rmse_all[gi] for gi, _ in entries]
            _, combo_best = entries[int(np.argmin(errs))]
            out.append([s for s in combo_best if s is not None])
    return out


def _extract_clusters(match_mat: np.ndarray, valid: np.ndarray):
    """Reference cluster extraction (step2:597-607): columns with >= 2
    members, each row joins its argmax column's cluster."""
    mm = match_mat * (valid[:, None] & valid[None, :])
    col_sums = mm.sum(axis=0)
    cols = np.where(col_sums > 1.9)[0]
    if cols.size == 0:
        return []
    binm = mm[:, cols] > 0.9
    clusters = [[] for _ in range(cols.size)]
    for row in range(binm.shape[0]):
        if binm[row].sum() != 0:
            clusters[int(np.argmax(binm[row]))].append(row)
    return [np.asarray(c) for c in clusters]


@jax.jit
def _affinity_program(cam, cam_idx, pose, valid, cids, alpha_id):
    per_det_cam = cam.__class__(*[f[cam_idx] for f in cam])
    und = omnidir_undistort(per_det_cam, pose[..., :2])
    scores = jnp.nan_to_num(pose[..., 2])
    geo = geometry_affinity(cam, jnp.nan_to_num(und), scores, cam_idx,
                            valid)
    return combined_affinity(geo, cids, cam_idx, alpha_id)


def run_step2(
    result_dir: str,
    rig: CameraRig,
    cfg: CrossViewConfig = CrossViewConfig(),
    max_det: int = 6,
    redo: bool = False,
    mesh=None,
) -> str:
    out_path = os.path.join(result_dir, "match_keyframe.pickle")
    if stage_done(out_path) and not redo:
        print(f"[step2] skip (exists): {out_path}")
        return out_path

    n_cam = rig.n_cam
    alldata, fnums = [], []
    for cam_id in rig.camera_ids:
        d, fn = read_alldata(os.path.join(result_dir, str(cam_id)))
        alldata.append(d)
        fnums.append(fn)
    n_frame = len(alldata[0])

    cid2d = [
        collar_ids_per_camera(alldata[c], n_frame, cfg.cid_thr,
                              cfg.id_vote_window)
        for c in range(n_cam)
    ]

    keyframes = np.arange(1, n_frame - cfg.keyframe_stride,
                          cfg.keyframe_stride)
    if keyframes.size == 0:
        write_pickle(out_path, [])
        return out_path

    packed = pack_keyframes(alldata, cid2d, keyframes, n_cam, max_det,
                            cfg.n_joint)
    from macaque_tpu.core.mesh import put_batch_sharded, put_replicated

    cam = put_replicated(rig.omni(), mesh)
    cam_idx = put_replicated(jnp.asarray(packed["cam_idx"]), mesh)
    # keyframes are independent -> shard the keyframe axis over the mesh
    pose, n_kf = put_batch_sharded(packed["pose"], mesh)
    valid, _ = put_batch_sharded(packed["valid"], mesh)
    cids, _ = put_batch_sharded(packed["cids"], mesh)

    # ---- device: undistort + affinity + SVT over all keyframes at once
    # (one jitted program — eager execution would dispatch every
    # primitive through a separate host<->device round trip)
    W = _affinity_program(cam, cam_idx, pose, valid, cids,
                          jnp.float32(cfg.alpha_id))
    same_cam = packed["cam_idx"][:, None] == packed["cam_idx"][None, :]
    match = np.asarray(match_svt(
        W, put_replicated(jnp.asarray(same_cam), mesh),
        alpha=cfg.alpha_svt, _lambda=cfg.lambda_svt,
        dual_stochastic=cfg.dual_stochastic_svt, valid=valid,
        block_size=max_det,
    ))[:n_kf]

    # ---- host: clusters + combo enumeration; combos triangulate batched
    valid_np = packed["valid"]
    pose_np = packed["pose"]
    cam_of = packed["cam_idx"]

    def combo_tensor(ti, slots):
        kp = np.zeros((n_cam, cfg.n_joint, 3))
        for s in slots:
            kp[cam_of[s]] = pose_np[ti, s]
        return kp

    def best_combs(candidates):
        return batched_best_combs(candidates, combo_tensor, cam_of, cam,
                                  n_cam, mesh=mesh)

    parents = []  # (ti, person_slots) in keyframe-then-cluster order
    for ti in range(len(keyframes)):
        for person in _extract_clusters(match[ti], valid_np[ti]):
            parents.append((ti, list(person)))

    parent_best = best_combs(parents)

    # leftover remnants get ONE extra best-comb pass of their own
    # (reference step2:649-656: refined.append(get_best_comb(leftover))
    # right after the parent; leftovers-of-leftovers are dropped)
    remnants, remnant_of = [], []
    for ci, ((ti, person), best) in enumerate(zip(parents, parent_best)):
        leftover = sorted(set(person) - set(best))
        if len(leftover) > 1:
            remnants.append((ti, leftover))
            remnant_of.append(ci)
    remnant_best = best_combs(remnants) if remnants else []
    extra_by_parent = dict(zip(remnant_of, remnant_best))

    # assemble in reference order (parent, then its remnant); persons with
    # < 2 views are dropped at the final stage (step2:698-700)
    finals = []  # (ti, slots)
    for ci, ((ti, _), best) in enumerate(zip(parents, parent_best)):
        if len(best) >= 2:
            finals.append((ti, best))
        extra = extra_by_parent.get(ci)
        if extra is not None and len(extra) >= 2:
            finals.append((ti, extra))

    if finals:
        kp_fin, n_fin = put_batch_sharded(
            np.stack([combo_tensor(ti, slots) for ti, slots in finals]),
            mesh,
        )
        p3d_fin = np.asarray(triangulate_poses(cam, kp_fin))[:n_fin]
    else:
        p3d_fin = np.zeros((0, cfg.n_joint, 3))

    per_kf: dict[int, list] = {ti: [] for ti in range(len(keyframes))}
    for (ti, slots), p3d in zip(finals, p3d_fin):
        bcomb = -np.ones(n_cam, int)
        for s in slots:
            bcomb[cam_of[s]] = packed["bbox_ids"][ti, s]
        per_kf[ti].append((bcomb, p3d))

    match_keyframes = []
    for ti, f in enumerate(keyframes):
        match_keyframes.append({
            "frame": int(f),
            "bcomb": [b for b, _ in per_kf[ti]],
            "pose3d": [p for _, p in per_kf[ti]],
        })

    write_pickle(out_path, match_keyframes)
    return out_path
