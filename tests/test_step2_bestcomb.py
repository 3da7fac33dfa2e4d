"""step2 cluster refinement: when SVT groups two same-camera detections
into one person, get_best_comb must pick the camera detection that
minimizes reprojection RMSE (reference step2:610-658)."""

import os

import numpy as np
import jax.numpy as jnp

from macaque_tpu.cameras import omnidir_project
from macaque_tpu.pipeline.artifacts import write_alldata, read_pickle
from macaque_tpu.pipeline.step2 import run_step2
from macaque_tpu.core.config import CrossViewConfig, VALID_COLLAR_CLASSES
from macaque_tpu.tools.synthetic import make_test_rig, simulate_scene


def test_remnant_pass_handles_same_camera_collision():
    """A merged cluster holding TWO animals plus a duplicate detection (3
    detections in camera 0) must resolve into: parent best = animal A,
    leftover remnant = {B_cam0, Bdup_cam0, B_cam1} -> remnant best picks
    exactly one cam-0 detection (the true one), like the reference's
    extra get_best_comb pass (step2:649-656)."""
    from macaque_tpu.pipeline.step2 import batched_best_combs

    rig = make_test_rig(4, seed=5)
    cam = rig.omni()
    kp3d = simulate_scene(2, 4, seed=6)  # animals A=0, B=1
    # move B close to A so the merged-cluster scenario is geometric too
    kp3d[1] = kp3d[0] + np.array([60.0, 0.0, 0.0])
    J = kp3d.shape[2]
    proj = np.asarray(
        omnidir_project(cam, jnp.asarray(kp3d.reshape(-1, 3)))
    ).reshape(2, 4, rig.n_cam, J, 2)

    t = 1
    rng = np.random.default_rng(1)

    def kp_for(animal, c, shift=0.0):
        pts = proj[animal, t, c] + rng.normal(0, 0.3, (J, 2)) + shift
        return np.concatenate([pts, np.full((J, 1), 0.95)], axis=1)

    # slots: 0=A_cam0 1=B_cam0 2=Bdup_cam0(shifted) 3=A_cam1 4=B_cam1
    #        5=A_cam2 6=A_cam3
    dets = [
        kp_for(0, 0), kp_for(1, 0), kp_for(1, 0, shift=30.0),
        kp_for(0, 1), kp_for(1, 1), kp_for(0, 2), kp_for(0, 3),
    ]
    cam_of = np.array([0, 0, 0, 1, 1, 2, 3])
    pose_np = np.stack(dets)  # (7, J, 3)

    def combo_tensor(ti, slots):
        kp = np.zeros((rig.n_cam, J, 3))
        for s in slots:
            kp[cam_of[s]] = pose_np[s]
        return kp

    cluster = list(range(7))  # everything merged into one cluster
    (best,) = batched_best_combs(
        [(0, cluster)], combo_tensor, cam_of, cam, rig.n_cam
    )
    # parent best must be a consistent one-per-camera set; the globally
    # best combo is all-A (4 views agree)
    assert sorted(best) == [0, 3, 5, 6]

    leftover = sorted(set(cluster) - set(best))
    assert leftover == [1, 2, 4]  # cam0 collision: two B candidates
    (extra,) = batched_best_combs(
        [(0, leftover)], combo_tensor, cam_of, cam, rig.n_cam
    )
    # remnant pass must pick exactly ONE cam-0 detection — the true B,
    # not the 30px-shifted duplicate — plus B in cam 1
    assert sorted(extra) == [1, 4]


def test_best_comb_rejects_wrong_same_camera_detection(tmp_path):
    rig = make_test_rig(4, seed=3)
    kp3d = simulate_scene(1, 40, seed=4)  # one animal
    A, T, J, _ = kp3d.shape
    cam = rig.omni()
    proj = np.asarray(
        omnidir_project(cam, jnp.asarray(kp3d.reshape(-1, 3)))
    ).reshape(rig.n_cam, A, T, J, 2)

    rng = np.random.default_rng(0)
    rd = str(tmp_path / "results" / "s")
    for c, cam_id in enumerate(rig.camera_ids):
        frames = []
        for t in range(T):
            dets = []
            pts = proj[c, 0, t] + rng.normal(0, 0.5, (J, 2))
            x1, y1 = pts.min(axis=0) - 5
            x2, y2 = pts.max(axis=0) + 5
            kp = [[float(x), float(y), 0.95] for x, y in pts]
            dets.append([1, float(x1), float(y1), float(x2), float(y2),
                         kp, int(VALID_COLLAR_CLASSES[0]), 0.95])
            if c == 0:
                # camera 0 contributes a second, shifted (wrong) detection
                # close enough to be pulled into the same cluster
                pts2 = pts + np.array([25.0, 18.0])
                kp2 = [[float(x), float(y), 0.95] for x, y in pts2]
                dets.append([2, float(pts2[:, 0].min() - 5),
                             float(pts2[:, 1].min() - 5),
                             float(pts2[:, 0].max() + 5),
                             float(pts2[:, 1].max() + 5),
                             kp2, -1, 0.0])
            frames.append(dets)
        write_alldata(os.path.join(rd, cam_id), frames,
                      np.arange(T, dtype=np.int32))

    run_step2(rd, rig, CrossViewConfig())
    mk = read_pickle(os.path.join(rd, "match_keyframe.pickle"))
    assert len(mk) >= 2
    picked_true = 0
    total = 0
    for kf in mk:
        for bcomb in kf["bcomb"]:
            if bcomb[0] >= 0:
                total += 1
                picked_true += bcomb[0] == 1  # true detection has 2D id 1
    assert total > 0
    assert picked_true / total > 0.8, (picked_true, total)
    # and reconstructed poses match ground truth
    errs = []
    for kf in mk:
        for p3d in kf["pose3d"]:
            d = np.nanmean(np.linalg.norm(p3d - kp3d[0, kf["frame"]], axis=1))
            errs.append(d)
    assert np.nanmedian(errs) < 20.0
