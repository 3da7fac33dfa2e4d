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
