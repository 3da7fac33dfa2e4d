"""Cage-keypoint labeling tool (calib/labeler.py): state machine,
annotation row protocol, and headless guard."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from macaque_tpu.calib.labeler import CageLabeler, label_cage_keypoints


def test_labeler_state_machine():
    kp3d = np.arange(12.0).reshape(4, 3)
    lab = CageLabeler(kp3d)
    assert lab.current == 0 and lab.n_labeled == 0

    lab.add_point(100, 200)
    assert lab.n_labeled == 1
    assert lab.points[0].tolist() == [1, 100, 200]

    # W/S clamp at the ends
    assert lab.next_kp() == 1
    lab.add_point(50, 60)
    lab.prev_kp()
    lab.prev_kp()
    assert lab.current == 0
    for _ in range(10):
        lab.next_kp()
    assert lab.current == 3

    # middle-click removes only the current keypoint
    lab.current = 1
    lab.remove_point()
    assert lab.n_labeled == 1
    assert lab.points[1, 0] == 0

    rows = lab.rows()
    assert rows.shape == (4, 6)
    np.testing.assert_array_equal(rows[:, 3:], kp3d)
    assert rows[0, :3].tolist() == [1, 100, 200]


def test_labeler_resume_from_existing():
    kp3d = np.zeros((3, 3))
    prev = np.array([[1, 10, 20, 0, 0, 0],
                     [0, 0, 0, 0, 0, 0],
                     [1, 30, 40, 0, 0, 0]], float)
    lab = CageLabeler(kp3d, initial=prev)
    assert lab.n_labeled == 2
    assert lab.points[2].tolist() == [1, 30, 40]


def test_labeler_draw_marks_points():
    lab = CageLabeler(np.zeros((2, 3)))
    lab.add_point(320, 240)
    img = np.zeros((480, 640, 3), np.uint8)
    out = lab.draw(img)
    assert out.shape == img.shape
    assert (img == 0).all()          # input untouched
    assert out[:, :, 2].sum() > 0    # red marker drawn


def test_label_cage_keypoints_headless_guard(tmp_path, monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    with pytest.raises(RuntimeError, match="display"):
        label_cage_keypoints(str(tmp_path / "config.yaml"))


def test_rows_feed_extrinsics_pipeline(tmp_path):
    """Labeler rows -> save_cage_annotations -> PnP extrinsics: the
    full calibration hand-off the GUI feeds (reference mct:118-242)."""
    import h5py
    import jax.numpy as jnp
    import yaml

    from macaque_tpu.calib.workflow import (
        save_cage_annotations, get_extrinsics_from_cage_keypoints,
    )
    from macaque_tpu.cameras import omnidir_project
    from macaque_tpu.tools.synthetic import make_test_rig

    rig = make_test_rig(2, seed=9)
    # 8 cage corners as the keypoint set
    kp3d = np.array([[x, y, z] for x in (-800, 800.0)
                     for y in (-800, 800.0) for z in (0, 1200.0)])
    cfg = {
        "camera_id": [str(c) for c in rig.camera_ids],
        "img_size": [640, 480],
    }
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    with h5py.File(str(tmp_path / "cam_intrinsic.h5"), "w") as f:
        for i, cid in enumerate(rig.camera_ids):
            g = f.create_group(str(cid))
            g["mtx"] = rig.mtx[i]
            g["dist"] = np.zeros((1, 5))
            g["K"] = rig.K[i]
            g["xi"] = np.array([[rig.xi[i]]])
            g["D"] = rig.D[i].reshape(1, -1)

    data = {}
    for i, cid in enumerate(rig.camera_ids):
        lab = CageLabeler(kp3d)
        # "click" the pinhole projections at display scale (the tool
        # stores 640-wide coords; extrinsics PnP rescales by
        # img_size/640 — here img_size == display size)
        import cv2 as _cv2

        R, _ = _cv2.Rodrigues(rig.rvec[i])
        Xc = kp3d @ R.T + rig.tvec[i]
        uv = (Xc[:, :2] / Xc[:, 2:3]) @ rig.mtx[i][:2, :2].T \
            + rig.mtx[i][:2, 2]
        for j, (u, v) in enumerate(uv):
            lab.current = j
            lab.add_point(float(u), float(v))
        data[str(cid)] = lab.rows()

    save_cage_annotations(cfg_path, data)
    out = get_extrinsics_from_cage_keypoints(cfg_path, verbose=False)
    with h5py.File(out, "r") as f:
        for i, cid in enumerate(rig.camera_ids):
            rvec = np.asarray(f[f"/{cid}/rvec"]).ravel()
            tvec = np.asarray(f[f"/{cid}/tvec"]).ravel()
            np.testing.assert_allclose(rvec, rig.rvec[i], atol=1e-3)
            np.testing.assert_allclose(tvec, rig.tvec[i], atol=2.0)
