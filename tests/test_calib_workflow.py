"""Calibration-from-video workflow tests.

Synthetic end-to-end: render chessboard views with known intrinsics,
write real videos, run the detection + intrinsic drivers; synthesize a
marker trace from a known rig and run the extrinsic/full bundle
adjustment drivers; exercise aruco detection on rendered markers, the
annotation frame extractor, and the row-merging machinery.
(Reference behaviours: multicam_toolbox.py:22-116, 244-391, 488-824,
826-918, 942-975; aniposelib/boards.py:57-235, 306-347.)
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import h5py  # noqa: E402
import yaml  # noqa: E402

from macaque_tpu.calib.videos import (  # noqa: E402
    Checkerboard, detect_board_images, detect_board_video,
    estimate_pose_rows, extract_points, extract_rtvecs, merge_rows,
)
from macaque_tpu.calib import workflow as wf  # noqa: E402


# --------------------------------------------------------------------------
# rendering helpers
# --------------------------------------------------------------------------

IMG_W, IMG_H = 640, 480
K_GT = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]])


def board_bitmap(cols=9, rows=6, px=40):
    """Canonical chessboard image: (cols+1)x(rows+1) squares plus a
    white border; corner (i, j) sits at pixel ((i+1)*px, (j+1)*px)."""
    sq_x, sq_y = cols + 1, rows + 1
    img = np.full(((sq_y + 2) * px, (sq_x + 2) * px), 255, np.uint8)
    for y in range(sq_y):
        for x in range(sq_x):
            if (x + y) % 2 == 0:
                img[(y + 1) * px:(y + 2) * px,
                    (x + 1) * px:(x + 2) * px] = 0
    return img


def render_board_view(rvec, tvec, square=23.0, cols=9, rows=6, px=40):
    """Render the board seen by a pinhole camera at (rvec, tvec): warp
    the canonical bitmap by H = K [r1 r2 t] composed with the
    bitmap->board-plane scaling."""
    R = cv2.Rodrigues(np.asarray(rvec, float))[0]
    H_plane = K_GT @ np.column_stack([R[:, 0], R[:, 1],
                                      np.asarray(tvec, float).ravel()])
    # bitmap pixel -> board mm: corner (0,0) sits at bitmap (2px, 2px)
    # (one border square + the first pattern square)
    S = np.array([[square / px, 0, -2 * square],
                  [0, square / px, -2 * square],
                  [0, 0, 1.0]])
    H = H_plane @ S
    return cv2.warpPerspective(board_bitmap(cols, rows, px), H,
                               (IMG_W, IMG_H),
                               borderValue=255)


def board_poses(n=8, seed=0):
    rng = np.random.default_rng(seed)
    poses = []
    for _ in range(n):
        rvec = np.array([np.pi, 0, 0]) + rng.uniform(-0.35, 0.35, 3)
        tvec = np.array([rng.uniform(-60, -30), rng.uniform(-40, 0),
                         rng.uniform(520, 700)])
        poses.append((rvec, tvec))
    return poses


# --------------------------------------------------------------------------
# board detection + intrinsic calibration
# --------------------------------------------------------------------------


def test_render_detect_roundtrip():
    board = Checkerboard(9, 6, 23.0)
    rvec, tvec = board_poses(1)[0]
    img = render_board_view(rvec, tvec)
    corners, ids = board.detect_image(img)
    assert corners is not None and corners.shape == (54, 2)
    # detected corners must match the direct projection sub-pixel-ly
    obj = board.object_points()
    proj, _ = cv2.projectPoints(obj.reshape(-1, 1, 3),
                                np.asarray(rvec), np.asarray(tvec),
                                K_GT, np.zeros(5))
    proj = proj.reshape(-1, 2)
    # findChessboardCorners picks its own canonical start corner, so
    # compare as point sets (ordering consistency is validated by the
    # intrinsic recovery test below)
    d = np.linalg.norm(corners[:, None] - proj[None], axis=2)
    assert d.min(axis=1).mean() < 0.7
    assert d.min(axis=0).mean() < 0.7


@pytest.mark.slow
def test_chessboard_video_to_intrinsics(tmp_path):
    cfg_dir = tmp_path
    vid_dir = cfg_dir / "chessboard"
    vid_dir.mkdir()
    cam_ids = [101, 102]
    for seed, cid in enumerate(cam_ids):
        poses = board_poses(8, seed=seed)
        vw = cv2.VideoWriter(str(vid_dir / f"{cid}.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 24,
                             (IMG_W, IMG_H))
        for rvec, tvec in poses:
            fr = render_board_view(rvec, tvec)
            vw.write(cv2.cvtColor(fr, cv2.COLOR_GRAY2BGR))
        vw.release()

    cfg_path = cfg_dir / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({
            "camera_id": cam_ids,
            "chessboard_vid_folder": "chessboard",
            "chessboard_square_size": 23,
            "img_size": [IMG_W, IMG_H],
        }, f)

    pts_h5 = wf.analyze_chessboard_videos(str(cfg_path), frame_intv=1,
                                          verbose=False)
    with h5py.File(pts_h5, "r") as f:
        for cid in cam_ids:
            imp = np.asarray(f[f"/{cid}/imp"])
            objp = np.asarray(f[f"/{cid}/objp"])
            assert imp.shape[0] >= 6 and imp.shape[1:] == (54, 1, 2)
            assert objp.shape[1:] == (54, 3)

    intr_h5 = wf.calibrate_intrinsics_driver(str(cfg_path),
                                             verbose=False)
    with h5py.File(intr_h5, "r") as f:
        for cid in cam_ids:
            mtx = np.asarray(f[f"/{cid}/mtx"])
            K = np.asarray(f[f"/{cid}/K"])
            assert abs(mtx[0, 0] - 600) / 600 < 0.05, mtx
            assert abs(mtx[0, 2] - 320) < 25 and abs(mtx[1, 2] - 240) < 25
            assert K.shape == (3, 3) and np.isfinite(K).all()
            assert np.asarray(f[f"/{cid}/xi"]).shape == (1, 1)
            assert np.asarray(f[f"/{cid}/D"]).shape == (1, 4)


def test_detect_board_video_burst_sampling(tmp_path):
    """After a detection, the next skip//2 frames are scanned densely
    (reference boards.py:316-341 'go' logic)."""
    board = Checkerboard(9, 6, 23.0)
    poses = board_poses(6, seed=3)
    frames = []
    for i in range(12):
        if 4 <= i < 10:  # board visible only mid-video
            rvec, tvec = poses[i - 4]
            frames.append(cv2.cvtColor(render_board_view(rvec, tvec),
                                       cv2.COLOR_GRAY2BGR))
        else:
            frames.append(np.full((IMG_H, IMG_W, 3), 255, np.uint8))
    vf = str(tmp_path / "v.mp4")
    vw = cv2.VideoWriter(vf, cv2.VideoWriter_fourcc(*"mp4v"), 24,
                         (IMG_W, IMG_H))
    for fr in frames:
        vw.write(fr)
    vw.release()

    rows = detect_board_video(vf, board, skip=4)
    nums = [r["framenum"] for r in rows]
    # frame 4 sampled (multiple of 4), then 5/6 via the burst counter
    assert 4 in nums and 5 in nums
    assert all(r["filled"].shape == (54, 2) for r in rows)


# --------------------------------------------------------------------------
# row merging machinery
# --------------------------------------------------------------------------


def _fake_row(framenum, board, rvec, tvec, drop=()):
    obj = board.object_points()
    proj, _ = cv2.projectPoints(obj.reshape(-1, 1, 3),
                                np.asarray(rvec, float),
                                np.asarray(tvec, float), K_GT,
                                np.zeros(5))
    filled = proj.reshape(-1, 2)
    corners = filled.copy()
    filled = filled.copy()
    for d in drop:
        filled[d] = np.nan
    return {"framenum": framenum, "corners": corners, "ids": None,
            "filled": filled, "rvec": np.asarray(rvec, float),
            "tvec": np.asarray(tvec, float)}


def test_merge_rows_and_extract():
    board = Checkerboard(9, 6, 23.0)
    p = board_poses(3, seed=1)
    rows_a = [_fake_row(0, board, *p[0]), _fake_row(2, board, *p[1])]
    rows_b = [_fake_row(2, board, *p[1], drop=(5,)),
              _fake_row(4, board, *p[2])]
    merged = merge_rows([rows_a, rows_b], cam_names=["a", "b"])
    assert len(merged) == 3
    assert set(merged[0]) == {"a"} and set(merged[1]) == {"a", "b"}

    imgp, extra = extract_points(merged, board, cam_names=["a", "b"],
                                 min_cameras=2)
    # only framenum 2 is seen by both cameras; corner 5 dropped in b
    assert imgp.shape == (2, 53, 2)
    assert extra["objp"].shape == (53, 3)
    assert (extra["ids"] == 1).all()

    rtv = extract_rtvecs(merged, cam_names=["a", "b"], min_cameras=2)
    assert rtv.shape == (2, 1, 6)
    np.testing.assert_allclose(rtv[0, 0, :3], p[1][0])


def test_estimate_pose_rows():
    board = Checkerboard(9, 6, 23.0)
    rvec, tvec = board_poses(1, seed=5)[0]
    img = render_board_view(rvec, tvec)
    rows = detect_board_images([img], board)
    rows = estimate_pose_rows(rows, board, K_GT, np.zeros(5))
    assert rows[0]["rvec"] is not None
    # the detector's canonical corner ordering relabels the board frame
    # (up to a 180deg rotation), so compare the board CENTER in camera
    # coordinates — invariant under that relabeling
    center = board.object_points().mean(axis=0)

    def cam_center(rv, tv):
        R = cv2.Rodrigues(np.asarray(rv, float))[0]
        return R @ center + np.asarray(tv, float).ravel()

    got = cam_center(rows[0]["rvec"], rows[0]["tvec"])
    np.testing.assert_allclose(got, cam_center(rvec, tvec), atol=2.0)


# --------------------------------------------------------------------------
# aruco marker tracing
# --------------------------------------------------------------------------


def _render_marker_view(rvec, tvec, marker_len, marker_id=7, px=200):
    aruco = cv2.aruco
    dic = aruco.getPredefinedDictionary(aruco.DICT_4X4_50)
    mk = aruco.generateImageMarker(dic, marker_id, px)
    h = marker_len / 2.0
    R = cv2.Rodrigues(np.asarray(rvec, float))[0]
    Hm = K_GT @ np.column_stack([R[:, 0], R[:, 1],
                                 np.asarray(tvec, float).ravel()])
    S = np.array([[marker_len / px, 0, -h], [0, -marker_len / px, h],
                  [0, 0, 1.0]])
    img = cv2.warpPerspective(mk, Hm @ S, (IMG_W, IMG_H),
                              borderValue=255)
    return cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)


def test_trace_marker_video_synthetic():
    marker_len = 175.0
    rng = np.random.default_rng(2)
    frames, expected = [], []
    for i in range(4):
        rvec = np.array([np.pi, 0, 0]) + rng.uniform(-0.2, 0.2, 3)
        tvec = np.array([rng.uniform(-150, 150),
                         rng.uniform(-100, 100),
                         rng.uniform(900, 1400)])
        frames.append(_render_marker_view(rvec, tvec, marker_len))
        uv = K_GT @ (tvec / tvec[2])
        expected.append(uv[:2])
    frames.append(np.full((IMG_H, IMG_W, 3), 255, np.uint8))  # no marker

    trace = wf._trace_marker_video(frames, K_GT, np.zeros(5),
                                   marker_len)
    assert trace.shape == (5, 2)
    assert (trace[-1] == -1).all()
    np.testing.assert_allclose(trace[:4], np.stack(expected), atol=3.0)


# --------------------------------------------------------------------------
# extrinsic bundle-adjustment drivers (synthetic marker trace)
# --------------------------------------------------------------------------


def _make_rig(n_cam=3):
    """Omnidir cameras on a circle looking at the origin."""
    from macaque_tpu.calib.graph_init import get_rtvec

    K = np.tile(K_GT, (n_cam, 1, 1))
    xi = np.full(n_cam, 0.3)
    D = np.tile(np.array([-0.05, 0.01, 0.0, 0.0]), (n_cam, 1))
    rvec = np.zeros((n_cam, 3))
    tvec = np.zeros((n_cam, 3))
    for i in range(n_cam):
        ang = 2 * np.pi * i / n_cam
        pos = np.array([2200 * np.cos(ang), 2200 * np.sin(ang), 700.0])
        z = -pos / np.linalg.norm(pos)          # look at origin
        x = np.cross(np.array([0.0, 0, 1]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])                  # world->cam rows
        M = np.eye(4)
        M[:3, :3] = R
        M[:3, 3] = -R @ pos
        rvec[i], tvec[i] = get_rtvec(M)
    return K, xi, D, rvec, tvec


def _project_rig(K, xi, D, rvec, tvec, pts):
    import jax.numpy as jnp

    from macaque_tpu.cameras.omnidir import omnidir_project
    from macaque_tpu.cameras.rig import CameraRig

    rig = CameraRig(camera_ids=[str(i) for i in range(len(K))],
                    K=K, xi=xi, D=D, rvec=rvec, tvec=tvec)
    return np.asarray(omnidir_project(rig.omni(), jnp.asarray(pts)))


def _write_marker_problem(base, cam_ids, K, xi, D, rvec_init, tvec_init,
                          trace):
    with h5py.File(os.path.join(base, "marker_trace.h5"), "w") as f:
        for i, cid in enumerate(cam_ids):
            f.create_dataset(f"/{cid}", data=trace[i])
    with h5py.File(os.path.join(base, "cam_intrinsic.h5"), "w") as f:
        for i, cid in enumerate(cam_ids):
            f.create_dataset(f"/{cid}/K", data=K[i])
            f.create_dataset(f"/{cid}/xi", data=np.array([[xi[i]]]))
            f.create_dataset(f"/{cid}/D", data=D[i].reshape(1, 4))
            f.create_dataset(f"/{cid}/mtx", data=K[i])
            f.create_dataset(f"/{cid}/dist", data=np.zeros((1, 5)))
    with h5py.File(os.path.join(base, "cam_extrinsic.h5"), "w") as f:
        for i, cid in enumerate(cam_ids):
            f.create_dataset(f"/{cid}/rvec",
                             data=rvec_init[i].reshape(3, 1))
            f.create_dataset(f"/{cid}/tvec",
                             data=tvec_init[i].reshape(3, 1))


@pytest.fixture
def marker_scene(tmp_path):
    K, xi, D, rvec, tvec = _make_rig(3)
    cam_ids = ["201", "202", "203"]
    rng = np.random.default_rng(4)
    t = np.linspace(0, 4 * np.pi, 120)
    pts = np.stack([700 * np.cos(t), 700 * np.sin(t),
                    300 + 250 * np.sin(t * 0.7)], axis=1)
    proj = _project_rig(K, xi, D, rvec, tvec, pts)  # (C, F, 2)
    trace = proj + rng.normal(0, 0.2, proj.shape)
    # some missing detections + the 5-frame tail the driver drops
    trace[0, 10:14] = -1
    trace[2, 50:53] = -1

    # perturb init extrinsics of cams 1..2 (cam0 stays = world anchor)
    rvec_i = rvec.copy()
    tvec_i = tvec.copy()
    rvec_i[1:] += rng.normal(0, 0.02, (2, 3))
    tvec_i[1:] += rng.normal(0, 30.0, (2, 3))

    cfg = tmp_path / "config.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump({"camera_id": [int(c) for c in cam_ids],
                        "img_size": [IMG_W, IMG_H]}, f)
    _write_marker_problem(str(tmp_path), cam_ids, K, xi, D,
                          rvec_i, tvec_i, trace)
    return str(cfg), cam_ids, (K, xi, D, rvec, tvec)


def _campos_errors(h5_path, cam_ids, K, xi, D, rvec_gt, tvec_gt,
                   scale_align=False):
    """Camera-position errors vs ground truth; with ``scale_align`` the
    comparison is up to a global scale about camera 0 — a marker-trace
    BA pins cam0's pose but carries no metric anchor, so overall scale
    is a gauge freedom (in the reference solver too, mct:488-636)."""
    pos, gt = [], []
    with h5py.File(h5_path, "r") as f:
        for i, cid in enumerate(cam_ids):
            rv = np.asarray(f[f"/{cid}/rvec"]).ravel()
            tv = np.asarray(f[f"/{cid}/tvec"]).ravel()
            pos.append(wf.camera_position(rv, tv))
            gt.append(wf.camera_position(rvec_gt[i], tvec_gt[i]))
    pos, gt = np.stack(pos), np.stack(gt)
    if scale_align:
        d_pos = np.linalg.norm(pos[1:] - pos[0], axis=1)
        d_gt = np.linalg.norm(gt[1:] - gt[0], axis=1)
        s = np.mean(d_gt / d_pos)
        assert abs(s - 1) < 0.02, f"scale gauge drifted too far: {s}"
        pos = (pos - pos[0]) * s + gt[0]
    return np.linalg.norm(pos - gt, axis=1)


def test_optimize_extrinsics_driver(marker_scene):
    cfg, cam_ids, (K, xi, D, rvec, tvec) = marker_scene
    out = wf.optimize_extrinsics_driver(cfg, verbose=False)
    errs = _campos_errors(out, cam_ids, K, xi, D, rvec, tvec,
                          scale_align=True)
    # init error is tens of mm; BA should pull cameras to ~mm of truth
    assert errs.max() < 3.0, errs


def test_optimize_all_camera_params_driver(marker_scene):
    cfg, cam_ids, (K, xi, D, rvec, tvec) = marker_scene
    out = wf.optimize_all_camera_params_driver(cfg, verbose=False)
    base = os.path.dirname(cfg)

    # free intrinsics add focal<->distance gauge directions on a
    # single-trace problem (same family as cv2.omnidir / the
    # reference's 16-param BA), so positions are only loosely pinned...
    errs = _campos_errors(out, cam_ids, K, xi, D, rvec, tvec,
                          scale_align=True)
    assert errs.max() < 60.0, errs

    # ...but the recovered calibration must be SELF-consistent: DLT
    # triangulating the observed trace with it and reprojecting must
    # land back on the observations at the noise floor.
    K2 = np.zeros_like(K)
    xi2 = np.zeros_like(xi)
    D2 = np.zeros_like(D)
    rv2 = np.zeros_like(rvec)
    tv2 = np.zeros_like(tvec)
    with h5py.File(os.path.join(base, "cam_intrinsic_optim.h5"),
                   "r") as fi, h5py.File(out, "r") as fe:
        for i, cid in enumerate(cam_ids):
            K2[i] = np.asarray(fi[f"/{cid}/K"])
            xi2[i] = np.asarray(fi[f"/{cid}/xi"]).ravel()[0]
            D2[i] = np.asarray(fi[f"/{cid}/D"]).ravel()[:4]
            rv2[i] = np.asarray(fe[f"/{cid}/rvec"]).ravel()
            tv2[i] = np.asarray(fe[f"/{cid}/tvec"]).ravel()
    obs, *_ = wf._load_marker_problem(base, cam_ids)
    pts = wf._triangulate_trace(obs, K2, xi2, D2, rv2, tv2)
    seen = ~np.isnan(pts[:, 0])
    reproj = _project_rig(K2, xi2, D2, rv2, tv2, pts[seen])
    err = reproj - obs[:, seen]
    rms = np.sqrt(np.nanmean(err ** 2))
    assert rms < 0.5, rms
    base = os.path.dirname(cfg)
    with h5py.File(os.path.join(base, "cam_intrinsic_optim.h5"),
                   "r") as f:
        for cid in cam_ids:
            assert np.isfinite(np.asarray(f[f"/{cid}/K"])).all()
            assert np.asarray(f[f"/{cid}/D"]).shape == (1, 4)


def test_fix_extrinsic_optim(marker_scene):
    from macaque_tpu.calib.graph_init import get_rtvec, make_M

    cfg, cam_ids, (K, xi, D, rvec, tvec) = marker_scene
    base = os.path.dirname(cfg)
    opt = os.path.join(base, "cam_extrinsic_optim.h5")

    # fabricate a BA output whose frame drifted by a known transform
    drift = make_M(np.array([0.02, -0.01, 0.03]),
                   np.array([15.0, -8.0, 4.0]))
    with h5py.File(opt, "w") as f:
        for i, cid in enumerate(cam_ids):
            M = make_M(rvec[i], tvec[i]) @ np.linalg.inv(drift)
            rv, tv = get_rtvec(M)
            f.create_dataset(f"/{cid}/rvec", data=rv.reshape(3, 1))
            f.create_dataset(f"/{cid}/tvec", data=tv.reshape(3, 1))

    # reanchoring on camera 0 must restore every camera exactly,
    # because cam_extrinsic.h5 holds cam0's true pose
    wf.fix_extrinsic_optim(cfg, ref=0, verbose=False)
    errs = _campos_errors(opt, cam_ids, K, xi, D, rvec, tvec)
    assert errs.max() < 1e-6, errs


# --------------------------------------------------------------------------
# annotation frame extraction
# --------------------------------------------------------------------------


def test_extract_frames_for_3dannotation(tmp_path):
    from macaque_tpu.video.imgstore import write_imgstore

    cam_ids = [301, 302]
    base = tmp_path / "calib"
    base.mkdir()
    cfg_path = base / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"camera_id": cam_ids,
                        "img_size": [64, 48]}, f)
    # minimal calibration artifacts for the copy step
    for name in ("cam_intrinsic.h5", "cam_extrinsic.h5",
                 "cam_extrinsic_optim.h5"):
        with h5py.File(base / name, "w") as f:
            for cid in cam_ids:
                f.create_dataset(f"/{cid}/x", data=np.zeros(1))

    rng = np.random.default_rng(0)
    vid_root = tmp_path / "session"
    for cid in cam_ids:
        frames = rng.integers(0, 255, (30, 48, 64, 3), dtype=np.uint8)
        write_imgstore(str(tmp_path / f"session.{cid}") , frames,
                       fps=24.0)

    out = wf.extract_frames_for_3dannotation(
        str(cfg_path), str(tmp_path / "session"), str(tmp_path / "anno"),
        n_frame_extract=4, n_animal=2, n_kp=17)

    jsons = [p for p in os.listdir(out) if p.endswith(".json")]
    jpgs = [p for p in os.listdir(out) if p.endswith(".jpg")]
    assert len(jsons) >= 4 and len(jpgs) == len(jsons) * 2
    with open(os.path.join(out, sorted(jsons)[0])) as f:
        d = json.load(f)
    assert np.asarray(d["keypoints_2d"]).shape == (2, 2, 17, 2)
    assert np.asarray(d["keypoints_3d"]).shape == (2, 17, 3)
    with open(os.path.join(out, "metadata.yaml")) as f:
        meta = yaml.safe_load(f)
    assert meta["n_animal"] == 2 and meta["n_cam"] == 2
    assert os.path.exists(os.path.join(out, "calib",
                                       "cam_intrinsic.h5"))


# --------------------------------------------------------------------------
# cage-keypoint extrinsics
# --------------------------------------------------------------------------


def test_get_extrinsics_from_cage_keypoints(tmp_path):
    cam_ids = [401]
    rvec_gt = np.array([np.pi * 0.9, 0.1, -0.05])
    tvec_gt = np.array([30.0, -20.0, 2000.0])
    rng = np.random.default_rng(1)
    obj = rng.uniform(-500, 500, (12, 3))
    obj[:, 2] = rng.uniform(0, 800, 12)
    proj, _ = cv2.projectPoints(obj.reshape(-1, 1, 3), rvec_gt, tvec_gt,
                                K_GT, np.zeros(5))
    proj = proj.reshape(-1, 2)

    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"camera_id": cam_ids,
                        "img_size": [IMG_W, IMG_H]}, f)
    with h5py.File(tmp_path / "cam_intrinsic.h5", "w") as f:
        f.create_dataset("/401/mtx", data=K_GT)
        f.create_dataset("/401/dist", data=np.zeros((1, 5)))

    # annotations are stored at 640-wide display scale with a flag col
    ann = np.column_stack([np.ones(12), proj * 640.0 / IMG_W, obj])
    ann[3, 0] = 0  # one unlabeled point must be ignored
    wf.save_cage_annotations(str(cfg_path), {"401": ann})

    out = wf.get_extrinsics_from_cage_keypoints(str(cfg_path),
                                                verbose=False)
    with h5py.File(out, "r") as f:
        rv = np.asarray(f["/401/rvec"]).ravel()
        tv = np.asarray(f["/401/tvec"]).ravel()
    np.testing.assert_allclose(rv, rvec_gt, atol=1e-4)
    np.testing.assert_allclose(tv, tvec_gt, atol=0.5)


# --------------------------------------------------------------------------
# CameraGroup.calibrate_rows (aniposelib calibrate-from-detections path)
# --------------------------------------------------------------------------


def test_camera_group_calibrate_rows():
    from macaque_tpu.calib.graph_init import get_rtvec, make_M
    from macaque_tpu.compat.aniposelib import CameraGroup

    board = Checkerboard(9, 6, 23.0)
    obj = board.object_points()
    rng = np.random.default_rng(7)

    # three pinhole cameras with a small baseline, all looking +z
    n_cam = 3
    cam_M = []
    for i in range(n_cam):
        rv = rng.normal(0, 0.04, 3)
        tv = np.array([-150.0 + 150.0 * i + rng.normal(0, 5),
                       rng.normal(0, 10), rng.normal(0, 10)])
        cam_M.append(make_M(rv, tv))

    # board poses scattered in front of the cameras
    views = []
    for v in range(10):
        rv = np.array([np.pi, 0, 0]) + rng.uniform(-0.4, 0.4, 3)
        tv = np.array([rng.uniform(-80, 80), rng.uniform(-60, 60),
                       rng.uniform(500, 900)])
        views.append(make_M(rv, tv))

    all_rows = []
    for i in range(n_cam):
        rows = []
        for v, M_board in enumerate(views):
            rvec, tvec = get_rtvec(cam_M[i] @ M_board)
            proj, _ = cv2.projectPoints(obj.reshape(-1, 1, 3),
                                        rvec, tvec, K_GT, np.zeros(5))
            pix = proj.reshape(-1, 2) + rng.normal(0, 0.05, (54, 2))
            rows.append({"framenum": v, "corners": pix, "ids": None,
                         "filled": pix.copy()})
        all_rows.append(rows)

    group = CameraGroup.from_names(["a", "b", "c"],
                                   img_size=(IMG_W, IMG_H))
    rms = group.calibrate_rows(all_rows, board, verbose=False)
    assert rms < 0.3, rms

    # recovered geometry: relative camera positions match GT up to the
    # BA scale gauge (structure is free); board PnP pins scale closely
    gt_pos = np.stack([
        wf.camera_position(*get_rtvec(cam_M[i])) for i in range(n_cam)])
    got_pos = np.stack([
        wf.camera_position(group.rig.rvec[i], group.rig.tvec[i])
        for i in range(n_cam)])
    # world frame = camera 0 in the recovered rig; express GT likewise
    gt_rel = gt_pos - gt_pos[0]
    got_rel = got_pos - got_pos[0]
    M0 = cam_M[0]
    gt_rel = (M0[:3, :3] @ gt_rel.T).T  # rotate GT into cam0's frame
    scale = np.linalg.norm(gt_rel[1]) / max(np.linalg.norm(got_rel[1]),
                                            1e-9)
    assert abs(scale - 1) < 0.05, scale
    err = np.linalg.norm(got_rel * scale - gt_rel, axis=1)
    assert err.max() < 10.0, err

    # intrinsics land near the true focal length
    assert abs(group.rig.K[0, 0, 0] - 600) / 600 < 0.05


@pytest.mark.slow  # ~30 s: full fisheye group calibrate + BA on 1 core
def test_camera_group_calibrate_rows_fisheye():
    """calibrate_rows on a fisheye group (reference: anipose
    ``calibration.fisheye = true`` -> CameraGroup.from_names(fisheye=True)
    -> the same generic calibrate path, calibrate.py:181 +
    cameras.py:1891-1926). Board pixels are generated with the JAX
    equidistant model, whose cv2.fisheye parity is pinned by
    tests/test_golden_fisheye.py."""
    import jax.numpy as jnp

    from macaque_tpu.calib.graph_init import get_rtvec, make_M
    from macaque_tpu.cameras.fisheye import FisheyeCamera, fisheye_project
    from macaque_tpu.compat.aniposelib import CameraGroup

    board = Checkerboard(9, 6, 23.0)
    obj = board.object_points()
    rng = np.random.default_rng(11)

    n_cam = 3
    D_GT = np.array([-0.015, 0.006, 0.0, 0.0])
    cam_M = []
    for i in range(n_cam):
        rv = rng.normal(0, 0.04, 3)
        tv = np.array([-150.0 + 150.0 * i + rng.normal(0, 5),
                       rng.normal(0, 10), rng.normal(0, 10)])
        cam_M.append(make_M(rv, tv))

    views = []
    for v in range(10):
        rv = np.array([np.pi, 0, 0]) + rng.uniform(-0.4, 0.4, 3)
        tv = np.array([rng.uniform(-80, 80), rng.uniform(-60, 60),
                       rng.uniform(500, 900)])
        views.append(make_M(rv, tv))

    all_rows = []
    for i in range(n_cam):
        rows = []
        for v, M_board in enumerate(views):
            rvec, tvec = get_rtvec(cam_M[i] @ M_board)
            cam = FisheyeCamera(K=jnp.asarray(K_GT), D=jnp.asarray(D_GT),
                                rvec=jnp.asarray(rvec),
                                tvec=jnp.asarray(tvec))
            proj = np.array(fisheye_project(cam, jnp.asarray(obj)))
            pix = proj.reshape(-1, 2) + rng.normal(0, 0.05, (54, 2))
            rows.append({"framenum": v, "corners": pix, "ids": None,
                         "filled": pix.copy()})
        all_rows.append(rows)

    group = CameraGroup.from_names(["a", "b", "c"], fisheye=True,
                                   img_size=(IMG_W, IMG_H))
    assert group.rig.model == "fisheye"
    # the GT has a real k2 term, so opt in to the reference's
    # ``extra_dist`` second coefficient (FisheyeCamera.__init__,
    # cameras.py:347-354; default is f+k1 only)
    rms = group.calibrate_rows(all_rows, board, verbose=False,
                               extra_dist=True)
    assert rms < 0.3, rms
    assert group.rig.model == "fisheye"

    gt_pos = np.stack([
        wf.camera_position(*get_rtvec(cam_M[i])) for i in range(n_cam)])
    got_pos = np.stack([
        wf.camera_position(group.rig.rvec[i], group.rig.tvec[i])
        for i in range(n_cam)])
    gt_rel = gt_pos - gt_pos[0]
    got_rel = got_pos - got_pos[0]
    M0 = cam_M[0]
    gt_rel = (M0[:3, :3] @ gt_rel.T).T
    scale = np.linalg.norm(gt_rel[1]) / max(np.linalg.norm(got_rel[1]),
                                            1e-9)
    assert abs(scale - 1) < 0.05, scale
    err = np.linalg.norm(got_rel * scale - gt_rel, axis=1)
    assert err.max() < 10.0, err

    # the fisheye BA parameterization holds fx=fy=f (reference
    # FisheyeCamera.set_params, cameras.py:392-403)
    assert abs(group.rig.K[0, 0, 0] - group.rig.K[0, 1, 1]) < 1e-9
    assert abs(group.rig.K[0, 0, 0] - 600) / 600 < 0.05


# --------------------------------------------------------------------------
# anipose project-level calibrate driver (reference calibrate.py)
# --------------------------------------------------------------------------


@pytest.mark.slow
def test_calibrate_session_from_videos(tmp_path):
    """`calibrate-session`: board videos under <session>/calibration/ ->
    calibration.toml (reference calibrate.py:120-227): detections cached
    in detections.pickle, skip-if-done, error recorded in metadata."""
    from macaque_tpu.calib.graph_init import get_rtvec, make_M
    from macaque_tpu.compat.aniposelib import CameraGroup
    from macaque_tpu.tools import session as ses

    rng = np.random.default_rng(11)
    n_cam = 2
    cam_M = [make_M(rng.normal(0, 0.03, 3),
                    np.array([-80.0 + 160.0 * i, rng.normal(0, 8),
                              rng.normal(0, 8)]))
             for i in range(n_cam)]
    views = [make_M(np.array([np.pi, 0, 0]) + rng.uniform(-0.3, 0.3, 3),
                    np.array([rng.uniform(-60, 40), rng.uniform(-40, 20),
                              rng.uniform(520, 760)]))
             for _ in range(9)]

    root = tmp_path
    sess = root / "sessionA"
    calib_dir = sess / "calibration"
    calib_dir.mkdir(parents=True)
    for i, name in enumerate("AB"):
        vw = cv2.VideoWriter(str(calib_dir / f"calib-cam{name}.avi"),
                             cv2.VideoWriter_fourcc(*"MJPG"), 24,
                             (IMG_W, IMG_H))
        for M_board in views:
            rvec, tvec = get_rtvec(cam_M[i] @ M_board)
            fr = render_board_view(rvec, tvec)
            vw.write(cv2.cvtColor(fr, cv2.COLOR_GRAY2BGR))
        vw.release()

    config = ses.load_session_config(str(root / "missing.toml"))
    config["path"] = str(root)
    config["triangulation"]["cam_regex"] = r"cam([A-Z])"
    config["calibration"].update(board_type="checkerboard",
                                 board_size=[9, 6],
                                 board_square_side_length=23.0)

    out = ses.calibrate_all(config)
    (toml_path,) = [v for v in out.values() if v]
    assert os.path.exists(toml_path)
    assert os.path.exists(str(calib_dir / "detections.pickle"))

    group = CameraGroup.load(toml_path)
    assert group.get_names() == ["A", "B"]
    assert group.rig.metadata["adjusted"] is False
    # calibration reaches the corner-detection noise floor
    assert group.rig.metadata["error"] < 1.0, group.rig.metadata

    # focal length near truth; relative baseline near truth up to the
    # BA scale gauge
    assert abs(group.rig.K[0, 0, 0] - 600) / 600 < 0.08
    import macaque_tpu.calib.workflow as wf

    got_rel = wf.camera_position(group.rig.rvec[1], group.rig.tvec[1]) \
        - wf.camera_position(group.rig.rvec[0], group.rig.tvec[0])
    gt_rel = wf.camera_position(*get_rtvec(cam_M[1])) \
        - wf.camera_position(*get_rtvec(cam_M[0]))
    gt_rel = cam_M[0][:3, :3] @ gt_rel
    scale = np.linalg.norm(gt_rel) / max(np.linalg.norm(got_rel), 1e-9)
    assert abs(scale - 1) < 0.08, scale

    # skip-if-done (reference calibrate.py:158-165)
    assert all(v is None for v in ses.calibrate_all(config).values())
