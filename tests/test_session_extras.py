"""Tests for the remaining anipose tool surface (tools/session_extras,
tools/report): 3D/proj/combined video rendering, frame mining,
video conversion, calibration-error reports, and the static HTML report.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
pd = pytest.importorskip("pandas")

from macaque_tpu.tools import session as ses
from macaque_tpu.tools import session_extras as sx
from macaque_tpu.tools.report import generate_report

# reuse the miniature anipose project tree fixture
from tests.test_session import project, BODYPARTS  # noqa: F401


def _video_frames(path):
    cap = cv2.VideoCapture(path)
    n = 0
    while True:
        ok, _ = cap.read()
        if not ok:
            break
        n += 1
    cap.release()
    return n


@pytest.fixture
def tracked(project):
    """Project with 3D + projections + labeled videos computed."""
    config, sess, rig, p3d, p2d = project
    ses.triangulate_all(config)
    ses.project_2d_all(config)
    ses.label_videos_all(config)
    return config, sess, rig, p3d, p2d


def test_label_filter_compare(project):
    """Raw / labeled / filtered-labeled 3-row comparison video
    (reference label_filter_compare.py): one video per recording,
    height = 3 rows, requires pose-2d-filtered to exist."""
    config, sess, rig, p3d, p2d = project
    # nothing filtered yet -> nothing to compare
    out0 = sx.label_filter_compare_all(config)
    assert all(len(v) == 0 for v in out0.values())

    config["filter"].update(type="medfilt", medfilt=5,
                            offset_threshold=100.0)
    ses.filter_pose_2d_all(config)
    out = sx.label_filter_compare_all(config)
    (written,) = [v for v in out.values() if v]
    assert written[0].endswith(os.path.join("videos-compare",
                                            "vid1-.mp4"))
    cap = cv2.VideoCapture(written[0])
    ok, frame = cap.read()
    W = cap.get(cv2.CAP_PROP_FRAME_WIDTH)
    H = cap.get(cv2.CAP_PROP_FRAME_HEIGHT)
    cap.release()
    assert ok and H == 3 * 320 and W > 0
    assert _video_frames(written[0]) == 12
    # resumable
    out2 = sx.label_filter_compare_all(config)
    assert all(len(v) == 0 for v in out2.values())


def test_label_filter_compare_multidigit_cams(tmp_path):
    """Camera pairing must survive lexicographic-vs-natural ordering
    (cams 1, 2, 10): each row's labels must come from that camera's own
    pose file. Distinct constant points per camera make misalignment
    visible as drawn marks at the wrong tile."""
    import pandas as pd  # noqa: F401

    sess = os.path.join(str(tmp_path), "s1")
    os.makedirs(os.path.join(sess, "videos-raw"))
    os.makedirs(os.path.join(sess, "pose-2d"))
    os.makedirs(os.path.join(sess, "pose-2d-filtered"))
    cams = ["1", "2", "10"]
    F = 4
    # camera c's keypoint sits at a camera-specific x position
    xpos = {"1": 10, "2": 30, "10": 50}
    for c in cams:
        vw = cv2.VideoWriter(
            os.path.join(sess, "videos-raw", f"vid-cam{c}.avi"),
            cv2.VideoWriter_fourcc(*"MJPG"), 24, (64, 48))
        for _ in range(F):
            vw.write(np.zeros((48, 64, 3), np.uint8))
        vw.release()
        pts = np.full((F, 1, 2), [xpos[c], 24.0])
        for sub in ("pose-2d", "pose-2d-filtered"):
            ses.write_pose2d(pts, np.ones((F, 1)), ["nose"],
                             os.path.join(sess, sub, f"vid-cam{c}.h5"))

    config = ses.load_session_config(
        os.path.join(str(tmp_path), "missing.toml"))
    config["path"] = str(tmp_path)
    config["triangulation"]["cam_regex"] = r"cam([0-9]+)"
    out = sx.label_filter_compare_all(config)
    (written,) = [v for v in out.values() if v]
    cap = cv2.VideoCapture(written[0])
    ok, frame = cap.read()
    cap.release()
    assert ok
    # natural camera order 1, 2, 10 -> tiles at x offsets 0, w, 2w;
    # row 2 (labeled) must show camera c's dot inside tile c
    h3 = frame.shape[0] // 3
    w = frame.shape[1] // 3
    scale = 320 / 48  # row_height / source height
    row2 = frame[h3:2 * h3]
    for tile, c in enumerate(["1", "2", "10"]):
        x0 = tile * w
        tile_img = row2[:, x0:x0 + w]
        red = (tile_img[:, :, 2] > 150) & (tile_img[:, :, 1] < 100)
        assert red.any(), c
        xs = np.where(red.any(axis=0))[0]
        expect = xpos[c] * scale
        assert abs(xs.mean() - expect) < 25, (c, xs.mean(), expect)


def test_label_videos_3d(tracked):
    config, sess, *_ = tracked
    out = sx.label_videos_3d_all(config)
    (written,) = [v for v in out.values() if v]
    assert written[0].endswith(os.path.join("videos-3d", "vid1-.mp4"))
    assert _video_frames(written[0]) == 12
    # resumable
    out2 = sx.label_videos_3d_all(config)
    assert all(len(v) == 0 for v in out2.values())


def test_label_videos_proj(tracked):
    config, sess, *_ = tracked
    out = sx.label_videos_proj_all(config)
    written = [f for v in out.values() for f in v]
    assert len(written) == 3  # one per camera
    for f in written:
        assert "videos-labeled-proj" in f
        assert _video_frames(f) == 12


def test_label_combined(tracked):
    config, sess, *_ = tracked
    sx.label_videos_3d_all(config)
    out = sx.label_combined_all(config)
    (written,) = [v for v in out.values() if v]
    assert written[0].endswith(os.path.join("videos-combined",
                                            "vid1-.mp4"))
    cap = cv2.VideoCapture(written[0])
    ok, frame = cap.read()
    cap.release()
    assert ok
    # 3 tiled 2D views (2x2 grid) + 3D panel on the right
    assert frame.shape[1] > frame.shape[0]


def test_pick_frames_spacing_and_ranking():
    # broad high-error band (frames 40-79) amid low-error frames: bad
    # picks must come from the band and respect the spacing
    errors = np.full(100, 0.1)
    errors[40:80] = 10.0
    vidnums = np.zeros(100, int)
    framenums = np.arange(100)
    picked = sx.pick_frames(errors, vidnums, framenums, mode="bad",
                            num_frames_pick=3, spacing=10,
                            rng=np.random.default_rng(0))
    assert len(picked) == 3
    fs = sorted(f for _, f in picked)
    assert all(40 <= f < 80 for f in fs), fs
    assert all(b - a > 10 for a, b in zip(fs, fs[1:])), fs


def test_extract_frames(tracked):
    config, sess, rig, p3d, p2d = tracked
    # the tiny project has 12 frames; spacing=3 makes 3 picks feasible
    folders = sx.extract_frames(config, mode="bad", num_frames_pick=3,
                                spacing=3)
    assert len(folders) == 3  # one per camera
    for folder in folders:
        pngs = [f for f in os.listdir(folder) if f.endswith(".png")]
        assert len(pngs) == 3
        ann = pd.read_csv(os.path.join(folder, "annotations.csv"))
        assert len(ann) == 3
        assert f"{BODYPARTS[0]}_x" in ann.columns
        meta = pd.read_csv(os.path.join(folder, "frames.csv"))
        assert {"img", "video", "framenum"} <= set(meta.columns)


def test_convert_videos(tracked):
    config, sess, *_ = tracked
    out = sx.convert_videos_all(config)
    written = [f for v in out.values() for f in v]
    assert len(written) == 3
    for f in written:
        assert f.endswith(".mp4") and "videos-raw-mp4" in f
        assert _video_frames(f) == 12


def test_calibration_errors(tracked, monkeypatch):
    """Error-report logic with a stubbed board detector: synthetic board
    corners projected into each camera must triangulate back with ~0
    error for every camera pair."""
    import jax.numpy as jnp

    from macaque_tpu.cameras import omnidir_project

    config, sess, rig, *_ = tracked
    board_pts = np.stack(np.meshgrid(np.arange(6) * 25.0,
                                     np.arange(5) * 25.0),
                         -1).reshape(-1, 2)
    obj3d = np.concatenate([board_pts,
                            np.zeros((len(board_pts), 1))], axis=1)
    obj3d = obj3d + np.array([0, 0, 60.0])

    proj = np.asarray(omnidir_project(
        rig.omni(), jnp.asarray(obj3d))).reshape(rig.n_cam, -1, 2)

    def fake_detect(path, board, skip=20, progress=False):
        cam = int(os.path.basename(path).split("cam")[1].split(".")[0])
        return [{"framenum": 0,
                 "corners": proj[cam].reshape(-1, 1, 2),
                 "ids": np.arange(len(board_pts)),
                 "filled": proj[cam]}]

    from macaque_tpu.calib import videos as cvids

    monkeypatch.setattr(cvids, "detect_board_video", fake_detect)
    # calibration videos live in <session>/calibration/*.avi
    cal_dir = os.path.join(sess, "calibration")
    for c in range(rig.n_cam):
        vw = cv2.VideoWriter(os.path.join(cal_dir, f"calib-cam{c}.avi"),
                             cv2.VideoWriter_fourcc(*"MJPG"), 24,
                             (64, 48))
        vw.write(np.zeros((48, 64, 3), np.uint8))
        vw.release()
    config["pipeline"]["calibration_videos"] = "calibration"
    config["calibration"] = {"board_type": "checkerboard",
                             "board_size": [6, 5],
                             "board_square_side_length": 25}

    out = sx.calibration_errors_session(config, sess)
    assert out, "no calibration_errors.csv written"
    d = pd.read_csv(out[0])
    assert len(d) == 3  # 3 camera pairs
    assert (d["n_points"] == len(board_pts)).all()
    assert (d["error_mean"] < 0.1).all(), d


def test_report(tracked):
    config, sess, *_ = tracked
    sx.label_videos_3d_all(config)
    out = generate_report(config)
    assert os.path.exists(out)
    html = open(out).read()
    assert "testproj" in html
    assert "vid1" in html
    assert "<video" in html            # rendered videos embedded
    assert "per-bodypart stats" in html
    assert "head" in html              # bodypart table rows
    # plots emitted next to the report
    assert "<img" in html
