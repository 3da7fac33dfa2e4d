"""Anipose-style session workflow tests (tools/session.py).

Builds a miniature anipose project tree (config.toml, calibration,
pose-2d h5 files, raw videos), then runs session triangulation,
2D reprojection, summaries, angles, labeled-video rendering, and
tracking-error evaluation end-to-end against synthetic ground truth.
(Reference: src/third_party/anipose/{triangulate,project_2d,summarize,
tracking_errors,label_videos}.py + common.py.)
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
pd = pytest.importorskip("pandas")
import jax.numpy as jnp  # noqa: E402
import yaml  # noqa: E402

from macaque_tpu.cameras import omnidir_project  # noqa: E402
from macaque_tpu.cameras.rig import CameraRig  # noqa: E402
from macaque_tpu.tools import session as ses  # noqa: E402
from tests.test_triangulate import make_rig  # noqa: E402

BODYPARTS = ["head", "tail", "foot"]


def _make_camera_rig(n_cam=3):
    cam = make_rig(n_cam)
    return CameraRig(
        camera_ids=[f"{i}" for i in range(n_cam)],
        K=np.asarray(cam.K), xi=np.asarray(cam.xi), D=np.asarray(cam.D),
        rvec=np.asarray(cam.rvec), tvec=np.asarray(cam.tvec),
        mtx=np.asarray(cam.K), dist=np.zeros((n_cam, 5)),
        size=(2048, 1536),
    )


def _walk(F=12, seed=0):
    rng = np.random.default_rng(seed)
    offsets = np.array([[0, 0, 120.0], [0, 0, -120.0], [90.0, 0, -120.0]])
    center = np.cumsum(rng.normal(0, 8, (F, 3)), axis=0)
    return center[:, None, :] + offsets[None, :, :]  # (F, J=3, 3)


@pytest.fixture
def project(tmp_path):
    """Project tree: <root>/config.toml + session1/{calibration,pose-2d,
    videos-raw}. Returns (config, session_path, rig, p3d_true, p2d)."""
    rig = _make_camera_rig(3)
    root = tmp_path
    sess = root / "session1"
    (sess / "calibration").mkdir(parents=True)
    (sess / "pose-2d").mkdir()
    (sess / "videos-raw").mkdir()

    rig.to_calibration_toml(str(sess / "calibration" / "calibration.toml"))

    p3d = _walk()
    F, J, _ = p3d.shape
    p2d = np.array(omnidir_project(
        rig.omni(), jnp.asarray(p3d.reshape(-1, 3)))).reshape(3, F, J, 2)

    rng = np.random.default_rng(5)
    scores = rng.uniform(0.85, 1.0, (3, F, J))
    scores[0, 2, 1] = 0.1  # below threshold -> dropped
    for c in range(3):
        ses.write_pose2d(p2d[c], scores[c], BODYPARTS,
                         str(sess / "pose-2d" / f"vid1-cam{c}.h5"))
        # a tiny raw video so project_2d/label_videos find camera names
        vw = cv2.VideoWriter(
            str(sess / "videos-raw" / f"vid1-cam{c}.avi"),
            cv2.VideoWriter_fourcc(*"MJPG"), 24, (64, 48))
        for _ in range(F):
            vw.write(np.zeros((48, 64, 3), np.uint8))
        vw.release()

    with open(root / "config.toml", "w") as f:
        f.write(f"""
project = "testproj"
path = "{root}"
nesting = 1
video_extension = "avi"

[triangulation]
cam_regex = "cam([0-9]+)"
optim = false
ransac = false
score_threshold = 0.5

[labeling]
scheme = [["head", "tail", "foot"]]

[angles]
bend = ["head", "tail", "foot"]
""")
    config = ses.load_session_config(str(root / "config.toml"))
    return config, str(sess), rig, p3d, p2d


def test_config_and_naming(project):
    config, sess, *_ = project
    assert config["project"] == "testproj"
    assert config["pipeline"]["pose_3d"] == "pose-3d"  # default merged
    assert ses.get_cam_name(config, "vid1-cam2.h5") == "2"
    # reference common.py:75-80 keeps the separator ("vid1-"), strips
    # whitespace only — parity pinned by test_golden_session
    assert ses.get_video_name(config, "vid1-cam2.h5") == "vid1-"
    assert ses.find_calibration_folder(config, sess) == sess


def test_triangulate_all_recovers_points(project):
    config, sess, rig, p3d, p2d = project
    out = ses.triangulate_all(config)
    (written,) = [v for v in out.values() if v]
    csv = written[0]
    assert csv.endswith(os.path.join("pose-3d", "vid1-.csv"))
    d = pd.read_csv(csv)
    F, J, _ = p3d.shape
    assert len(d) == F
    got = np.stack([
        np.asarray(d.loc[:, (f"{bp}_x", f"{bp}_y", f"{bp}_z")])
        for bp in BODYPARTS], axis=1)
    np.testing.assert_allclose(got, p3d, atol=0.5)
    assert (np.asarray(d["fnum"]) == np.arange(F)).all()
    # errors ~0 (noise-free projections), ncams = 3 except dropped det
    errs = np.stack([np.asarray(d[f"{bp}_error"]) for bp in BODYPARTS],
                    axis=1)
    assert np.nanmax(errs) < 0.3
    assert d["tail_ncams"][2] == 2  # one camera dropped by threshold

    # resumable: second run skips
    out2 = ses.triangulate_all(config)
    assert all(len(v) == 0 for v in out2.values())


def test_triangulate_optim_and_axes(project):
    config, sess, rig, p3d, p2d = project
    config["triangulation"]["optim"] = True
    config["triangulation"]["constraints"] = [["head", "tail"]]
    config["triangulation"]["reference_point"] = "tail"
    config["triangulation"]["axes"] = [
        ["x", "tail", "foot"], ["z", "tail", "head"]]
    ses.triangulate_all(config)
    d = pd.read_csv(os.path.join(sess, "pose-3d", "vid1-.csv"))
    # frame correction: tail is the reference point -> centered at 0
    tail = np.asarray(d.loc[:, ("tail_x", "tail_y", "tail_z")])
    assert np.abs(np.median(tail, axis=0)).max() < 1.0
    # x axis points tail->foot (offset +90 in x, same z)
    foot = np.asarray(d.loc[:, ("foot_x", "foot_y", "foot_z")])
    diff = np.median(foot - tail, axis=0)
    assert diff[0] > 60 and abs(diff[1]) < 15 and abs(diff[2]) < 15
    M = np.array([[d[f"M_{i}{j}"][0] for j in range(3)]
                  for i in range(3)])
    np.testing.assert_allclose(M @ M.T, np.eye(3), atol=1e-6)


def test_filter_2d_all_feeds_filtered_triangulation(project):
    """Session-level 2D filter driver (reference filter_pose.py
    process_session): writes pose-2d-filtered h5s that triangulation
    consumes when filter.enabled, and skips existing outputs."""
    config, sess, rig, p3d, p2d = project
    config["filter"].update(type="medfilt", medfilt=5,
                            offset_threshold=100.0, score_threshold=0.05)
    out = ses.filter_pose_2d_all(config)
    written = [f for v in out.values() for f in v]
    assert len(written) == 3
    d = ses.read_pose2d(os.path.join(sess, "pose-2d-filtered",
                                     "vid1-cam0.h5"))
    assert d["points"].shape == p2d[0].shape
    # near-pass-through on clean tracks (large offset threshold)
    good = np.isfinite(d["points"][..., 0])
    assert good.mean() > 0.9
    np.testing.assert_allclose(d["points"][good], p2d[0][good], atol=2.0)

    config["filter"]["enabled"] = True
    ses.triangulate_all(config)
    assert os.path.exists(os.path.join(sess, "pose-3d", "vid1-.csv"))
    assert all(len(v) == 0 for v in ses.filter_pose_2d_all(config).values())


def test_filter_2d_viterbi_autoencoder_chain(project):
    """Viterbi + trained-autoencoder chain through the session driver
    (reference filter types 'viterbi'/'autoencoder' + train_autoencoder)."""
    config, sess, rig, p3d, p2d = project
    ses.train_autoencoder_project(config, epochs=50)
    assert os.path.exists(config["filter"]["autoencoder_path"])
    config["filter"].update(type=["viterbi", "autoencoder"],
                            n_back=3, offset_threshold=60.0,
                            score_threshold=0.3)
    out = ses.filter_pose_2d_all(config)
    written = [f for v in out.values() for f in v]
    assert len(written) == 3
    d = ses.read_pose2d(written[0])
    assert d["points"].shape == p2d[0].shape
    assert np.isfinite(d["points"][..., 0]).mean() > 0.8
    # autoencoder rescoring only ever lowers scores
    assert (d["scores"] <= 1.0 + 1e-6).all()


def test_project_2d_roundtrip(project):
    config, sess, rig, p3d, p2d = project
    ses.triangulate_all(config)
    out = ses.project_2d_all(config)
    written = [f for v in out.values() for f in v]
    assert len(written) == 3
    for c in range(3):
        d = ses.read_pose2d(os.path.join(sess, "pose-2d-proj",
                                         f"vid1-cam{c}.h5"))
        assert d["bodyparts"] == BODYPARTS
        good = np.isfinite(d["points"][..., 0])
        assert good.mean() > 0.9
        np.testing.assert_allclose(d["points"][good],
                                   p2d[c][good], atol=1.0)


def test_summarize_pose3d(project):
    config, sess, *_ = project
    ses.triangulate_all(config)
    out = ses.summarize_pose3d(config)
    d = pd.read_csv(out)
    assert "head_x" in d.columns
    assert (d["folder_1"] == "session1").all()
    assert (d["project"] == "testproj").all()
    assert (d["filename"] == "vid1-").all()


def test_angles_and_summarize_angles(project):
    config, sess, rig, p3d, _ = project
    ses.triangulate_all(config)
    out = ses.angles_all(config)
    (written,) = [v for v in out.values() if v]
    d = pd.read_csv(written[0])
    # bend angle at 'tail': head is +z, foot is +x from tail -> ~90 deg
    assert np.nanmedian(np.abs(d["bend"] - 90)) < 3.0
    s = ses.summarize_angles(config)
    assert os.path.exists(s)


def test_label_videos(project):
    config, sess, *_ = project
    # an extra recording whose points land inside the tiny test frames
    rng = np.random.default_rng(9)
    pts = rng.uniform(10, 40, (6, 3, 2))
    ses.write_pose2d(pts, np.ones((6, 3)), BODYPARTS,
                     os.path.join(sess, "pose-2d", "vid2-cam0.h5"))
    vw = cv2.VideoWriter(os.path.join(sess, "videos-raw",
                                      "vid2-cam0.avi"),
                         cv2.VideoWriter_fourcc(*"MJPG"), 24, (64, 48))
    for _ in range(6):
        vw.write(np.zeros((48, 64, 3), np.uint8))
    vw.release()

    out = ses.label_videos_all(config)
    written = [f for v in out.values() for f in v]
    assert len(written) == 4
    target = [w for w in written if "vid2" in w][0]
    cap = cv2.VideoCapture(target)
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.sum() > 0  # skeleton + points were drawn


def test_tracking_errors(project, tmp_path, monkeypatch):
    config, sess, rig, p3d, p2d = project
    ses.triangulate_all(config)

    labeled = os.path.join(str(tmp_path), "labeled-data")
    F, J, _ = p3d.shape
    pick = [2, 7, 10]
    calib_path = os.path.join(sess, "calibration", "calibration.toml")
    for c in range(3):
        d = os.path.join(labeled, f"vid1--{c}")
        os.makedirs(d)
        ses.write_pose2d(p2d[c][pick], np.ones((len(pick), J)),
                         BODYPARTS, os.path.join(d, "labels.h5"))
        pd.DataFrame({
            "framenum": pick,
            "calib": [calib_path] * len(pick),
            "video": [os.path.join(sess, "videos-raw",
                                   f"vid1-cam{c}.avi")] * len(pick),
            "img": ["x.png"] * len(pick),
        }).to_csv(os.path.join(d, "anipose_metadata.csv"), index=False)

    # cam names in labeled-data folders are bare indices; metadata video
    # paths resolve the session; config cam_regex matches 'cam<N>'
    out = ses.get_tracking_errors(config, labeled_dir=labeled)
    d = pd.read_csv(out)
    assert len(d) == len(pick)
    for bp in BODYPARTS:
        assert np.nanmax(np.asarray(d[f"{bp}_error"])) < 1.0
