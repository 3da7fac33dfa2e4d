"""Differential golden test: the REFERENCE's own anipose session
triangulation driver (/root/reference/src/third_party/anipose/
triangulate.py ``triangulate`` :170-295 and ``process_session``
:296-349) against ``tools.session.triangulate_session`` /
``process_session_triangulate`` on identical inputs.

Both sides load the SAME calibration.toml and the same per-camera
pose-2d arrays, and write the same per-bodypart CSV schema
(x/y/z/error/ncams/score per bodypart + M_ij/center_i frame correction
+ fnum). The reference's ``load_pose2d_fnames`` reads DeepLabCut
pandas-HDF5 tables, which need pytables (absent here) — that loader is
monkeypatched to this repo's h5py-layout reader, which returns the
identical dict contract (cam_names/points/scores/bodyparts; verified
against triangulate.py:80-129). Everything downstream of the load —
score thresholding, DLT / RANSAC / constrained-optim triangulation,
reprojection errors, ncams/score bookkeeping, coordinate-frame
correction, CSV schema — is the reference's own code.

Environment shims (tests/oracles.py): cv2.omnidir (NumPy Mei model),
numba (pass-through jit), toml.
"""

import os
import shutil
import sys

import numpy as np
import pytest

from macaque_tpu.tools.session import (
    load_pose2d_fnames, load_session_config, process_session_triangulate,
    triangulate_session, write_pose2d,
)
from macaque_tpu.tools.synthetic import make_test_rig

N_CAM = 4
BODYPARTS = ["hipL", "hipR", "neck", "tailbase", "nose", "earL"]
AXES = [["x", "hipL", "hipR"], ["z", "neck", "tailbase"]]
REF_POINT = "neck"


def _import_reference_triangulate():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests.oracles import (
        install_cv2_omnidir_shim, install_numba_shim, install_toml_shim,
    )

    install_numba_shim()  # aniposelib applies @jit at module scope
    install_toml_shim()
    install_cv2_omnidir_shim()
    if "aniposelib" not in sys.modules:  # anipose modules import it bare
        from src.third_party import aniposelib as _al

        sys.modules["aniposelib"] = _al
    import src.third_party.anipose.triangulate as ref_tri

    # IO-only shim: DLC pandas-HDF5 reading needs pytables (absent);
    # this repo's reader returns the same dict contract.
    ref_tri.load_pose2d_fnames = load_pose2d_fnames
    return ref_tri


def _scene(n_frame, seed=0):
    """Smooth per-bodypart trajectories inside the test rig's volume."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 2 * np.pi, n_frame)[:, None]
    ph = rng.uniform(0, 2 * np.pi, (1, len(BODYPARTS)))
    x = 320 * np.cos(0.9 * t + ph) + rng.normal(0, 40, ph.shape)
    y = 300 * np.sin(1.1 * t + ph) + rng.normal(0, 40, ph.shape)
    z = 800 + 260 * np.sin(0.6 * t + 2 * ph)
    return np.stack([x, y, z], axis=-1)  # (F, J, 3)


def _make_session(tmp_path, n_frame=60, seed=3, noise=0.2, drop=0.12,
                  outlier_cam=None, outlier_frac=0.0):
    """calibration.toml + per-camera pose-2d h5 files; returns
    (calib_folder, pose_folder, fname_dict, kp3d, scores)."""
    from macaque_tpu.compat.aniposelib import CameraGroup

    rig = make_test_rig(N_CAM, seed=5)
    calib_folder = os.path.join(str(tmp_path), "calibration")
    pose_folder = os.path.join(str(tmp_path), "pose-2d")
    os.makedirs(calib_folder, exist_ok=True)
    os.makedirs(pose_folder, exist_ok=True)
    rig.to_calibration_toml(os.path.join(calib_folder, "calibration.toml"))
    cgroup = CameraGroup.load(os.path.join(calib_folder,
                                           "calibration.toml"))

    kp3d = _scene(n_frame, seed=seed)
    F, J = kp3d.shape[:2]
    proj = np.asarray(cgroup.project(kp3d.reshape(-1, 3))).reshape(
        N_CAM, F, J, 2)
    rng = np.random.default_rng(seed + 1)
    proj = proj + rng.normal(0, noise, proj.shape)
    scores = rng.uniform(0.35, 1.0, (N_CAM, F, J))
    # per-camera dropouts below the score threshold exercise the
    # bad-point masking; a few hard NaNs exercise missing detections
    proj[rng.random((N_CAM, F, J)) < drop] = np.nan
    if outlier_cam is not None:
        bad = rng.random((F, J)) < outlier_frac
        proj[outlier_cam][bad] += rng.uniform(120, 300, (bad.sum(), 2))
        scores[outlier_cam][bad] = 0.99  # high score: only RANSAC drops it
    fname_dict = {}
    for c, name in enumerate(rig.camera_ids):
        fn = os.path.join(pose_folder, f"vid-cam{name}.h5")
        write_pose2d(proj[c], scores[c], BODYPARTS, fn)
        fname_dict[name] = fn
    return calib_folder, pose_folder, fname_dict, kp3d, scores


def _config(**tri_overrides):
    cfg = load_session_config(fname="/nonexistent/config.toml")
    cfg["triangulation"].update({
        "score_threshold": 0.5,
        "reference_point": REF_POINT,
        "axes": AXES,
        "cam_regex": r"cam([A-Za-z0-9]+)$",
    })
    cfg["triangulation"].update(tri_overrides)
    return cfg


def _run_both(tmp_path, config, fname_dict, calib_folder, pose_folder):
    import pandas as pd

    ref_tri = _import_reference_triangulate()
    if config["triangulation"].get("optim"):
        # ASSERTED UPSTREAM BUG: the reference's vendored aniposelib
        # changed optim_points to return (points, joint_lengths)
        # (cameras.py:1190 `return p3ds_new2, joint_len`) without
        # updating its own triangulate.py:216 caller, which then crashes
        # on `points_3d.reshape` — the optim branch is dead code in the
        # shipped tree. Unpack the tuple so the branch can execute; all
        # math is still the reference's own.
        # patch the exact class object triangulate.py closes over (the
        # bare `aniposelib` alias makes `aniposelib.cameras` a second
        # module object, so patching by module path can miss it)
        cg_cls = ref_tri.CameraGroup
        if not getattr(cg_cls, "_optim_unwrapped", False):
            orig = cg_cls.optim_points

            def optim_points(self, *a, **k):
                return orig(self, *a, **k)[0]

            cg_cls.optim_points = optim_points
            cg_cls._optim_unwrapped = True
    ref_csv = os.path.join(str(tmp_path), "ref.csv")
    our_csv = os.path.join(str(tmp_path), "ours.csv")
    ref_tri.triangulate(config, calib_folder, str(tmp_path), pose_folder,
                        fname_dict, ref_csv)
    triangulate_session(config, calib_folder, fname_dict, our_csv)
    return pd.read_csv(ref_csv), pd.read_csv(our_csv)


def _compare(ref, ours, coord_med=2.0, coord_max=12.0, err_atol=0.35):
    assert list(ref.columns) == list(ours.columns)
    np.testing.assert_array_equal(ref["fnum"], ours["fnum"])
    for bp in BODYPARTS:
        # bookkeeping columns are pure numpy on both sides: exact
        np.testing.assert_allclose(
            ours[f"{bp}_ncams"], ref[f"{bp}_ncams"], atol=1e-12,
            equal_nan=True, err_msg=f"{bp}_ncams")
        np.testing.assert_allclose(
            ours[f"{bp}_score"], ref[f"{bp}_score"], atol=1e-9,
            equal_nan=True, err_msg=f"{bp}_score")
        # 3D coordinates: different DLT formulations agree at the
        # px-noise estimator floor (cf. test_golden_aniposelib)
        r = np.asarray(ref[[f"{bp}_x", f"{bp}_y", f"{bp}_z"]], float)
        o = np.asarray(ours[[f"{bp}_x", f"{bp}_y", f"{bp}_z"]], float)
        assert np.array_equal(np.isnan(r), np.isnan(o)), bp
        d = np.linalg.norm(r - o, axis=1)
        ok = ~np.isnan(d)
        assert np.median(d[ok]) < coord_med, (bp, np.median(d[ok]))
        assert np.max(d[ok]) < coord_max, (bp, np.max(d[ok]))
        e_r = np.asarray(ref[f"{bp}_error"], float)
        e_o = np.asarray(ours[f"{bp}_error"], float)
        assert np.array_equal(np.isnan(e_r), np.isnan(e_o)), bp
        np.testing.assert_allclose(e_o[~np.isnan(e_o)],
                                   e_r[~np.isnan(e_r)], atol=err_atol,
                                   err_msg=f"{bp}_error")
    # shared frame-correction rotation/center
    M_r = np.asarray([[ref[f"M_{i}{j}"][0] for j in range(3)]
                      for i in range(3)])
    M_o = np.asarray([[ours[f"M_{i}{j}"][0] for j in range(3)]
                      for i in range(3)])
    np.testing.assert_allclose(M_o, M_r, atol=2e-3)
    c_r = np.asarray([ref[f"center_{i}"][0] for i in range(3)])
    c_o = np.asarray([ours[f"center_{i}"][0] for i in range(3)])
    np.testing.assert_allclose(c_o, c_r, atol=3.0)


def test_golden_triangulate_plain(tmp_path):
    """optim=False / ransac=False: thresholded DLT + frame correction."""
    calib, pose, fnames, _, _ = _make_session(tmp_path)
    ref, ours = _run_both(tmp_path, _config(), fnames, calib, pose)
    _compare(ref, ours)


def test_golden_triangulate_optim(tmp_path):
    """optim=True: the constrained spatiotemporal refinement
    (reference optim_points -> scipy sparse-TRF; ours
    geometry/refine3d LM-CGLS). Same objective, different solvers:
    agreement at the optimizer floor."""
    calib, pose, fnames, _, _ = _make_session(tmp_path, n_frame=40,
                                              seed=9)
    cfg = _config(optim=True,
                  constraints=[["hipL", "hipR"], ["neck", "tailbase"]],
                  constraints_weak=[["neck", "nose"]],
                  scale_smooth=2, scale_length=2, scale_length_weak=0.5,
                  n_deriv_smooth=1, reproj_error_threshold=15)
    ref, ours = _run_both(tmp_path, cfg, fnames, calib, pose)
    _compare(ref, ours, coord_med=3.0, coord_max=25.0, err_atol=1.0)


@pytest.mark.slow
def test_golden_triangulate_ransac(tmp_path):
    """ransac=True with a gross-outlier camera: both sides must reject
    the planted outliers (the planted camera's picks drop) and agree on
    the surviving geometry."""
    calib, pose, fnames, _, _ = _make_session(
        tmp_path, n_frame=30, seed=11, drop=0.03, outlier_cam=2,
        outlier_frac=0.25)
    ref, ours = _run_both(tmp_path, _config(ransac=True), fnames, calib,
                          pose)
    for bp in BODYPARTS:
        r = np.asarray(ref[[f"{bp}_x", f"{bp}_y", f"{bp}_z"]], float)
        o = np.asarray(ours[[f"{bp}_x", f"{bp}_y", f"{bp}_z"]], float)
        both = ~(np.isnan(r[:, 0]) | np.isnan(o[:, 0]))
        # the two RANSAC searches may keep/drop different marginal rows
        # (min_cams=3 after rejection); the shared rows are the claim
        assert both.mean() > 0.5, (bp, both.mean())
        d = np.linalg.norm(r[both] - o[both], axis=1)
        # outlier-rejected DLT: same inlier geometry on both sides
        assert np.median(d) < 3.0, (bp, np.median(d))


def test_golden_project_2d(tmp_path):
    """The reference's own 2D reprojector
    (/root/reference/src/third_party/anipose/project_2d.py:24-72
    ``get_projected_points``: undo the frame correction from the CSV's
    M/center columns, mask by reprojection error, project through the
    CameraGroup, subtract crop offsets) against
    ``session.get_projected_points`` on the same pose-3d CSV +
    calibration.toml."""
    import pandas as pd

    _import_reference_triangulate()
    import src.third_party.anipose.project_2d as ref_p2
    import src.third_party.aniposelib.cameras as ref_cameras

    from macaque_tpu.compat.aniposelib import CameraGroup
    from macaque_tpu.tools.session import get_projected_points

    sess = os.path.join(str(tmp_path), "sess")
    calib, pose, fnames, _, _ = _make_session(sess, n_frame=50, seed=31)
    cfg = _config()
    csv = os.path.join(sess, "pose-3d", "vid-.csv")
    os.makedirs(os.path.dirname(csv), exist_ok=True)
    triangulate_session(cfg, calib, fnames, csv)
    # spread errors around the hard-coded 50 px mask (project_2d.py:53)
    d = pd.read_csv(csv)
    rng = np.random.default_rng(4)
    for bp in BODYPARTS:
        e = np.array(d[f"{bp}_error"], float)
        e[rng.random(len(e)) < 0.15] = 75.0
        d[f"{bp}_error"] = e
    d.to_csv(csv, index=False)

    toml_path = os.path.join(calib, "calibration.toml")
    ref_g = ref_cameras.CameraGroup.load(toml_path)
    our_g = CameraGroup.load(toml_path)
    cam_names = ref_g.get_names()
    offsets = {c: (0, 0) for c in cam_names}
    offsets[cam_names[1]] = (12, -7)  # exercise the offset subtraction

    bp_r, proj_r, sc_r = ref_p2.get_projected_points(cfg, csv, ref_g,
                                                     offsets)
    bp_o, proj_o, sc_o = get_projected_points(cfg, csv, our_g, offsets)

    assert bp_r == bp_o
    np.testing.assert_allclose(sc_o, sc_r, atol=1e-9, equal_nan=True)
    assert np.array_equal(np.isnan(proj_r), np.isnan(proj_o))
    ok = ~np.isnan(proj_r)
    np.testing.assert_allclose(proj_o[ok], proj_r[ok], atol=1e-5)


def test_golden_filter_3d(tmp_path):
    """The reference's own 3D medfilt driver
    (/root/reference/src/third_party/anipose/filter_3d.py:33-54
    ``filter_pose`` + ``process_session``:56-79) against
    ``session.filter_pose_3d_csv`` / ``process_session_filter_3d`` on
    the same pose-3d CSVs: identical ops (error-NaN at 15, interpolate,
    median-padded medfilt 17, error:=10) -> near-bitwise columns."""
    import pandas as pd

    _import_reference_triangulate()  # installs shims + aniposelib alias
    import src.third_party.anipose.filter_3d as ref_f3

    from macaque_tpu.tools.session import (
        filter_pose_3d_csv, process_session_filter_3d,
    )

    sess = os.path.join(str(tmp_path), "sess")
    calib, pose, fnames, _, _ = _make_session(sess, n_frame=80, seed=21)
    cfg = _config()
    csv = os.path.join(sess, "pose-3d", "vid-.csv")
    os.makedirs(os.path.dirname(csv), exist_ok=True)
    triangulate_session(cfg, calib, fnames, csv)
    # spread of reprojection errors around the 15 threshold so both
    # branches (filtered / passed-through) are exercised
    d = pd.read_csv(csv)
    rng = np.random.default_rng(2)
    for bp in BODYPARTS:
        e = np.array(d[f"{bp}_error"], float)
        e[rng.random(len(e)) < 0.2] *= 400.0
        if bp == "earL":
            # >85% bad: interpolation must be SKIPPED but the median
            # filter still applied (reference filter_3d.py:25-31 vs 48)
            e[rng.random(len(e)) < 0.95] = 500.0
        d[f"{bp}_error"] = e
    d.to_csv(csv, index=False)

    ref_out = os.path.join(str(tmp_path), "ref_filtered.csv")
    our_out = os.path.join(str(tmp_path), "our_filtered.csv")
    ref_f3.filter_pose(cfg, csv, ref_out)
    filter_pose_3d_csv(cfg, csv, our_out)

    ref = pd.read_csv(ref_out)
    ours = pd.read_csv(our_out)
    assert list(ref.columns) == list(ours.columns)
    for c in ref.columns:
        np.testing.assert_allclose(
            np.asarray(ours[c], float), np.asarray(ref[c], float),
            atol=1e-9, equal_nan=True, err_msg=c)

    # session-level driver: same output file set, skip-existing
    ref_tree = os.path.join(sess, "pose-3d-filtered")
    shutil.rmtree(ref_tree, ignore_errors=True)
    ref_f3.process_session(cfg, sess)
    out_r = sorted(os.listdir(ref_tree))
    shutil.rmtree(ref_tree)
    written = process_session_filter_3d(cfg, sess)
    assert sorted(os.path.basename(w) for w in written) == out_r
    assert process_session_filter_3d(cfg, sess) == []


def test_golden_summarize(tmp_path):
    """The reference's own summarize driver
    (/root/reference/src/third_party/anipose/summarize.py:44-91
    ``make_summarize_fun`` CSV flavor) against
    ``session.summarize_pose3d`` on the same project tree: identical
    concatenated CSV (values + folder/filename/project bookkeeping).
    (The reference's ``summarize_pose3d_filtered`` reads the UNfiltered
    folder — get_pose3d_fnames at summarize.py:92 — an upstream slip
    this repo does not copy; only the correct drivers are compared.)"""
    import pandas as pd

    _import_reference_triangulate()
    import src.third_party.anipose.summarize as ref_sum

    from macaque_tpu.tools.session import (
        process_session_triangulate, summarize_pose3d,
    )

    root = os.path.join(str(tmp_path), "proj")
    sess = os.path.join(root, "sessionA")
    calib, pose, fnames, _, _ = _make_session(sess, n_frame=40, seed=41)
    os.makedirs(os.path.join(sess, "videos-raw"), exist_ok=True)
    cfg = _config()
    cfg["path"] = root
    cfg["project"] = "goldproj"
    process_session_triangulate(cfg, sess)

    our_csv = summarize_pose3d(cfg)
    ours = pd.read_csv(our_csv)
    os.remove(our_csv)  # the reference writes the same path next
    ref_sum.summarize_pose3d(cfg)
    ref = pd.read_csv(our_csv)

    assert list(ref.columns) == list(ours.columns)
    for c in ref.columns:
        r, o = np.asarray(ref[c]), np.asarray(ours[c])
        if r.dtype.kind in "fc":
            np.testing.assert_allclose(o, r, atol=1e-12, equal_nan=True,
                                       err_msg=c)
        else:
            assert np.array_equal(r, o), c


def test_golden_process_session(tmp_path):
    """Session-level driver parity: same pose-2d tree in, same set of
    pose-3d CSVs out (grouping by cam_regex video name, skip-existing),
    with matching values (reference process_session:296-349)."""
    import pandas as pd

    ref_tri = _import_reference_triangulate()

    def build_tree(root):
        sess = os.path.join(root, "sessionA")
        calib, pose, fnames, _, _ = _make_session(sess)
        # both calibration-folder probes must hit: ours keys on
        # calibration_results ('calibration'), the reference on
        # calibration_videos
        os.makedirs(os.path.join(sess, "calibration-videos"),
                    exist_ok=True)
        os.makedirs(os.path.join(sess, "videos-raw"), exist_ok=True)
        return sess

    root_r = os.path.join(str(tmp_path), "ref_proj")
    sess_r = build_tree(root_r)
    root_o = os.path.join(str(tmp_path), "our_proj")
    shutil.copytree(root_r, root_o)
    sess_o = os.path.join(root_o, "sessionA")

    cfg_r = _config()
    cfg_r["path"] = root_r
    cfg_r["pipeline"]["calibration_videos"] = "calibration-videos"
    # reference stores pose-2d under pipeline.pose_2d; ours already does
    cfg_o = _config()
    cfg_o["path"] = root_o

    ref_tri.process_session(cfg_r, sess_r)
    written = process_session_triangulate(cfg_o, sess_o)

    out_r = sorted(os.listdir(os.path.join(sess_r, "pose-3d")))
    out_o = sorted(os.listdir(os.path.join(sess_o, "pose-3d")))
    # same names byte-for-byte — incl. the reference's kept separator
    # ("vid-camA" -> "vid-", common.py:75-80)
    assert out_r == out_o == ["vid-.csv"]
    assert [os.path.basename(w) for w in written] == out_o
    for name in out_o:
        ref = pd.read_csv(os.path.join(sess_r, "pose-3d", name))
        ours = pd.read_csv(os.path.join(sess_o, "pose-3d", name))
        _compare(ref, ours)
    # idempotent skip on both sides
    assert process_session_triangulate(cfg_o, sess_o) == []


def test_golden_tracking_errors(tmp_path, monkeypatch):
    """The reference's own tracking-error evaluator
    (/root/reference/src/third_party/anipose/tracking_errors.py:28-157
    ``get_errors_group``: triangulate human labels, undo the prediction
    CSV's frame correction, per-bodypart L2 + reprojection errors +
    angle errors) against ``session.get_tracking_errors`` on the same
    labeled-data tree and pose-3d CSVs. The reference reads labels via
    DLC pandas-HDF (pytables absent) — same IO-only loader shim as the
    triangulation golden."""
    import pandas as pd

    _import_reference_triangulate()
    import src.third_party.anipose.tracking_errors as ref_te

    from macaque_tpu.tools.session import (
        get_tracking_errors, load_pose2d_fnames as our_loader,
        read_pose2d,
    )

    ref_te.load_pose2d_fnames = our_loader

    root = os.path.join(str(tmp_path), "proj")
    sess = os.path.join(root, "sessionA")
    calib, pose, fnames, kp3d, scores = _make_session(
        sess, n_frame=50, seed=51, drop=0.05)
    os.makedirs(os.path.join(sess, "videos-raw"), exist_ok=True)
    cfg = _config()
    cfg["path"] = root
    cfg["angles"] = {"bend": ["hipL", "neck", "nose"]}
    csv3d = os.path.join(sess, "pose-3d", "vid-.csv")
    os.makedirs(os.path.dirname(csv3d), exist_ok=True)
    triangulate_session(cfg, calib, fnames, csv3d)

    # labeled-data tree: per camera, noisy labels for a few frames,
    # saved in BOTH filename conventions (ours: labels.h5, reference:
    # CollectedData_<scorer>.h5); identical arrays
    pick = [4, 17, 30, 41]
    rng = np.random.default_rng(6)
    labeled = os.path.join(root, "labeled-data")
    group = []
    calib_path = os.path.join(calib, "calibration.toml")
    import h5py  # noqa: F401  (write_pose2d)

    cam_names = sorted(fnames.keys())
    for c, cam in enumerate(cam_names):
        d = read_pose2d(fnames[cam])
        lab = d["points"][pick] + rng.normal(0, 0.3,
                                             (len(pick),
                                              len(BODYPARTS), 2))
        folder = f"vid--{cam}"
        fdir = os.path.join(labeled, folder)
        os.makedirs(fdir)
        for fn in ("labels.h5", "CollectedData_x.h5"):
            write_pose2d(lab, np.ones((len(pick), len(BODYPARTS))),
                         BODYPARTS, os.path.join(fdir, fn))
        pd.DataFrame({
            "framenum": pick,
            "calib": [calib_path] * len(pick),
            "video": [os.path.join(sess, "videos-raw",
                                   f"vid-cam{cam}.avi")] * len(pick),
            "img": [f"img{n}.png" for n in pick],
        }).to_csv(os.path.join(fdir, "anipose_metadata.csv"),
                  index=False)
        group.append((cam, folder))

    import contextlib

    @contextlib.contextmanager
    def chdir(p):
        old = os.getcwd()
        os.chdir(p)
        try:
            yield
        finally:
            os.chdir(old)

    with chdir(root):  # the reference hard-codes 'labeled-data'
        ref = ref_te.get_errors_group(cfg, group, scorer="x")
    our_csv = get_tracking_errors(cfg, labeled_dir=labeled)
    ours = pd.read_csv(our_csv)

    assert list(ref.columns) == list(ours.columns)
    assert len(ref) == len(ours) == len(pick)
    np.testing.assert_array_equal(ref["framenum"], ours["framenum"])
    assert list(ref["img"]) == list(ours["img"])
    for bp in BODYPARTS:
        # predicted 3D: both sides read the same CSV and undo the same
        # M/center — numerically identical
        for ax in "xyz":
            np.testing.assert_allclose(
                ours[f"{bp}_{ax}_pred"], ref[f"{bp}_{ax}_pred"],
                atol=1e-9, equal_nan=True, err_msg=f"{bp}_{ax}_pred")
        np.testing.assert_allclose(
            ours[f"{bp}_reprojerr_pred"], ref[f"{bp}_reprojerr_pred"],
            atol=1e-9, equal_nan=True)
        # labeled 3D: independent DLT formulations, estimator floor
        r = np.asarray(ref[[f"{bp}_x_lab", f"{bp}_y_lab",
                            f"{bp}_z_lab"]], float)
        o = np.asarray(ours[[f"{bp}_x_lab", f"{bp}_y_lab",
                             f"{bp}_z_lab"]], float)
        assert np.array_equal(np.isnan(r), np.isnan(o)), bp
        ok = ~np.isnan(r[:, 0])
        assert np.max(np.linalg.norm(r[ok] - o[ok], axis=1)) < 3.0, bp
        np.testing.assert_allclose(
            ours[f"{bp}_reprojerr_lab"], ref[f"{bp}_reprojerr_lab"],
            atol=0.2, equal_nan=True)
        np.testing.assert_allclose(
            ours[f"{bp}_error"], ref[f"{bp}_error"], atol=3.0,
            equal_nan=True)
    for col in ("bend_lab", "bend_pred", "bend_error"):
        np.testing.assert_allclose(ours[col], ref[col], atol=0.5,
                                   equal_nan=True, err_msg=col)
