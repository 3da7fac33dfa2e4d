"""Differential golden test: the REFERENCE's own anipose project-level
calibration driver (/root/reference/src/third_party/anipose/
calibrate.py:120-227 ``process_session`` — vendored-aniposelib board
detection via cv2.findChessboardCorners, per-camera cv2.calibrateCamera
init, iterative sampled bundle adjustment) against
``tools.session.calibrate_all`` on IDENTICAL rendered board videos.

The reference emits a pinhole calibration.toml (matrix + distortions),
this framework an omnidir one (Mei, xi free) — both are loaded back
through this repo's loader (pinhole maps to Mei with xi=0, pinned by
test_golden_aniposelib.py::test_golden_pinhole) and compared as
geometry: gauge-aligned relative camera centers near each other and the
ground truth, both calibrations at a sub-pixel reprojection floor.

Environment shims as in test_golden_session (numba pass-through, toml;
cv2 chessboard detection and calibrateCamera are the real library).
"""

import os
import shutil

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from macaque_tpu.tools import session as ses
from tests.test_calib_workflow import (
    IMG_H, IMG_W, K_GT, render_board_view,
)
from tests.test_golden_session import _import_reference_triangulate

N_VIEW = 9


def _make_tree(root, cam_M, views):
    from macaque_tpu.calib.graph_init import get_rtvec

    sess = os.path.join(root, "sessionA")
    calib_dir = os.path.join(sess, "calibration")
    os.makedirs(calib_dir)
    for i, name in enumerate("AB"):
        vw = cv2.VideoWriter(
            os.path.join(calib_dir, f"calib-cam{name}.avi"),
            cv2.VideoWriter_fourcc(*"MJPG"), 24, (IMG_W, IMG_H))
        for M_board in views:
            rvec, tvec = get_rtvec(cam_M[i] @ M_board)
            vw.write(cv2.cvtColor(render_board_view(rvec, tvec),
                                  cv2.COLOR_GRAY2BGR))
        vw.release()
    return sess


def _config(root):
    cfg = ses.load_session_config(os.path.join(root, "missing.toml"))
    cfg["path"] = root
    cfg["triangulation"]["cam_regex"] = r"cam([A-Z])"
    cfg["calibration"].update(board_type="checkerboard",
                              board_size=[9, 6],
                              board_square_side_length=23.0)
    cfg["manual_verification"] = {"manually_verify": False}
    return cfg


def _rel_center(rig_like_rvec, rig_like_tvec):
    import macaque_tpu.calib.workflow as wf

    c0 = wf.camera_position(rig_like_rvec[0], rig_like_tvec[0])
    c1 = wf.camera_position(rig_like_rvec[1], rig_like_tvec[1])
    d = c1 - c0
    return d / np.linalg.norm(d), np.linalg.norm(d)


@pytest.mark.slow
def test_golden_calibrate_session(tmp_path):
    from macaque_tpu.calib.graph_init import get_rtvec, make_M
    from macaque_tpu.compat.aniposelib import CameraGroup

    _import_reference_triangulate()
    import src.third_party.anipose.calibrate as ref_cal

    rng = np.random.default_rng(13)
    cam_M = [make_M(rng.normal(0, 0.03, 3),
                    np.array([-80.0 + 160.0 * i, rng.normal(0, 8),
                              rng.normal(0, 8)]))
             for i in range(2)]
    views = [make_M(np.array([np.pi, 0, 0]) + rng.uniform(-0.3, 0.3, 3),
                    np.array([rng.uniform(-60, 40),
                              rng.uniform(-40, 20),
                              rng.uniform(520, 760)]))
             for _ in range(N_VIEW)]

    root_r = os.path.join(str(tmp_path), "ref_proj")
    sess_r = _make_tree(root_r, cam_M, views)
    root_o = os.path.join(str(tmp_path), "our_proj")
    shutil.copytree(root_r, root_o)
    sess_o = os.path.join(root_o, "sessionA")

    ref_cal.process_session(_config(root_r), sess_r)
    ses.process_session_calibrate(_config(root_o), sess_o)

    toml_r = os.path.join(sess_r, "calibration", "calibration.toml")
    toml_o = os.path.join(sess_o, "calibration", "calibration.toml")
    assert os.path.exists(toml_r) and os.path.exists(toml_o)
    # both drivers cache raw detections next to the result
    assert os.path.exists(os.path.join(sess_r, "calibration",
                                       "detections.pickle"))
    assert os.path.exists(os.path.join(sess_o, "calibration",
                                       "detections.pickle"))

    g_ref = CameraGroup.load(toml_r)   # pinhole -> Mei(xi=0)
    g_our = CameraGroup.load(toml_o)
    assert g_ref.get_names() == g_our.get_names() == ["A", "B"]

    # both calibrations reach a sub-pixel floor on their own report
    assert g_ref.rig.metadata["error"] < 1.0, g_ref.rig.metadata
    assert g_our.rig.metadata["error"] < 1.0, g_our.rig.metadata

    # geometry: relative camera direction and baseline length near the
    # truth on both sides (full-BA scale gauge -> compare direction
    # exactly, length to a few %)
    dir_t, len_t = _rel_center(
        np.stack([get_rtvec(M)[0] for M in cam_M]),
        np.stack([get_rtvec(M)[1] for M in cam_M]))
    dir_r, len_r = _rel_center(g_ref.rig.rvec, g_ref.rig.tvec)
    dir_o, len_o = _rel_center(g_our.rig.rvec, g_our.rig.tvec)
    # direction vectors live in each side's own world frame; compare
    # via the angle to the truth expressed in cam0's frame
    dir_t_cam0 = cam_M[0][:3, :3] @ dir_t
    for d, side in ((dir_r, "ref"), (dir_o, "ours")):
        cos = abs(float(np.dot(d, dir_t_cam0)))
        assert cos > 0.999, (side, cos)
    assert abs(len_r - len_t) / len_t < 0.05, (len_r, len_t)
    assert abs(len_o - len_t) / len_t < 0.05, (len_o, len_t)

    # focal length recovered by both. The reference fits a plain
    # pinhole (fx directly comparable); ours fits Mei with xi free,
    # whose small-angle pinhole-equivalent focal is f/(1+xi)
    fx_ref = g_ref.rig.K[:, 0, 0]  # pinhole toml -> Mei(xi=0): K=matrix
    fx_our = g_our.rig.K[:, 0, 0] / (1.0 + g_our.rig.xi)
    # near-frontal planar views leave a focal<->distortion<->depth
    # valley: the reference itself lands ~6.5% low (fx ~561) at an
    # 0.08 px floor; assert the same percent-level neighbourhood for
    # both rather than pretending either pins the focal exactly
    np.testing.assert_allclose(fx_ref, 600.0, rtol=0.10)
    np.testing.assert_allclose(fx_our, 600.0, rtol=0.10)

    # skip-if-done on both sides (reference calibrate.py:158-165):
    # a second run must leave the artifacts untouched
    m_r = os.path.getmtime(toml_r)
    m_o = os.path.getmtime(toml_o)
    ref_cal.process_session(_config(root_r), sess_r)
    assert ses.process_session_calibrate(_config(root_o), sess_o) is None
    assert os.path.getmtime(toml_r) == m_r
    assert os.path.getmtime(toml_o) == m_o
