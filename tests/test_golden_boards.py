"""Differential golden tests: the REFERENCE's vendored aniposelib
boards/utils data plumbing (/root/reference/src/third_party/aniposelib/
boards.py merge_rows / extract_points / extract_rtvecs, utils.py
get_initial_extrinsics) against this repo's calib.videos /
calib.graph_init equivalents on identical synthetic detection rows.
"""

import copy
import sys

import numpy as np

from macaque_tpu.calib.graph_init import (
    initial_extrinsics_from_board_poses, make_M,
)
from macaque_tpu.calib.videos import (
    Checkerboard, extract_points, extract_rtvecs, merge_rows,
)

N_CAM = 4
N_VIEW = 24


def _import_reference():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests.oracles import (
        install_cv2_omnidir_shim, install_numba_shim, install_toml_shim,
    )

    install_numba_shim()
    install_toml_shim()
    install_cv2_omnidir_shim()
    import src.third_party.aniposelib.boards as ref_boards
    import src.third_party.aniposelib.utils as ref_utils

    return ref_boards, ref_utils


def _rows(seed=0):
    """Per-camera detection rows for a 6x5 checkerboard waved through a
    4-camera rig: some frames unseen per camera, one row with too few
    valid corners, one row with a missing board pose."""
    rng = np.random.default_rng(seed)
    import cv2

    board = Checkerboard(6, 5, 40.0)
    P = board.n_points
    objp = board.object_points()

    # camera extrinsics (world -> cam)
    cam_M = []
    for i in range(N_CAM):
        rv = rng.normal(0, 0.4, 3)
        tv = np.array([rng.uniform(-80, 80), rng.uniform(-80, 80),
                       rng.uniform(700, 1100)])
        cam_M.append(make_M(rv, tv))

    all_rows = [[] for _ in range(N_CAM)]
    for v in range(N_VIEW):
        # board pose in world
        Mb = make_M(rng.normal(0, 0.5, 3),
                    np.array([rng.uniform(-150, 150),
                              rng.uniform(-150, 150),
                              rng.uniform(-100, 100)]))
        for c in range(N_CAM):
            if rng.random() < 0.25:
                continue  # camera missed this view
            M = cam_M[c] @ Mb  # board -> cam c
            rvec = cv2.Rodrigues(M[:3, :3])[0].ravel()
            rvec += rng.normal(0, 1e-4, 3)
            tvec = M[:3, 3] + rng.normal(0, 0.05, 3)
            pts = (objp @ M[:3, :3].T + M[:3, 3])[:, :2] * 3.0 + 500.0
            filled = pts + rng.normal(0, 0.05, pts.shape)
            row = {
                "framenum": v * 5 + 2,
                "filled": filled.reshape(-1, 1, 2),
                "corners": filled.reshape(-1, 1, 2),
                "ids": np.arange(P),
                "rvec": rvec.reshape(3, 1),
                "tvec": tvec.reshape(3, 1),
            }
            if v == 3 and c == 1:
                f = row["filled"].copy()
                f[4:] = np.nan  # only 4 valid corners -> min_points drop
                row["filled"] = f
            if v == 5 and c == 2:
                row["rvec"] = None  # pose estimation failed
                row["tvec"] = None
            all_rows[c].append(row)
    return board, all_rows


def test_golden_merge_rows():
    ref_boards, _ = _import_reference()
    _, all_rows = _rows()
    names = [f"cam{c}" for c in range(N_CAM)]
    ref = ref_boards.merge_rows(copy.deepcopy(all_rows), names)
    got = merge_rows(copy.deepcopy(all_rows), names)
    assert len(ref) == len(got)
    for r, g in zip(ref, got):
        assert set(r.keys()) == set(g.keys())
        for k in r:
            assert r[k]["framenum"] == g[k]["framenum"]
            np.testing.assert_array_equal(r[k]["filled"], g[k]["filled"])


def test_golden_extract_points():
    ref_boards, _ = _import_reference()
    board, all_rows = _rows()
    ref_board = ref_boards.Checkerboard(6, 5, square_length=40.0)
    names = [f"cam{c}" for c in range(N_CAM)]

    for min_cameras in (1, 2):
        m_ref = ref_boards.merge_rows(copy.deepcopy(all_rows), names)
        m_got = merge_rows(copy.deepcopy(all_rows), names)
        imgp_r, extra_r = ref_boards.extract_points(
            m_ref, ref_board, cam_names=names, min_cameras=min_cameras)
        imgp_g, extra_g = extract_points(
            m_got, board, cam_names=names, min_cameras=min_cameras)
        np.testing.assert_array_equal(np.isnan(imgp_r), np.isnan(imgp_g))
        np.testing.assert_allclose(np.nan_to_num(imgp_g),
                                   np.nan_to_num(imgp_r), atol=0)
        np.testing.assert_allclose(extra_g["objp"], extra_r["objp"],
                                   atol=0)
        np.testing.assert_array_equal(extra_g["ids"], extra_r["ids"])
        for k in ("rvecs", "tvecs"):
            np.testing.assert_allclose(np.nan_to_num(extra_g[k]),
                                       np.nan_to_num(extra_r[k]), atol=0)


def test_golden_extract_rtvecs():
    ref_boards, _ = _import_reference()
    _, all_rows = _rows()
    names = [f"cam{c}" for c in range(N_CAM)]
    m_ref = ref_boards.merge_rows(copy.deepcopy(all_rows), names)
    m_got = merge_rows(copy.deepcopy(all_rows), names)
    for min_cameras in (1, 2):
        rt_r = ref_boards.extract_rtvecs(m_ref, cam_names=names,
                                         min_cameras=min_cameras)
        rt_g = extract_rtvecs(m_got, cam_names=names,
                              min_cameras=min_cameras)
        np.testing.assert_array_equal(np.isnan(rt_r), np.isnan(rt_g))
        np.testing.assert_allclose(np.nan_to_num(rt_g),
                                   np.nan_to_num(rt_r), atol=0)


def test_golden_initial_extrinsics():
    """Spanning-tree extrinsic initialization: both must recover the
    rig's camera-0-anchored extrinsics from the same noisy board poses
    (the two implementations use different robust averaging — cluster
    pruning vs sigma rejection — so agreement is at the injected noise
    scale, and both must sit near the truth)."""
    ref_boards, ref_utils = _import_reference()
    rng = np.random.default_rng(1)
    _, all_rows = _rows(seed=1)
    names = [f"cam{c}" for c in range(N_CAM)]
    merged = merge_rows(copy.deepcopy(all_rows), names)
    rt = extract_rtvecs(merged, cam_names=names, min_cameras=1)

    rv_ref, tv_ref = ref_utils.get_initial_extrinsics(rt)

    board_poses = [
        [None if np.isnan(rt[c, v, 0]) else (rt[c, v, :3], rt[c, v, 3:])
         for v in range(rt.shape[1])]
        for c in range(N_CAM)
    ]
    rv_our, tv_our = initial_extrinsics_from_board_poses(board_poses)

    M0_r = [make_M(rv_ref[c], tv_ref[c]) for c in range(N_CAM)]
    M0_o = [make_M(rv_our[c], tv_our[c]) for c in range(N_CAM)]
    # both anchor camera 0 at identity
    np.testing.assert_allclose(M0_r[0], np.eye(4), atol=1e-12)
    np.testing.assert_allclose(M0_o[0], np.eye(4), atol=1e-12)
    for c in range(1, N_CAM):
        diff = M0_o[c] @ np.linalg.inv(M0_r[c])
        np.testing.assert_allclose(diff[:3, :3], np.eye(3), atol=2e-3)
        assert np.linalg.norm(diff[:3, 3]) < 1.0  # mm, noise-scale
