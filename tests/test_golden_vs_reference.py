"""Differential golden tests: run the REFERENCE's own step2/step3
implementations (pure numpy/scipy/networkx/cv2 — importable on CPU) and
this repo's TPU-native stages on the SAME synthetic ``alldata.json``, and
assert the discrete matching decisions and numeric outputs agree.

Reference entry points exercised:
  /root/reference/src/pipeline/step2_crossviewmatching.py:854 (proc)
  /root/reference/src/pipeline/step3_crossframematching.py:36 (main_proc)

The reference hard-codes n_cam=8 in several step3 helpers
(step3:218,681,883-884,919), so the scene uses an 8-camera rig.
"""

import json
import os
import pickle
import shutil
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow

from macaque_tpu.cameras import omnidir_project
from macaque_tpu.core.config import (
    CrossViewConfig, CrossFrameConfig, VALID_COLLAR_CLASSES,
)
from macaque_tpu.pipeline.artifacts import write_alldata, read_pickle
from macaque_tpu.pipeline.step2 import run_step2
from macaque_tpu.pipeline.step3 import run_step3
from macaque_tpu.tools.synthetic import make_test_rig, simulate_scene

N_CAM = 8
N_ANIMAL = 2
N_FRAME = 120


def _import_reference():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import matplotlib

    matplotlib.use("Agg")
    # this OpenCV build lacks the omnidir contrib module; give the
    # reference code the NumPy Mei-model shim (itself parity-checked in
    # test_cameras/test_golden shim tests)
    from tests.oracles import install_cv2_omnidir_shim

    install_cv2_omnidir_shim()
    # step3 imports `imgstore` at module top; only its (unused) visualize
    # path needs it
    sys.modules.setdefault("imgstore", types.ModuleType("imgstore"))
    from src.pipeline import step2_crossviewmatching as ref2
    from src.pipeline import step3_crossframematching as ref3

    return ref2, ref3


def test_omnidir_shim_roundtrip():
    """The cv2.omnidir shim handed to the reference must invert the Mei
    projection to normalized coords exactly (sub-1e-8)."""
    from tests.oracles import omni_project_np, omni_undistort_np

    rig = make_test_rig(2, seed=3)
    rng = np.random.default_rng(4)
    pts3d = rng.uniform(-500, 500, (50, 3)) + np.array([0, 0, 400.0])
    import cv2

    for i in range(rig.n_cam):
        R, _ = cv2.Rodrigues(rig.rvec[i])
        Xc = pts3d @ R.T + rig.tvec[i]
        gt_norm = Xc[:, :2] / Xc[:, 2:3]
        pix = omni_project_np(rig.K[i], rig.xi[i], rig.D[i], rig.rvec[i],
                              rig.tvec[i], pts3d)
        und = omni_undistort_np(pix, rig.K[i], rig.D[i], rig.xi[i])
        assert np.abs(und - gt_norm).max() < 1e-8


from macaque_tpu.tools.synthetic import synthesize_alldata as make_golden_alldata


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    root = tmp_path_factory.mktemp("golden")
    rig = make_test_rig(N_CAM, seed=11)
    kp3d = simulate_scene(N_ANIMAL, N_FRAME, seed=12)
    percam = make_golden_alldata(rig, kp3d, seed=13)

    calib = str(root / "calib")
    cfg_path = rig.to_h5(calib)

    dirs = {}
    for tag in ("ref", "mine"):
        rd = str(root / f"results_{tag}" / "golden")
        for c, cam_id in enumerate(rig.camera_ids):
            write_alldata(os.path.join(rd, cam_id), percam[c],
                          np.arange(N_FRAME, dtype=np.int32))
        dirs[tag] = rd
    return dict(rig=rig, kp3d=kp3d, cfg_path=cfg_path, root=str(root),
                **dirs)


@pytest.fixture(scope="module")
def step2_done(golden):
    ref2, _ = _import_reference()
    ref2.proc("golden", os.path.dirname(golden["ref"]), "unused",
              golden["cfg_path"])
    run_step2(golden["mine"], golden["rig"], CrossViewConfig())
    ref_mk = read_pickle(os.path.join(golden["ref"],
                                      "match_keyframe.pickle"))
    my_mk = read_pickle(os.path.join(golden["mine"],
                                     "match_keyframe.pickle"))
    return ref_mk, my_mk


def test_step2_keyframe_parity(step2_done):
    ref_mk, my_mk = step2_done
    assert len(ref_mk) == len(my_mk) > 5
    n_persons_ref = 0
    mismatched_kf = []
    for rkf, mkf in zip(ref_mk, my_mk):
        assert rkf["frame"] == mkf["frame"]
        rset = {tuple(np.asarray(b).tolist()) for b in rkf["bcomb"]}
        mset = {tuple(np.asarray(b).tolist()) for b in mkf["bcomb"]}
        n_persons_ref += len(rset)
        if rset != mset:
            mismatched_kf.append((rkf["frame"], rset, mset))
    assert n_persons_ref >= len(ref_mk) * N_ANIMAL * 0.9
    assert not mismatched_kf, mismatched_kf[:3]


def test_step2_pose3d_parity(step2_done):
    ref_mk, my_mk = step2_done
    errs = []
    for rkf, mkf in zip(ref_mk, my_mk):
        rmap = {tuple(np.asarray(b).tolist()): np.asarray(p)
                for b, p in zip(rkf["bcomb"], rkf["pose3d"])}
        mmap = {tuple(np.asarray(b).tolist()): np.asarray(p)
                for b, p in zip(mkf["bcomb"], mkf["pose3d"])}
        for key in set(rmap) & set(mmap):
            d = np.linalg.norm(rmap[key] - mmap[key], axis=-1)
            errs.append(np.nanmax(d))
    assert errs
    # DLT formulations differ (pinv vs normal equations) but must agree
    # to well under a millimetre on identical inputs
    assert float(np.nanmax(errs)) < 1.0, float(np.nanmax(errs))


@pytest.fixture(scope="module")
def step3_done(golden, step2_done):
    """Run both step3 implementations on the REFERENCE's step2 output so
    the differential isolates step3 logic."""
    _, ref3 = _import_reference()
    shutil.copy(os.path.join(golden["ref"], "match_keyframe.pickle"),
                os.path.join(golden["mine"], "match_keyframe.pickle"))
    ref3.main_proc(golden["cfg_path"], golden["ref"])
    run_step3(golden["mine"], golden["rig"], CrossFrameConfig())
    return golden


def test_step3_kp2d_parity(step3_done):
    ref_kp = read_pickle(os.path.join(step3_done["ref"], "kp2d.pickle"))
    my_kp = read_pickle(os.path.join(step3_done["mine"], "kp2d.pickle"))
    ref_kp = np.asarray(ref_kp)
    my_kp = np.asarray(my_kp)
    assert ref_kp.shape == my_kp.shape, (ref_kp.shape, my_kp.shape)
    ref_nan = np.isnan(ref_kp)
    my_nan = np.isnan(my_kp)
    total = ref_kp[..., 0].size
    # identical NaN pattern (same detections assigned to same animals)
    frac_pattern = (ref_nan == my_nan).mean()
    assert frac_pattern > 0.999, frac_pattern
    both = ~ref_nan & ~my_nan
    assert both.any()
    assert np.allclose(ref_kp[both], my_kp[both], atol=1e-6), (
        float(np.abs(ref_kp[both] - my_kp[both]).max()))
    # and the matrix is actually populated (both animals tracked)
    filled = (~my_nan[..., 0]).mean(axis=(1, 2, 3))
    assert (filled[:N_ANIMAL] > 0.5).all(), filled
