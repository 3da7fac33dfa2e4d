"""Steps 2-4 on an 8-camera rig, feeding synthetic alldata.json directly
(no video) — validates the full-rig path (the reference hard-codes
n_cam=8 in step3; this framework must handle any count, here proven at 8
after the 4-camera e2e tests)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from macaque_tpu.cameras import omnidir_project
from macaque_tpu.cameras.rig import CameraRig
from macaque_tpu.pipeline.artifacts import write_alldata, read_pickle
from macaque_tpu.pipeline.step2 import run_step2
from macaque_tpu.pipeline.step3 import run_step3
from macaque_tpu.pipeline.step4 import run_step4
from macaque_tpu.core.config import VALID_COLLAR_CLASSES
from macaque_tpu.tools.synthetic import make_test_rig, simulate_scene


def synth_alldata(rig, kp3d, noise=1.0, seed=0):
    """Ground-truth projections -> per-camera alldata.json structures."""
    rng = np.random.default_rng(seed)
    A, T, J, _ = kp3d.shape
    cam = rig.omni()
    proj = np.asarray(
        omnidir_project(cam, jnp.asarray(kp3d.reshape(-1, 3)))
    ).reshape(rig.n_cam, A, T, J, 2)

    alldata = []
    for c in range(rig.n_cam):
        frames = []
        for t in range(T):
            dets = []
            for a in range(A):
                pts = proj[c, a, t] + rng.normal(0, noise, (J, 2))
                x1, y1 = pts.min(axis=0) - 5
                x2, y2 = pts.max(axis=0) + 5
                kp = [[float(x), float(y), float(rng.uniform(0.8, 0.99))]
                      for x, y in pts]
                dets.append([
                    a + 1,  # stable per-camera 2D track id
                    float(x1), float(y1), float(x2), float(y2),
                    kp, int(VALID_COLLAR_CLASSES[a % 4]),
                    float(rng.uniform(0.9, 0.99)),
                ])
            frames.append(dets)
        alldata.append(frames)
    return alldata


@pytest.fixture(scope="module")
def eight_cam_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("eight")
    rig = make_test_rig(8, seed=5)
    kp3d = simulate_scene(2, 80, seed=9)
    alldata = synth_alldata(rig, kp3d)
    rd = str(root / "results" / "synth")
    for c, cam_id in enumerate(rig.camera_ids):
        write_alldata(os.path.join(rd, cam_id), alldata[c],
                      np.arange(80, dtype=np.int32))
    run_step2(rd, rig)
    run_step3(rd, rig)
    run_step4(rd, rig)
    return dict(rd=rd, rig=rig, kp3d=kp3d)


def test_eight_camera_reconstruction(eight_cam_run):
    out = read_pickle(os.path.join(eight_cam_run["rd"], "kp3d.pickle"))
    kp3d = np.asarray(out["kp3d"])
    gt = eight_cam_run["kp3d"]
    T3 = min(kp3d.shape[1], gt.shape[1])
    for a in range(2):
        e = np.linalg.norm(kp3d[a, :T3] - gt[a, :T3], axis=-1)
        assert np.nanmedian(e) < 30.0, f"animal {a}: {np.nanmedian(e)}"


def test_eight_camera_kp2d_shape(eight_cam_run):
    kp2d = np.asarray(read_pickle(
        os.path.join(eight_cam_run["rd"], "kp2d.pickle")))
    assert kp2d.shape[2] == 8  # full 8-camera axis, not hard-coded
