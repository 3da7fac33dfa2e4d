"""Weights-in end-to-end drill: .pth -> converter -> Orbax cache ->
``run_demo.proc()`` on a synthetic FFMPEG-chunk imgstore.

The real released checkpoints ship out-of-band (reference README.md:86),
so the real-data entry (reference run_demo.py:21-55 /
info_replication.md:26-42) has never been executable here. This drill
proves the whole weights-in path with mechanically generated
full-architecture .pth state dicts (the same builders
test_convert_fullscale.py pins against the converters):

  1. torch.save the full ViTPose-huge / Swin-S Mask R-CNN / ResNet-152
     state dicts as the reference's weights layout,
  2. run ``proc()`` — which converts through torch, caches as Orbax,
     builds FlaxPerception, and runs steps 1-4 on a multi-chunk
     VideoImgStoreFFMPEG recording with real calibration h5 files,
  3. assert the reference artifact set exists,
  4. delete the .pth files and rebuild the perception — proving later
     runs restore from the Orbax cache without torch.

Zero-filled weights make the drill deterministic: every detector logit
is 0 -> foreground softmax 0.5 < the 0.85 pipeline threshold -> no
detections -> the (CPU-infeasible) full-size pose/ID programs are
provably skipped (pipeline/step1.py empty-chunk path) while detection
still executes the converted Swin end-to-end. The serving tier +
MACAQUE_TPU_DET_TARGET=256 bound the CPU detect cost; the wiring under
drill is tier-independent.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import test_convert_fullscale as fullscale  # noqa: E402


def _save_pth(path, shapes):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    sd = {k: torch.zeros(tuple(s)) for k, s in shapes.items()}
    torch.save(sd, path)


def test_weights_in_proc_end_to_end(tmp_path, monkeypatch):
    from macaque_tpu.tools.synthetic import (
        make_test_rig, simulate_scene, project_scene, render_stores,
    )

    # --- the reference's weights layout (step1_proc2d.py:52-65) ---
    weights = tmp_path / "model"
    _save_pth(str(weights / "pose/pose.pth"), fullscale.mm_vitpose_full())
    _save_pth(str(weights / "detection/detection.pth"),
              fullscale.mm_swin_maskrcnn_full())
    _save_pth(str(weights / "id/id_finetuned.pth"),
              fullscale.mm_resnet152_full())

    # --- synthetic recording in the production FFMPEG-chunk layout ---
    n_frame, n_cam = 16, 2
    rig = make_test_rig(n_cam)
    kp3d = simulate_scene(2, n_frame, seed=7)
    proj = project_scene(rig, kp3d)
    raw = tmp_path / "videos"
    render_stores(str(raw), "drill", rig, proj,
                  fourcc="mp4v", chunksize=7)
    calib = tmp_path / "calib"
    cfg_yaml = rig.to_h5(str(calib))

    monkeypatch.setenv("MACAQUE_TPU_WEIGHTS", str(weights))
    monkeypatch.setenv("MACAQUE_TPU_SERVING", "1")
    monkeypatch.setenv("MACAQUE_TPU_DET_TARGET", "256")

    import run_demo

    results = tmp_path / "results3D"
    rd = run_demo.proc("drill", 24.0, str(results), "cpu", cfg_yaml,
                       str(raw), render=False)

    # --- the reference artifact set (SURVEY §2.4) ---
    for cam in rig.camera_ids:
        assert os.path.exists(os.path.join(rd, cam, "alldata.json"))
        assert os.path.exists(os.path.join(rd, cam, "frame_num.npy"))
        with open(os.path.join(rd, cam, "alldata.json")) as f:
            alldata = json.load(f)
        # the uniform time grid arange(t0, t_end, 1/fps) has n_frame-1
        # interior ticks (reference step1:418 does the same)
        assert len(alldata) >= n_frame - 1
        # zero weights -> provably no detections above 0.85
        assert all(len(fr) == 0 for fr in alldata)
    for art in ("match_keyframe.pickle", "kp2d.pickle", "kp3d.pickle",
                "track.pickle", "collar_id.pickle", "config.toml",
                "calibration.toml"):
        assert os.path.exists(os.path.join(rd, art)), art

    from macaque_tpu.pipeline.artifacts import read_pickle

    k3 = read_pickle(os.path.join(rd, "kp3d.pickle"))
    assert set(k3) >= {"kp3d", "kp3d_score", "kp3d_err"}
    assert not np.isfinite(np.asarray(k3["kp3d"])).any()  # empty scene

    # --- Orbax cache round trip: later runs need no torch/.pth ---
    cache = weights / "orbax_cache"
    for name in ("pose", "detection", "id_finetuned"):
        assert (cache / f"{name}.orbax").exists(), name
    for pth in ("pose/pose.pth", "detection/detection.pth",
                "id/id_finetuned.pth"):
        os.unlink(weights / pth)

    from macaque_tpu.pipeline.weights import build_flax_perception

    perc = build_flax_perception(str(weights))
    assert perc.det_target == 256 and perc.max_det == 8
