"""Differential golden test: run the REFERENCE's own visualizer
(/root/reference/src/pipeline/visualize_result.py:136 proc — per-frame
cv2.omnidir reprojection + circle/ellipse skeleton drawing + mp4 encode)
and this repo's tools/visualize.render_overlay on the SAME kp3d pickle
and the SAME imgstore recording, then compare the rendered videos.

Shims (tests/oracles.py + here): cv2.omnidir (NumPy Mei model) and an
``imgstore`` module backed by macaque_tpu.video.imgstore.ImgStoreReader
(whose get_image/get_frame_metadata API is imgstore's).

The comparison is drawn-pixel masks per frame (both videos use lossy
mp4v, so exact equality is off the table): with a flat gray background,
every skeleton pixel differs strongly from the background, and the two
renderers must put them in the same places.
"""

import os
import pickle
import sys
import types
import contextlib

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from macaque_tpu.tools.synthetic import make_test_rig, simulate_scene
from macaque_tpu.tools.visualize import render_overlay
from macaque_tpu.video.imgstore import ImgStoreReader, write_imgstore

N_CAM = 4
N_ANIMAL = 2
N_FRAME = 16
N_KP = 17
# the reference hard-codes its VideoWriter to 2048x1536
# (visualize_result.py:166); frames of any other size are silently
# dropped by cv2, so the golden store must be exactly that big
REF_W, REF_H = 2048, 1536
BG = 120  # flat gray background
# the reference's clrs are 0/1 tuples scaled x255 inside draw_kps
# (visualize_result.py:95-97) — pass the effective 255-scale values
REF_COLORS = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]


def _install_imgstore_shim():
    m = sys.modules.get("imgstore")
    if m is None or not hasattr(m, "new_for_filename"):
        m = types.ModuleType("imgstore")
        sys.modules["imgstore"] = m
    m.new_for_filename = lambda mdata: ImgStoreReader(
        os.path.dirname(mdata))


def _import_reference_vis():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests.oracles import install_cv2_omnidir_shim

    install_cv2_omnidir_shim()
    _install_imgstore_shim()
    from src.pipeline import visualize_result as ref_vis

    return ref_vis


@contextlib.contextmanager
def _chdir(path):
    old = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(old)


def _read_frames(path):
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return frames


@pytest.fixture(scope="module")
def rendered(tmp_path_factory):
    root = tmp_path_factory.mktemp("golden_vis")
    rig = make_test_rig(N_CAM, seed=41)
    kp3d = simulate_scene(N_ANIMAL, N_FRAME, seed=42)
    rng = np.random.default_rng(43)
    scores = rng.uniform(0.4, 1.0, (N_ANIMAL, N_FRAME, N_KP))
    # some missing keypoints (NaN coords + NaN score, the pipeline's
    # missing-value convention)
    drop = rng.random(scores.shape) < 0.1
    kp3d[drop] = np.nan
    scores[drop] = np.nan
    # animal 1 fully invalid in frames 3-5: the reference's clean_kp
    # aggregate rule (cnt == 0 with show_as_possible) must skip it
    kp3d[1, 3:6] = np.nan
    scores[1, 3:6] = np.nan

    calib = str(root / "calib")
    cfg_path = rig.to_h5(calib)
    # the reference formats camera ids with '{:d}' (vis:144) — its own
    # calib/config.yaml holds ints; rewrite ours to match
    import yaml

    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    cfg["camera_id"] = [int(c) for c in cfg["camera_id"]]
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    cam_id = rig.camera_ids[0]
    raw = str(root / "raw")
    frames = np.full((N_FRAME, REF_H, REF_W, 3), BG, np.uint8)
    write_imgstore(os.path.join(raw, f"golden.{cam_id}"), frames,
                   fourcc="FFV1")

    work = root / "work"
    results = work / "results3D" / "golden"
    camdir = results / cam_id
    os.makedirs(camdir, exist_ok=True)
    os.makedirs(work / "output", exist_ok=True)
    data = {
        "kp3d": kp3d, "kp3d_score": scores,
        "kp3d_err": np.zeros((N_ANIMAL, N_FRAME, N_KP)),
        "joint_len": np.zeros(16),
    }
    with open(results / "kp3d.pickle", "wb") as f:
        pickle.dump(data, f)
    np.save(camdir / "frame_num.npy", np.arange(N_FRAME, dtype=np.int64))

    ref_vis = _import_reference_vis()
    with _chdir(str(work)):
        ref_vis.proc("golden", 0, cfg_path, raw_data_dir=raw)
    ref_path = str(work / "output" / f"golden_{cam_id}.mp4")
    assert os.path.exists(ref_path)

    my_path = str(root / "mine.mp4")
    render_overlay("golden", 0, str(results), raw, rig,
                   out_path=my_path, mrksize=3, colors=REF_COLORS)
    return dict(ref=ref_path, mine=my_path)


def test_visualizer_video_parity(rendered):
    ref_frames = _read_frames(rendered["ref"])
    my_frames = _read_frames(rendered["mine"])
    assert len(ref_frames) == N_FRAME
    assert len(my_frames) == N_FRAME
    ious = []
    for rf, mf in zip(ref_frames, my_frames):
        assert rf.shape == mf.shape == (REF_H, REF_W, 3)
        rm = np.abs(rf.astype(np.int16) - BG).max(axis=-1) > 40
        mm = np.abs(mf.astype(np.int16) - BG).max(axis=-1) > 40
        assert rm.sum() > 200  # both actually drew skeletons
        assert mm.sum() > 200
        inter = (rm & mm).sum()
        union = (rm | mm).sum()
        ious.append(inter / max(union, 1))
    ious = np.asarray(ious)
    # identical draw calls modulo sub-pixel reprojection (JAX f32 vs the
    # NumPy f64 shim) and mp4 codec ringing at the edges
    assert ious.min() > 0.85, ious
    assert ious.mean() > 0.92, ious


def test_visualizer_skips_fully_invalid_animal(rendered):
    """Frames 3-5 have animal 1 fully invalid: both renderers must draw
    strictly fewer pixels there than in neighbouring frames."""
    for path in (rendered["ref"], rendered["mine"]):
        frames = _read_frames(path)
        counts = [
            (np.abs(f.astype(np.int16) - BG).max(axis=-1) > 40).sum()
            for f in frames
        ]
        two_animal = np.mean([counts[t] for t in (0, 1, 2, 7, 8)])
        one_animal = np.mean(counts[3:6])
        assert one_animal < 0.75 * two_animal, (one_animal, two_animal)
