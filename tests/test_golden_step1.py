"""Differential golden test: the REFERENCE's own step1 host cascade vs
this repo's ``pipeline/step1.py`` on identical scripted model outputs.

Reference entry point exercised:
  /root/reference/src/pipeline/step1_proc2d.py:166 (process_single_cam)
imported with mmdet/mmpose/mmpretrain/boxmot/imgstore shims — its host
logic (time-grid frame alignment + duplicate-frame carry-forward,
detection-score thresholding, degenerate-box filtering, dynamic margin
expansion + aspect-ratio snap, per-joint score thresholding, per-track
EMA smoothing with displacement gate, ID-confidence gating, valid-frame
filtering, alldata.json/frame_num.npy schema; step1:211-375) is pure
numpy and runs as-is.

The neural models are scripted PURE functions of (frame index, box) /
(patch pixels), shared verbatim by both sides; the tracker handed to the
reference is this repo's BotSortTracker wrapped in the BoxMOT
``update(dets6, img) -> (N, 5+)`` API (step1:240-243), so the test
isolates the cascade logic (the tracker itself is unit-tested in
test_tracking.py). The script includes sub-threshold detections, one
fully-empty frame, degenerate (zero-int-width) boxes, sub-threshold
keypoints, >disp_thr keypoint jumps, and low-confidence collar reads,
plus dropped store frames so several grid ticks alias to one frame.
"""

import json
import os
import sys
import types

import numpy as np
import pytest

from macaque_tpu.core.config import Step1Config, VALID_COLLAR_CLASSES
from macaque_tpu.pipeline.step1 import process_camera
from macaque_tpu.tools.synthetic import (
    IMG_H, IMG_W, decode_index, encode_index, make_test_rig, project_scene,
    simulate_scene,
)
from macaque_tpu.video.timegrid import make_time_grid

CAM = 0
N_ANIMAL = 2
N_STORE = 96          # store frames before dropping
DROPPED = (40, 41)    # store rows removed -> grid ticks alias to row 39
EMPTY_FRAME = 30      # every detection sub-threshold on this frame
J = 17
MAX_DET = 6

ANIMAL_COLORS = [(255, 64, 64), (64, 255, 64)]  # BGR per animal


# --------------------------------------------------------------- scene


def _build_scene():
    rig = make_test_rig(2, seed=21)
    kp3d = simulate_scene(N_ANIMAL, N_STORE, seed=22)
    proj = project_scene(rig, kp3d)  # (C, A, T, J, 2)
    return proj


def _render_frames(proj):
    """Colored body rectangles + frame-index code (pure function of t)."""
    import cv2

    frames = np.zeros((N_STORE, IMG_H, IMG_W, 3), np.uint8)
    for t in range(N_STORE):
        img = frames[t]
        img[:] = 30
        for a in range(N_ANIMAL):
            pts = proj[CAM, a, t]
            ok = np.isfinite(pts).all(axis=1)
            if ok.sum() < 3:
                continue
            x1, y1 = pts[ok].min(axis=0)
            x2, y2 = pts[ok].max(axis=0)
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)),
                          ANIMAL_COLORS[a], -1)
        encode_index(img, t)
    return frames


# ------------------------------------------------- scripted pure models


def det_script(proj, t):
    """Detections for frame t: GT boxes with deterministic scores,
    periodic sub-threshold dropouts, one all-empty frame, and a
    periodic degenerate (zero-int-width) ghost box."""
    boxes, scores = [], []
    for a in range(N_ANIMAL):
        pts = proj[CAM, a, t]
        ok = np.isfinite(pts).all(axis=1)
        if ok.sum() < 3:
            continue
        x1, y1 = pts[ok].min(axis=0) - 6
        x2, y2 = pts[ok].max(axis=0) + 6
        s = 0.86 + 0.13 * (((t * 7 + a * 13) % 11) / 11.0)
        if (t + 5 * a) % 23 == 0:
            s = 0.5                       # this animal missed this frame
        if t == EMPTY_FRAME:
            s = 0.3                       # whole frame below threshold
        boxes.append([x1, y1, x2, y2])
        scores.append(s)
    if t % 9 == 4:                        # degenerate after int cast
        boxes.append([50.2, 60.0, 50.9, 200.0])
        scores.append(0.97)
    return (np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(scores, np.float32))


def _match_animal(proj, t, box):
    cx, cy = (box[0] + box[2]) / 2, (box[1] + box[3]) / 2
    best, bd = -1, np.inf
    for a in range(N_ANIMAL):
        pts = proj[CAM, a, t]
        ok = np.isfinite(pts).all(axis=1)
        if ok.sum() < 3:
            continue
        c = pts[ok].mean(axis=0)
        d = (c[0] - cx) ** 2 + (c[1] - cy) ** 2
        if d < bd:
            bd, best = d, a
    return best


def pose_script(proj, t, box):
    """(J, 2) keypoints + (J,) scores as a pure function of (t, box):
    GT projection + small deterministic wobble + periodic >disp_thr
    jumps (EMA gate probe); scores cycle through [0, 1) so ~30% fall
    under kp_thr=0.3."""
    a = _match_animal(proj, t, box)
    if a < 0:
        return np.full((J, 2), np.nan), np.zeros(J)
    kp = proj[CAM, a, t].copy()
    jj = np.arange(J)
    kp[:, 0] += 2.0 * np.sin(0.7 * t + jj)
    kp[:, 1] += 2.0 * np.cos(0.9 * t + 1.7 * jj)
    jump = (t * 13 + jj * 7) % 29 == 0
    kp[jump, 0] += 40.0                   # exceeds disp_thr -> no EMA
    scores = ((t * 31 + jj * 17) % 97) / 96.0
    return kp, scores


def id_rule(patch224):
    """Collar read from a 224x224 patch: dominant BGR channel ->
    animal -> collar class; deterministic sub-0.8 confidence cases."""
    mean = patch224.reshape(-1, 3).mean(axis=0)
    a = int(np.argmax(mean[:2]))          # animal 0 blue-ish, 1 green-ish
    label = VALID_COLLAR_CLASSES[a]
    q = int(mean.sum()) % 13
    score = 0.7 + 0.3 * (q / 12.0)        # in [0.7, 1.0]; some below 0.8
    return label, float(score)


def classify_patch(patch):
    """Shared crop->resize->rule path (reference classify_patches
    resizes to 224x224 INTER_LINEAR before the model; step1:140-155)."""
    import cv2

    h, w = patch.shape[:2]
    if h <= 0 or w <= 0:
        return -1, 0.0
    resized = cv2.resize(patch, (224, 224), interpolation=cv2.INTER_LINEAR)
    return id_rule(resized)


# ------------------------------------------------ this repo's backend


class ScriptedBackend:
    max_det = MAX_DET

    def __init__(self, proj):
        self.proj = proj

    def detect(self, frames_bgr):
        B = len(frames_bgr)
        boxes = np.zeros((B, MAX_DET, 4), np.float32)
        scores = np.zeros((B, MAX_DET), np.float32)
        for bi, f in enumerate(frames_bgr):
            b, s = det_script(self.proj, decode_index(f))
            n = min(len(s), MAX_DET)
            boxes[bi, :n] = b[:n]
            scores[bi, :n] = s[:n]
        return boxes, scores

    def pose(self, frames_bgr, boxes, valid):
        B, D = valid.shape
        out = np.full((B, D, J, 3), np.nan)
        for bi, f in enumerate(frames_bgr):
            t = decode_index(f)
            for k in range(D):
                if not valid[bi, k]:
                    continue
                kp, ks = pose_script(self.proj, t, boxes[bi, k])
                out[bi, k, :, :2] = kp
                out[bi, k, :, 2] = ks
        return out

    def classify(self, frames_bgr, boxes, valid):
        B, D = valid.shape
        labels = np.full((B, D), -1, int)
        scores = np.zeros((B, D))
        for bi, f in enumerate(frames_bgr):
            for k in range(D):
                if not valid[bi, k]:
                    continue
                x1, y1, x2, y2 = (int(v) for v in boxes[bi, k])
                lab, sc = classify_patch(f[y1:y2, x1:x2])
                labels[bi, k] = lab
                scores[bi, k] = sc
        return labels, scores


# ----------------------------------------------------------- fake store


class FakeStore:
    """Both APIs: imgstore (get_image(fnum)/get_next_image, reference
    step1:191-223) and this repo's reader (get_image(frame_index=...))."""

    def __init__(self, frames, fnums, ftimes, name="golden.fake0"):
        self.frames = frames
        self.fnums = np.asarray(fnums)
        self.ftimes = np.asarray(ftimes, float)
        self.filename = name
        self._pos = 0

    def get_frame_metadata(self):
        return {"frame_number": self.fnums, "frame_time": self.ftimes}

    def get_image(self, frame_number=None, frame_index=None):
        if frame_index is not None:
            row = int(frame_index)
        else:
            row = int(np.nonzero(self.fnums == frame_number)[0][0])
        self._pos = row + 1
        return self.frames[row], (int(self.fnums[row]),
                                  float(self.ftimes[row]))

    def get_next_image(self):
        return self.get_image(frame_index=self._pos)


def _make_store(frames):
    rng = np.random.default_rng(23)
    ftimes = 1000.0 + np.arange(N_STORE) / 24.0 + rng.uniform(
        -0.002, 0.002, N_STORE)
    ftimes = np.sort(ftimes)
    keep = np.setdiff1d(np.arange(N_STORE), np.asarray(DROPPED))
    return frames[keep], np.arange(N_STORE)[keep], ftimes[keep]


# ------------------------------------------- reference import with shims


def _module(name):
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        sys.modules[name] = m
    return m


def _import_ref_step1(proj):
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    from macaque_tpu.tracking import BotSortTracker, TrackerParams

    class FakeBotSort:
        """BoxMOT BotSort API over this repo's tracker (step1:77-89)."""

        def __init__(self, **cfg):
            self.t = BotSortTracker(TrackerParams(
                track_high_thresh=cfg["track_high_thresh"],
                track_low_thresh=cfg["track_low_thresh"],
                new_track_thresh=cfg["new_track_thresh"],
                track_buffer=cfg["track_buffer"],
                match_thresh=cfg["match_thresh"],
            ))

        def update(self, dets6, img):
            tb, tids = self.t.update(dets6[:, :4], dets6[:, 4])
            if len(tids) == 0:
                return np.zeros((0, 5))
            return np.hstack([np.asarray(tb, float),
                              np.asarray(tids, float)[:, None]])

    class _NS:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    def inference_detector(detector, imgs, test_pipeline=None):
        import torch

        out = []
        for img in imgs:
            b, s = det_script(proj, decode_index(img))
            out.append(_NS(pred_instances=_NS(
                bboxes=torch.tensor(b), scores=torch.tensor(s))))
        return out

    def inference_topdown(pose_model, img, bboxes=None, bbox_format="xyxy"):
        t = decode_index(img)
        res = []
        for box in bboxes:
            kp, ks = pose_script(proj, t, np.asarray(box, float))
            res.append(_NS(pred_instances=_NS(
                keypoints=kp[None], keypoint_scores=ks[None])))
        return res

    class FakeIdInferencer:
        def __call__(self, patches, batch_size=None):
            return [dict(zip(("pred_label", "pred_score"), id_rule(p)))
                    for p in patches]

    mmcv_t = _module("mmcv.transforms")
    mmcv_t.Compose = lambda x: x
    _module("mmcv").transforms = mmcv_t
    mme_l = _module("mmengine.logging")
    mme_l.print_log = lambda *a, **k: None
    _module("mmengine").logging = mme_l
    mmdet_a = _module("mmdet.apis")
    mmdet_a.init_detector = lambda *a, **k: None
    mmdet_a.inference_detector = inference_detector
    _module("mmdet").apis = mmdet_a
    mmpose_a = _module("mmpose.apis")
    mmpose_a.init_model = lambda *a, **k: None
    mmpose_a.inference_topdown = inference_topdown
    _module("mmpose").apis = mmpose_a
    mmpre = _module("mmpretrain")
    mmpre.ImageClassificationInferencer = FakeIdInferencer
    mmpre_u = _module("mmpretrain.utils")
    mmpre_u.register_all_modules = lambda **k: None
    mmpre.utils = mmpre_u
    bb = _module("boxmot.trackers.botsort.botsort")
    bb.BotSort = FakeBotSort
    _module("boxmot.trackers.botsort").botsort = bb
    _module("boxmot.trackers")
    _module("boxmot")
    _module("imgstore")

    from src.pipeline import step1_proc2d as ref1

    return ref1, FakeBotSort, FakeIdInferencer


# ----------------------------------------------------------------- test


@pytest.fixture(scope="module")
def golden_step1(tmp_path_factory):
    root = tmp_path_factory.mktemp("golden_step1")
    proj = _build_scene()
    frames_all = _render_frames(proj)
    frames, fnums, ftimes = _make_store(frames_all)
    T = make_time_grid(ftimes, 24.0)

    ref1, FakeBotSort, FakeIdInferencer = _import_ref_step1(proj)
    out_ref = str(root / "ref")
    ref1.process_single_cam(
        FakeStore(frames, fnums, ftimes), out_ref, T,
        detector=object(), tracker=FakeBotSort(**ref1.BOTSORT_CFG),
        pose_model=object(), test_pipeline=None,
        id_model=FakeIdInferencer(),
    )

    out_mine = str(root / "mine")
    process_camera(
        FakeStore(frames, fnums, ftimes), out_mine, T,
        ScriptedBackend(proj), cfg=Step1Config(), chunk=16,
    )

    def load(d):
        with open(os.path.join(d, "alldata.json")) as f:
            data = json.load(f)
        fn = np.load(os.path.join(d, "frame_num.npy"))
        return data, fn

    return load(out_ref), load(out_mine)


def test_frame_numbers_equal(golden_step1):
    (_, fn_ref), (_, fn_mine) = golden_step1
    np.testing.assert_array_equal(fn_ref, fn_mine)


def test_scene_exercises_all_paths(golden_step1):
    (ref, _), _ = golden_step1
    n_rows = [len(fr) for fr in ref]
    assert 0 in n_rows, "empty-frame path never hit"
    assert max(n_rows) >= 2
    ids = [row[6] for fr in ref for row in fr]
    assert -1 in ids, "low-confidence collar path never hit"
    assert any(i >= 0 for i in ids)
    kp_scores = np.asarray(
        [[c[2] for c in row[5]] for fr in ref for row in fr])
    assert (kp_scores == 0.0).any(), "sub-threshold keypoint path never hit"


def test_alldata_rows_equal(golden_step1):
    (ref, _), (mine, _) = golden_step1
    assert len(ref) == len(mine)
    for fi, (fr, fm) in enumerate(zip(ref, mine)):
        assert len(fr) == len(fm), f"frame {fi}: row count differs"
        for r, m in zip(fr, fm):
            assert r[0] == m[0], f"frame {fi}: track id"
            np.testing.assert_allclose(r[1:5], m[1:5], atol=1e-6,
                                       err_msg=f"frame {fi}: bbox")
            kr = np.asarray(r[5], float)
            km = np.asarray(m[5], float)
            np.testing.assert_array_equal(np.isnan(kr), np.isnan(km),
                                          err_msg=f"frame {fi}: NaN pattern")
            np.testing.assert_allclose(
                np.nan_to_num(kr), np.nan_to_num(km), atol=1e-6,
                err_msg=f"frame {fi}: keypoints")
            assert r[6] == m[6], f"frame {fi}: assigned collar id"
            np.testing.assert_allclose(r[7], m[7], atol=1e-9)
