"""COCO eval driver (tools/coco_eval.py): harness pinned on a synthetic
scene with an oracle backend — near-perfect AP on clean detections,
degraded AP when predictions are corrupted."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from macaque_tpu.tools.coco_eval import load_coco, run_coco_eval
from macaque_tpu.tools.synthetic import (
    make_test_rig, simulate_scene, project_scene, SyntheticPerception,
    encode_index,
)


@pytest.fixture(scope="module")
def coco_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    rig = make_test_rig(1, seed=41)
    kp3d = simulate_scene(2, 24, seed=42)
    proj = project_scene(rig, kp3d)          # (C, A, T, J, 2)

    imgdir = str(root / "images")
    os.makedirs(imgdir)
    images, annotations = [], []
    aid = 1
    for t in range(24):
        fname = f"f{t:03d}.png"
        img = np.full((480, 640, 3), 30, np.uint8)
        for a in range(2):
            pts = proj[0, a, t]
            x1, y1 = pts.min(axis=0) - 8
            x2, y2 = pts.max(axis=0) + 8
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)),
                          (0, 180, 0), -1)
            kp = np.concatenate(
                [pts, np.full((pts.shape[0], 1), 2.0)], axis=1)
            annotations.append({
                "id": aid, "image_id": t, "category_id": 1,
                "bbox": [float(x1), float(y1), float(x2 - x1),
                         float(y2 - y1)],
                "area": float((x2 - x1) * (y2 - y1)),
                "keypoints": kp.ravel().tolist(),
            })
            aid += 1
        # the oracle backend reads the frame index from the image
        encode_index(img, t)
        cv2.imwrite(os.path.join(imgdir, fname), img)
        images.append({"id": t, "file_name": fname,
                       "width": 640, "height": 480})
    ann_file = str(root / "test.json")
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "macaque"}]}, f)
    return dict(rig=rig, proj=proj, imgdir=imgdir, ann=ann_file)


def test_load_coco(coco_scene):
    data = load_coco(coco_scene["ann"])
    assert len(data) == 24
    assert data[0]["boxes"].shape == (2, 4)
    assert data[0]["keypoints"].shape == (2, 17, 3)


class _FrameOracle:
    """SyntheticPerception keyed by sequential call order (the eval
    driver feeds images one by one, in file order = frame order)."""

    def __init__(self, proj, jitter=0.0, seed=0):
        self.inner = SyntheticPerception(0, proj, noise=0.5)
        self.max_det = self.inner.max_det
        self.jitter = jitter
        self.rng = np.random.default_rng(seed)

    def detect(self, frames):
        b, s = self.inner.detect(frames)
        if self.jitter:
            b = b + self.rng.normal(0, self.jitter, b.shape)
        return b, s

    def pose(self, frames, boxes, valid):
        out = self.inner.pose(frames, boxes, valid)
        if self.jitter:
            out[..., :2] += self.rng.normal(0, self.jitter,
                                            out[..., :2].shape)
        return out

    def classify(self, frames, boxes, valid):
        return self.inner.classify(frames, boxes, valid)


def test_eval_oracle_near_perfect(coco_scene):
    back = _FrameOracle(coco_scene["proj"])
    res = run_coco_eval(back, coco_scene["imgdir"], coco_scene["ann"],
                        det_thr=0.5, progress=False)
    assert res["n_images"] == 24
    assert res["det"]["AP50"] > 0.95, res
    assert res["pose"]["AP50"] > 0.95, res
    assert res["det"]["mAP"] > 0.5   # tight IoU thresholds bite noise


def test_eval_degrades_with_corruption(coco_scene):
    clean = run_coco_eval(_FrameOracle(coco_scene["proj"]),
                          coco_scene["imgdir"], coco_scene["ann"],
                          det_thr=0.5, progress=False)
    bad = run_coco_eval(_FrameOracle(coco_scene["proj"], jitter=25.0),
                        coco_scene["imgdir"], coco_scene["ann"],
                        det_thr=0.5, progress=False)
    assert bad["det"]["mAP"] < clean["det"]["mAP"] - 0.1
    assert bad["pose"]["AP"] < clean["pose"]["AP"] - 0.1
