import numpy as np

from macaque_tpu.tools.evaluation import (
    evaluate_detections, evaluate_keypoints, oks, bbox_iou_np,
)


def test_perfect_detections_ap1():
    rng = np.random.default_rng(0)
    pb, ps, gb = [], [], []
    for _ in range(10):
        boxes = rng.uniform(0, 400, (3, 2))
        boxes = np.concatenate([boxes, boxes + rng.uniform(50, 150, (3, 2))], 1)
        gb.append(boxes)
        pb.append(boxes.copy())
        ps.append(rng.uniform(0.5, 1.0, 3))
    r = evaluate_detections(pb, ps, gb)
    assert r["mAP"] > 0.99 and r["AP50"] > 0.99


def test_detection_ap_penalizes_misses_and_fps():
    gb = [np.array([[0, 0, 100, 100], [200, 200, 300, 300.0]])]
    pb = [np.array([[0, 0, 100, 100], [500, 500, 600, 600.0]])]
    ps = [np.array([0.9, 0.8])]
    r = evaluate_detections(pb, ps, gb)
    # one TP of two GT with one FP: AP ~ 0.5 at every threshold
    assert 0.3 < r["mAP"] < 0.6


def test_oks_identity_and_decay():
    rng = np.random.default_rng(1)
    kp = rng.uniform(0, 200, (1, 17, 2))
    gt = np.concatenate([kp[0], np.ones((17, 1))], axis=1)[None]
    area = np.array([10000.0])
    s = oks(kp, gt, area)
    assert s[0, 0] > 0.999
    s2 = oks(kp + 30.0, gt, area)
    assert s2[0, 0] < s[0, 0]


def test_keypoint_ap_with_jitter():
    rng = np.random.default_rng(2)
    pk, ps, gk, ga = [], [], [], []
    for _ in range(8):
        kp = rng.uniform(50, 450, (2, 17, 2))
        gt = np.concatenate([kp, np.ones((2, 17, 1))], axis=2)
        pk.append(kp + rng.normal(0, 1.5, kp.shape))
        ps.append(rng.uniform(0.7, 1.0, 2))
        gk.append(gt)
        ga.append(np.full(2, 40000.0))
    r = evaluate_keypoints(pk, ps, gk, ga)
    assert r["AP"] > 0.9
    assert r["AP50"] >= r["AP75"] >= 0.0
