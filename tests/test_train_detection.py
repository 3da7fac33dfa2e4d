"""Detection-head training: MaxIoUAssigner / RandomSampler semantics
against hand-computed oracles, box-coder round trips, and loss descent
on a synthetic box dataset (reference train_cfg:
model/detection/SWIN-Mask_R-CNN_bbox_only.py:186-222).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from macaque_tpu.nn.train import (
    iou_matrix, bbox2delta, max_iou_assign, random_sample_masks,
    rpn_loss, roi_loss,
)


def test_iou_matrix_oracle():
    a = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 15, 15]])
    b = jnp.asarray([[0.0, 0, 10, 10], [10, 10, 20, 20]])
    got = np.asarray(iou_matrix(a, b))
    want = np.array([
        [1.0, 0.0],
        [25 / 175, 25 / 175],
    ])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bbox2delta_roundtrip():
    from macaque_tpu.nn.ops import delta2bbox

    rng = np.random.default_rng(0)
    props = rng.uniform(0, 100, (20, 2))
    props = np.concatenate([props, props + rng.uniform(5, 60, (20, 2))], 1)
    gt = rng.uniform(0, 100, (20, 2))
    gt = np.concatenate([gt, gt + rng.uniform(5, 60, (20, 2))], 1)
    for stds in [(1.0, 1, 1, 1), (0.1, 0.1, 0.2, 0.2)]:
        deltas = bbox2delta(jnp.asarray(props), jnp.asarray(gt), stds)
        back = delta2bbox(jnp.asarray(props), deltas, stds=stds)
        np.testing.assert_allclose(np.asarray(back), gt, atol=1e-3)


def test_max_iou_assign_hand_cases():
    """Hand-computed MaxIoUAssigner cases (mmdet semantics, RPN
    thresholds 0.7/0.3/0.3)."""
    gt = jnp.asarray([[0.0, 0, 10, 10], [20, 20, 30, 26]])
    gt_valid = jnp.asarray([True, True])
    boxes = jnp.asarray([
        [0.0, 0, 10, 10],    # IoU 1.0 with gt0 -> pos, gt 0
        [0.0, 0, 10, 5],     # IoU 0.5 with gt0 -> ignore band...
        [40.0, 40, 50, 50],  # IoU 0 -> negative
        [20.0, 20, 30, 30],  # IoU 0.6 with gt1: ignore band BUT best
                             # for gt1 -> low-quality match
    ])
    a = np.asarray(max_iou_assign(boxes, gt, gt_valid,
                                  pos_iou_thr=0.7, neg_iou_thr=0.3,
                                  min_pos_iou=0.3,
                                  match_low_quality=True))
    # box 1 (IoU 0.5 w/ gt0): in the ignore band, but it is NOT gt0's
    # best (box 0 is), so it stays ignored
    assert a[0] == 0
    assert a[1] == -2
    assert a[2] == -1
    assert a[3] == 1  # rescued by match_low_quality

    # without low-quality matching, box 3 stays ignored
    a2 = np.asarray(max_iou_assign(boxes, gt, gt_valid,
                                   pos_iou_thr=0.7, neg_iou_thr=0.3,
                                   min_pos_iou=0.3,
                                   match_low_quality=False))
    assert a2[3] == -2

    # invalid gts never assign
    a3 = np.asarray(max_iou_assign(boxes, gt,
                                   jnp.asarray([True, False]),
                                   0.7, 0.3, 0.3, True))
    assert a3[3] == -1  # gt1 masked -> box 3 has IoU 0 -> negative


def test_max_iou_assign_tie_later_gt_wins():
    """mmdet's per-gt loop assigns later gts over earlier ones when a
    box ties as best for both."""
    gt = jnp.asarray([[0.0, 0, 10, 10], [0.0, 0, 10, 10]])
    boxes = jnp.asarray([[0.0, 0, 10, 5]])   # IoU 0.5 with both
    a = np.asarray(max_iou_assign(boxes, gt, jnp.asarray([True, True]),
                                  0.7, 0.3, 0.3, True))
    assert a[0] == 1


def test_random_sample_masks_counts():
    rng = jax.random.PRNGKey(0)
    assigned = jnp.asarray([0] * 40 + [-1] * 500 + [-2] * 60)
    pos_s, neg_s, avg = random_sample_masks(assigned, 256, 0.5, rng)
    pos_s, neg_s = np.asarray(pos_s), np.asarray(neg_s)
    # only 40 positives exist (< 128 wanted) -> all taken, negatives
    # fill to 256
    assert pos_s.sum() == 40
    assert neg_s.sum() == 216
    assert float(avg) == 256.0
    assert not (pos_s & neg_s).any()
    ass = np.asarray(assigned)
    assert (ass[pos_s] >= 0).all()
    assert (ass[neg_s] == -1).all()

    # plentiful positives are capped at num * pos_fraction
    assigned2 = jnp.asarray([0] * 400 + [-1] * 400)
    pos2, neg2, avg2 = random_sample_masks(assigned2, 256, 0.5, rng)
    assert np.asarray(pos2).sum() == 128
    assert np.asarray(neg2).sum() == 128


def test_rpn_roi_losses_zero_at_perfect_prediction():
    """With logits strongly favouring ground truth and exact deltas,
    both losses go to ~0; with inverted logits they are large."""
    anchors = [np.array([[0.0, 0, 10, 10], [20, 20, 30, 30],
                         [40, 40, 50, 50]])]
    gt = jnp.asarray([[0.0, 0, 10, 10]])
    gt_valid = jnp.asarray([True])
    key = jax.random.PRNGKey(1)

    # perfect: +big logit on the matching anchor, -big elsewhere
    cls = jnp.asarray([50.0, -50.0, -50.0]).reshape(1, 1, 3)
    reg = jnp.zeros((1, 1, 12))  # anchor == gt -> zero deltas
    lc, lr = rpn_loss([(cls, reg)], anchors, gt, gt_valid, key)
    assert float(lc) < 1e-3 and float(lr) < 1e-6

    cls_bad = -cls
    lc2, _ = rpn_loss([(cls_bad, reg)], anchors, gt, gt_valid, key)
    assert float(lc2) > 1.0

    # RoI: proposals = anchors, first matches gt
    props = jnp.asarray(anchors[0])
    assigned = max_iou_assign(props, gt, gt_valid, 0.5, 0.5, 0.5, True)
    cls_logits = jnp.asarray([[50.0, -50], [-50, 50], [-50, 50]])
    reg_roi = jnp.zeros((3, 4))
    lc3, lr3 = roi_loss(cls_logits, reg_roi, props, assigned, gt, key)
    assert float(lc3) < 1e-3 and float(lr3) < 1e-6


@pytest.mark.slow
def test_detection_training_descends():
    """A tiny Swin Mask R-CNN fits a synthetic single-box dataset: the
    total loss must drop substantially over a few dozen steps."""
    from macaque_tpu.nn import SwinMaskRCNN, DetectorConfig
    from macaque_tpu.nn.swin import SwinConfig
    from macaque_tpu.nn.train import (
        make_detection_optimizer, make_detection_train_step,
    )

    cfg = DetectorConfig(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 4, 8)),
        rpn_nms_pre=64, rpn_max=64, rcnn_max=8,
    )
    model = SwinMaskRCNN(cfg)
    rng = np.random.default_rng(0)

    def make_batch(key):
        r = np.random.default_rng(key)
        imgs = np.full((2, 96, 96, 3), 0.1, np.float32)
        gts = np.zeros((2, 2, 4), np.float32)
        valid = np.zeros((2, 2), bool)
        for b in range(2):
            x, y = r.uniform(8, 48, 2)
            w, h = r.uniform(24, 40, 2)
            imgs[b, int(y):int(y + h), int(x):int(x + w)] = 1.0
            gts[b, 0] = [x, y, x + w, y + h]
            valid[b, 0] = True
        return (jnp.asarray(imgs), jnp.asarray(gts), jnp.asarray(valid))

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 96, 96, 3)))
    params = variables["params"]
    opt = make_detection_optimizer(params, lr=3e-4)
    opt_state = opt.init(params)
    step = make_detection_train_step(model, opt, num_proposals=64)

    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(30):
        key, sub = jax.random.split(key)
        imgs, gts, valid = make_batch(i % 4)
        params, opt_state, metrics = step(params, opt_state, sub,
                                          imgs, gts, valid)
        losses.append(float(metrics["loss"]))
    # robust descent check: late average well below early average
    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert late < early * 0.6, (early, late, losses)
    assert np.isfinite(losses).all()
