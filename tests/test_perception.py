"""FlaxPerception integration: tiny real models through the full
detect/pose/classify chunk programs."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from macaque_tpu.nn import (
    ViTPose, VitPoseConfig, SwinMaskRCNN, DetectorConfig,
    ResNetClassifier, ResNetConfig,
)
from macaque_tpu.nn.swin import SwinConfig
from macaque_tpu.pipeline.perception import FlaxPerception
from dataclasses import dataclass


@dataclass(frozen=True)
class TinyResNetConfig(ResNetConfig):
    @property
    def stage_blocks(self):
        return (1, 1)


@pytest.fixture(scope="module")
def perception():
    det_cfg = DetectorConfig(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 4, 8)),
        rpn_nms_pre=64, rpn_max=64, rcnn_max=8,
    )
    det = SwinMaskRCNN(det_cfg)
    pose_cfg = VitPoseConfig(img_size=(64, 48), embed_dim=32, depth=1,
                             num_heads=2, deconv_channels=(8, 8))
    pose = ViTPose(pose_cfg)
    idm = ResNetClassifier(TinyResNetConfig())

    rng = jax.random.PRNGKey(0)
    det_vars = det.init(rng, jnp.zeros((1, 128, 96, 3)))
    pose_vars = pose.init(rng, jnp.zeros((1, 64, 48, 3)))
    id_vars = idm.init(rng, jnp.zeros((1, 224, 224, 3)))
    return FlaxPerception(det, det_vars, pose, pose_vars, idm, id_vars,
                          max_det=4)


def test_perception_chunk_shapes(perception):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, 130, 100, 3), dtype=np.uint8)
    boxes, scores = perception.detect(frames)
    assert boxes.shape == (3, 4, 4)
    assert scores.shape == (3, 4)

    tb = np.tile(np.array([10.0, 10, 60, 90]), (3, 4, 1))
    valid = np.ones((3, 4), bool)
    valid[1, 2:] = False
    kps = perception.pose(frames, tb, valid)
    assert kps.shape == (3, 4, 17, 3)
    assert np.isnan(kps[1, 3]).all()      # invalid slots are NaN
    assert np.isfinite(kps[0, 0]).all()
    # keypoints land within/near the expanded box
    assert (kps[0, 0, :, 0] > -40).all() and (kps[0, 0, :, 0] < 130).all()

    labels, lsc = perception.classify(frames, tb, valid)
    assert labels.shape == (3, 4)
    assert (labels[1, 2:] == -1).all()
    assert (lsc >= 0).all() and (lsc <= 1).all()


def test_detect_batch_matches_single(perception):
    """detect_batch must reproduce the single-image path exactly —
    batching only changes scheduling, not math."""
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (3, 128, 96, 3), dtype=np.uint8)
    imgs = jnp.asarray(frames).astype(jnp.float32)
    det = perception.detector_model
    dv = perception.detector_vars
    bb, sb, vb = det.apply(dv, imgs, method="detect_batch")
    for i in range(3):
        b1, s1, v1 = det.apply(dv, imgs[i : i + 1])
        # box coords to float reduction-order noise (batched matmuls
        # split reductions differently); 5e-4 px is far below any
        # meaningful coordinate difference
        np.testing.assert_allclose(np.asarray(bb[i]), np.asarray(b1),
                                   rtol=1e-5, atol=5e-4)
        np.testing.assert_allclose(np.asarray(sb[i]), np.asarray(s1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(vb[i]), np.asarray(v1))


def test_perception_fast_preset(perception):
    """The MACAQUE_TPU_FAST tier (run_demo.build_flax_perception):
    smaller detector input target + single-pass pose (flip_test=False)
    keeps the same output contract."""
    p = FlaxPerception(
        perception.detector_model, perception.detector_vars,
        perception.pose_model, perception.pose_vars,
        perception.id_model, perception.id_vars,
        max_det=4, flip_test=False, det_target=96,
    )
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (2, 130, 100, 3), dtype=np.uint8)
    boxes, scores = p.detect(frames)
    assert boxes.shape == (2, 4, 4) and scores.shape == (2, 4)
    # boxes come back in ORIGINAL image coordinates whatever the
    # detector's resize target is
    assert np.nanmax(boxes) <= 135.0

    tb = np.tile(np.array([10.0, 10, 60, 90]), (2, 4, 1))
    valid = np.ones((2, 4), bool)
    kps = p.pose(frames, tb, valid)
    assert kps.shape == (2, 4, 17, 3)
    assert np.isfinite(np.asarray(kps)).all()


def test_perception_int8_pose_path():
    """FlaxPerception with the int8-quantized pose model (the
    MACAQUE_TPU_INT8 serving toggle in run_demo.build_flax_perception)
    produces finite keypoints with the same output contract."""
    from macaque_tpu.nn.quant import quantize_vitpose_params

    det_cfg = DetectorConfig(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 4, 8)),
        rpn_nms_pre=64, rpn_max=64, rcnn_max=8,
    )
    det = SwinMaskRCNN(det_cfg)
    pose_cfg = VitPoseConfig(img_size=(64, 48), embed_dim=32, depth=1,
                             num_heads=2, deconv_channels=(8, 8))
    pose = ViTPose(pose_cfg)
    q_pose = ViTPose(VitPoseConfig(img_size=(64, 48), embed_dim=32,
                                   depth=1, num_heads=2,
                                   deconv_channels=(8, 8),
                                   quantize="int8"))
    idm = ResNetClassifier(TinyResNetConfig())

    rng = jax.random.PRNGKey(0)
    det_vars = det.init(rng, jnp.zeros((1, 128, 96, 3)))
    pose_vars = pose.init(rng, jnp.zeros((1, 64, 48, 3)))
    id_vars = idm.init(rng, jnp.zeros((1, 224, 224, 3)))
    p = FlaxPerception(det, det_vars, q_pose,
                       quantize_vitpose_params(pose_vars), idm, id_vars,
                       max_det=4)

    rng_np = np.random.default_rng(1)
    frames = rng_np.integers(0, 255, (2, 130, 100, 3), dtype=np.uint8)
    tb = np.tile(np.array([10.0, 10, 60, 90]), (2, 4, 1))
    valid = np.ones((2, 4), bool)
    kps = p.pose(frames, tb, valid)
    assert kps.shape == (2, 4, 17, 3)
    assert np.isfinite(np.asarray(kps)).all()
