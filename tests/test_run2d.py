"""2D-only video pipeline (tools/run2d.py — the run_2D /
check_skeleton notebook surface)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

from macaque_tpu.nn import (
    ViTPose, VitPoseConfig, SwinMaskRCNN, DetectorConfig,
    ResNetClassifier, ResNetConfig,
)
from macaque_tpu.nn.swin import SwinConfig
from macaque_tpu.pipeline.perception import FlaxPerception
from dataclasses import dataclass


@dataclass(frozen=True)
class _TinyResNet(ResNetConfig):
    @property
    def stage_blocks(self):
        return (1, 1)


@pytest.fixture(scope="module")
def tiny_perception():
    det = SwinMaskRCNN(DetectorConfig(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 4, 8)),
        rpn_nms_pre=64, rpn_max=64, rcnn_max=8,
    ))
    pose = ViTPose(VitPoseConfig(img_size=(64, 48), embed_dim=32, depth=1,
                                 num_heads=2, deconv_channels=(8, 8)))
    idm = ResNetClassifier(_TinyResNet())
    rng = jax.random.PRNGKey(0)
    return FlaxPerception(
        det, det.init(rng, jnp.zeros((1, 128, 96, 3))),
        pose, pose.init(rng, jnp.zeros((1, 64, 48, 3))),
        idm, idm.init(rng, jnp.zeros((1, 224, 224, 3))),
        max_det=4,
    )


def test_render_2d_video(tmp_path, tiny_perception):
    from macaque_tpu.tools.run2d import render_2d_video

    src = str(tmp_path / "src.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                        (96, 128))
    rng = np.random.default_rng(0)
    for _ in range(6):
        w.write(rng.integers(0, 255, (128, 96, 3), dtype=np.uint8))
    w.release()

    out = str(tmp_path / "out.mp4")
    # det_thr 0 so the random-weight detector always produces boxes
    stats = render_2d_video(src, out, tiny_perception, det_thr=0.0,
                            chunk=4)
    assert stats["frames"] == 6
    assert stats["detections"] > 0
    cap = cv2.VideoCapture(out)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n == 6


def test_check_skeleton(tiny_perception):
    from macaque_tpu.tools.run2d import check_skeleton

    frame = np.random.default_rng(1).integers(
        0, 255, (128, 96, 3), dtype=np.uint8)
    img, kps = check_skeleton(frame, tiny_perception, det_thr=0.0)
    assert img.shape == frame.shape
    assert kps.ndim == 3 and kps.shape[1:] == (17, 3)
