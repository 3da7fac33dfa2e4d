"""Perception backends for stage 1: detection, top-down pose, collar ID.

``FlaxPerception`` runs the real Flax models (nn/) as three jitted chunk
programs; anything implementing the same three methods (e.g. the synthetic
oracle in tests) plugs into ``run_step1`` — the reference's equivalent
seam is the mmdet/mmpose/mmpretrain inference APIs (step1:95-122).

All methods take a whole frame chunk and fixed-capacity box tables so the
device programs compile once per chunk shape.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol, Tuple

import numpy as np


class PerceptionBackend(Protocol):
    max_det: int

    def detect(self, frames_bgr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(B, H, W, 3) uint8 -> boxes (B, D, 4) xyxy image coords,
        scores (B, D); empty slots score 0."""

    def pose(self, frames_bgr: np.ndarray, boxes: np.ndarray,
             valid: np.ndarray) -> np.ndarray:
        """-> keypoints (B, D, 17, 3) [x, y, score] in image coords."""

    def classify(self, frames_bgr: np.ndarray, boxes: np.ndarray,
                 valid: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """-> (labels (B, D) int, scores (B, D))."""


@dataclass
class FlaxPerception:
    """Real-model backend: Swin Mask R-CNN + ViTPose + ResNet-152.

    With ``mesh`` set (a ``jax.sharding.Mesh``), the three chunk programs
    run SPMD over the whole mesh: weights replicated, the frame-batch
    axis sharded across all devices (the TPU-native equivalent of the
    reference's one-process-per-GPU scale-out, info_replication.md:14).
    """

    detector_model: object
    detector_vars: dict
    pose_model: object
    pose_vars: dict
    id_model: object
    id_vars: dict
    max_det: int = 8
    flip_test: bool = True
    # keep-ratio resize target for the detector input (mmdet's test
    # pipeline uses 800, step1:104-109). The fast serving tier drops to
    # 640 — a measured accuracy/throughput trade-off (ARCHITECTURE.md
    # "Roofline"), never the parity default.
    det_target: int = 800
    mesh: object = None

    def __post_init__(self):
        import jax
        import jax.numpy as jnp
        from macaque_tpu.core.mesh import put_replicated

        if self.mesh is not None:
            self.detector_vars = put_replicated(self.detector_vars,
                                                self.mesh)
            self.pose_vars = put_replicated(self.pose_vars, self.mesh)
            self.id_vars = put_replicated(self.id_vars, self.mesh)
        from macaque_tpu.nn.preprocess import (
            detector_input_batch, normalize_rgb, udp_crop,
            bbox_to_center_scale, id_crops, crop_coords_to_image,
        )
        from macaque_tpu.nn.heatmap import udp_decode, flip_heatmaps
        from macaque_tpu.nn.detector import detect_frames

        det_model = self.detector_model
        pose_model = self.pose_model
        id_model = self.id_model
        D = self.max_det
        flip = self.flip_test

        det_target = self.det_target

        # weight trees enter every program as jit ARGUMENTS, never as
        # closed-over values: a closure constant is baked into the
        # serialized HLO (hundreds of MB for these models), which
        # bloats compiles and overflows remote-compile transports.
        @jax.jit
        def _detect(det_vars, frames):  # (B, H, W, 3) uint8 BGR
            rgb = frames[..., ::-1].astype(jnp.float32)
            padded, scale, _ = detector_input_batch(rgb, target=det_target)
            boxes, scores, valid = detect_frames(det_model, det_vars, padded)
            boxes = boxes / scale
            k = min(D, boxes.shape[1])

            def top_one(bx, sc, va):
                _, top = jax.lax.top_k(jnp.where(va, sc, -jnp.inf), k)
                return bx[top], jnp.where(va[top], sc[top], 0.0)

            return jax.vmap(top_one)(boxes, scores, valid)

        pose_hw = tuple(pose_model.cfg.img_size)      # (H, W)
        pose_aspect = pose_hw[1] / pose_hw[0]

        @jax.jit
        def _pose(pose_vars, frames, boxes, valid):  # boxes (B, D, 4)
            rgb = frames[..., ::-1].astype(jnp.float32)
            B = frames.shape[0]
            flat_boxes = boxes.reshape(B * D, 4)
            centers, scales = bbox_to_center_scale(flat_boxes,
                                                   aspect=pose_aspect)
            frame_idx = jnp.repeat(jnp.arange(B), D)

            def crop_one(fi, c, s):
                return udp_crop(rgb[fi], c[None], s[None],
                                out_hw=pose_hw)[0]

            crops = jax.vmap(crop_one)(frame_idx, centers, scales)
            crops = normalize_rgb(crops)

            if flip:
                hm = pose_model.apply(pose_vars, crops, train=False)
                hm_f = pose_model.apply(pose_vars, crops[:, :, ::-1, :],
                                        train=False)
                hm = 0.5 * (hm + flip_heatmaps(hm_f))
            else:
                hm = pose_model.apply(pose_vars, crops, train=False)
            kp, scores = udp_decode(hm, input_size=(pose_hw[1], pose_hw[0]))
            kp_img = crop_coords_to_image(
                kp.reshape(B * D, -1, 2), centers, scales,
                out_hw=pose_hw,
            )
            out = jnp.concatenate([kp_img, scores[..., None]], axis=-1)
            out = out.reshape(B, D, -1, 3)
            return jnp.where(valid[..., None, None], out, jnp.nan)

        @jax.jit
        def _classify(id_vars, frames, boxes, valid):
            rgb = frames[..., ::-1].astype(jnp.float32)
            B = frames.shape[0]
            flat_boxes = boxes.reshape(B * D, 4)
            frame_idx = jnp.repeat(jnp.arange(B), D)

            def crop_one(fi, b):
                return id_crops(rgb[fi], b[None])[0]

            crops = jax.vmap(crop_one)(frame_idx, flat_boxes)
            crops = normalize_rgb(crops)
            logits = id_model.apply(id_vars, crops, train=False)
            probs = jax.nn.softmax(logits, axis=-1)
            labels = jnp.argmax(probs, axis=-1).reshape(B, D)
            scores = jnp.max(probs, axis=-1).reshape(B, D)
            labels = jnp.where(valid, labels, -1)
            scores = jnp.where(valid, scores, 0.0)
            return labels, scores

        self._detect_fn = _detect
        self._pose_fn = _pose
        self._classify_fn = _classify

    def _put(self, x):
        from macaque_tpu.core.mesh import put_batch_sharded

        return put_batch_sharded(x, self.mesh)

    def detect(self, frames_bgr):
        frames, n = self._put(frames_bgr)
        b, s = self._detect_fn(self.detector_vars, frames)
        return np.asarray(b)[:n], np.asarray(s)[:n]

    def pose(self, frames_bgr, boxes, valid):
        frames, n = self._put(frames_bgr)
        boxes, _ = self._put(boxes)
        valid, _ = self._put(valid)
        out = self._pose_fn(self.pose_vars, frames, boxes, valid)
        return np.asarray(out)[:n]

    def classify(self, frames_bgr, boxes, valid):
        frames, n = self._put(frames_bgr)
        boxes, _ = self._put(boxes)
        valid, _ = self._put(valid)
        l, s = self._classify_fn(self.id_vars, frames, boxes, valid)
        return np.asarray(l)[:n], np.asarray(s)[:n]
