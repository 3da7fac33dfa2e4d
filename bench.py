#!/usr/bin/env python
"""Benchmark: end-to-end per-camera 2D perception + 3D triangulation
throughput on one TPU chip, in camera-frames/sec.

Measures the full flagship compute path on real model sizes (random
weights — throughput is weight-independent):
  Swin-S Mask R-CNN detection on 800x608 frames
  + ViTPose-huge top-down pose (4 crops/frame, flip test)
  + ResNet-152 collar-ID classification
  + multi-view DLT triangulation of the decoded keypoints

Baseline (BASELINE.md): the reference runs ~6.4 camera-frames/s aggregate
(8 cams) on one Quadro RTX 8000 (info_replication.md:44-45) —
``vs_baseline`` is measured camera-frames/s/chip divided by 6.4.

Prints ONE json line on stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from macaque_tpu.nn import (
        ViTPose, VitPoseConfig, SwinMaskRCNN, DetectorConfig,
        ResNetClassifier, ResNetConfig,
    )
    from macaque_tpu.nn.swin import SwinConfig
    from macaque_tpu.nn.heatmap import udp_decode, flip_heatmaps
    from macaque_tpu.nn.preprocess import (
        normalize_rgb, udp_crop, bbox_to_center_scale, id_crops,
        crop_coords_to_image,
    )
    from macaque_tpu.cameras.omnidir import OmnidirCamera, omnidir_undistort
    from macaque_tpu.geometry.triangulate import triangulate_dlt

    n_cam = int(os.environ.get("BENCH_CAMS", 4))
    frames_per_cam = int(os.environ.get("BENCH_FRAMES", 4))
    n_det = int(os.environ.get("BENCH_DETS", 4))
    B = n_cam * frames_per_cam
    H, W = 800, 608

    log(f"devices: {jax.devices()}")
    dtype = jnp.bfloat16

    det_model = SwinMaskRCNN(DetectorConfig(
        swin=SwinConfig(compute_dtype=dtype),
        compute_dtype=dtype,
        rpn_nms_pre=int(os.environ.get("BENCH_NMS_PRE", 1000)),
    ))
    pose_model = ViTPose(VitPoseConfig(compute_dtype=dtype))
    id_model = ResNetClassifier(ResNetConfig(compute_dtype=dtype))

    rng = jax.random.PRNGKey(0)
    log("initializing models (full size, eval_shape + filled params)...")

    def make_vars(model, example):
        shapes = jax.eval_shape(model.init, rng, example)
        # small constant params: fast to materialize, value-independent
        # throughput; avoids compiling init forwards through the tunnel
        return jax.tree.map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes
        )

    det_vars = make_vars(det_model, jnp.zeros((1, H, W, 3)))
    pose_vars = make_vars(pose_model, jnp.zeros((1, 256, 192, 3)))
    id_vars = make_vars(id_model, jnp.zeros((1, 224, 224, 3)))
    n_params = sum(
        x.size for x in jax.tree.leaves(pose_vars["params"])
    )
    log(f"vitpose params: {n_params/1e6:.0f}M")

    # synthetic rig for the triangulation tail
    npr = np.random.default_rng(0)
    cam = OmnidirCamera(
        K=jnp.asarray(np.tile(np.array([[800.0, 0, 304], [0, 800, 400],
                                        [0, 0, 1]]), (n_cam, 1, 1))),
        xi=jnp.asarray(np.full(n_cam, 1.0)),
        D=jnp.asarray(np.zeros((n_cam, 4))),
        rvec=jnp.asarray(npr.normal(0, 0.1, (n_cam, 3))),
        tvec=jnp.asarray(np.concatenate(
            [npr.normal(0, 10, (n_cam, 2)), np.full((n_cam, 1), 2500.0)], 1)),
    )

    @jax.jit
    def chunk_step(det_vars, pose_vars, id_vars, frames, boxes):
        """frames: (B, H, W, 3) uint8; boxes: (B, n_det, 4).
        Full perception compute for one chunk + triangulation."""
        imgs = normalize_rgb(frames.astype(jnp.float32))

        def det_one(img):
            return det_model.apply(det_vars, img[None])

        # sequential over frames: the RPN NMS holds an O(N^2) IoU matrix
        # (~5k proposals); vmapping 16 frames would need ~20 GB HBM
        d_boxes, d_scores, d_valid = jax.lax.map(det_one, imgs)

        flat_boxes = boxes.reshape(-1, 4)
        centers, scales = bbox_to_center_scale(flat_boxes)
        fidx = jnp.repeat(jnp.arange(B), n_det)

        def crop_one(fi, c, s):
            return udp_crop(imgs[fi], c[None], s[None])[0]

        crops = jax.vmap(crop_one)(fidx, centers, scales)
        hm = pose_model.apply(pose_vars, crops)
        hm_f = pose_model.apply(pose_vars, crops[:, :, ::-1, :])
        hm = 0.5 * (hm.astype(jnp.float32)
                    + flip_heatmaps(hm_f.astype(jnp.float32)))
        kp, kscore = udp_decode(hm)
        kp_img = crop_coords_to_image(kp, centers, scales)

        def idcrop_one(fi, b):
            return id_crops(imgs[fi], b[None])[0]

        icrops = jax.vmap(idcrop_one)(fidx, flat_boxes)
        logits = id_model.apply(id_vars, icrops)

        # triangulate: reshape to (n_cam, frames*n_det*J) observations
        kp_cam = kp_img.reshape(n_cam, frames_per_cam * n_det, -1, 2)
        und = omnidir_undistort(cam, kp_cam.reshape(n_cam, -1, 2))
        undT = jnp.swapaxes(und, 0, 1)
        mask = jnp.ones(undT.shape[:2], bool)
        p3d = triangulate_dlt(jnp.nan_to_num(undT), cam.pmat, mask)
        return d_boxes, d_scores, kp_img, kscore, logits, p3d

    frames = jnp.asarray(
        npr.integers(0, 255, (B, H, W, 3), dtype=np.uint8)
    )
    boxes = jnp.asarray(
        np.tile(np.array([100.0, 100, 400, 500]), (B, n_det, 1))
        + npr.uniform(0, 50, (B, n_det, 4))
    )

    log("compiling chunk step...")
    t0 = time.time()
    out = chunk_step(det_vars, pose_vars, id_vars, frames, boxes)
    jax.block_until_ready(out)
    log(f"compile+first run: {time.time()-t0:.1f}s")

    iters = int(os.environ.get("BENCH_ITERS", 5))
    t0 = time.time()
    for _ in range(iters):
        out = chunk_step(det_vars, pose_vars, id_vars, frames, boxes)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    cf_per_s = B / dt
    log(f"chunk: {B} camera-frames in {dt*1000:.1f} ms")

    baseline = 6.4  # reference camera-frames/s aggregate on RTX 8000
    print(json.dumps({
        "metric": "e2e_camera_frames_per_sec_per_chip",
        "value": round(cf_per_s, 2),
        "unit": "camera-frames/s",
        "vs_baseline": round(cf_per_s / baseline, 2),
    }))


if __name__ == "__main__":
    main()
