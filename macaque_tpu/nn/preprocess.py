"""Fused on-device preprocessing: normalize, keep-ratio resize+pad,
UDP affine crops, classifier crops.

The reference does this work on CPU per frame (cv2 resize in mmdet's test
pipeline step1:104-109, cv2.resize of ID patches step1:140-163, mmpose
TopdownAffine warps); here each transform is a batched bilinear gather that
XLA fuses with the normalization, so raw uint8 frames go device-side once
and stay there.

All coordinate conventions match the reference stack:
  * detector resize — cv2 half-pixel convention, keep-ratio to 800x800,
    pad to /32 (SWIN-Mask_R-CNN_bbox_only.py data_preprocessor + step1)
  * pose crops — mmpose UDP warp (pixel centers at (size-1) spacing),
    bbox -> center/scale with 1.25 padding and aspect snap
  * ID crops — crop, resize 256x256, center-crop 224 (mmpretrain
    ResizeEdge(256)+CenterCrop(224) on the already-square patch)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# ImageNet / OpenMMLab normalization (RGB)
MEAN_RGB = (123.675, 116.28, 103.53)
STD_RGB = (58.395, 57.12, 57.375)


def normalize_rgb(img: jnp.ndarray) -> jnp.ndarray:
    """uint8/float RGB (..., 3) -> normalized float32."""
    mean = jnp.asarray(MEAN_RGB, jnp.float32)
    std = jnp.asarray(STD_RGB, jnp.float32)
    return (img.astype(jnp.float32) - mean) / std


def _bilinear_sample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """img (H, W, C); ys/xs arbitrary equal shapes -> (..., C).
    cv2-style border replication via clipping."""
    H, W, _ = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    wye = wy[..., None]
    wxe = wx[..., None]
    return (
        img[y0i, x0i] * (1 - wye) * (1 - wxe)
        + img[y0i, x1i] * (1 - wye) * wxe
        + img[y1i, x0i] * wye * (1 - wxe)
        + img[y1i, x1i] * wye * wxe
    )


def _interp_matrix(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """Linear-interpolation matrix W (len(coords), size):
    ``W @ signal`` samples the signal at ``coords`` with border
    replication. Bilinear weight = max(0, 1 - |coord - index|), which on
    the MXU turns axis-separable resampling (resize, axis-aligned crops)
    into two matmuls instead of element gathers — gathers are the slow
    path on TPU, matmuls are the fast one."""
    c = jnp.clip(coords, 0.0, size - 1.0)
    idx = jnp.arange(size, dtype=c.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(c[..., :, None] - idx))


def _matmul_resample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """img (H, W, C) sampled at the outer grid ys x xs -> (oh, ow, C)."""
    H, W, _ = img.shape
    Wy = _interp_matrix(ys, H)  # (oh, H)
    Wx = _interp_matrix(xs, W)  # (ow, W)
    return jnp.einsum("ih,hwc,jw->ijc", Wy, img, Wx,
                      preferred_element_type=jnp.float32)


def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv2.resize(INTER_LINEAR) half-pixel convention."""
    H, W, _ = img.shape
    oh, ow = out_hw
    sy = H / oh
    sx = W / ow
    ys = (jnp.arange(oh) + 0.5) * sy - 0.5
    xs = (jnp.arange(ow) + 0.5) * sx - 0.5
    return _matmul_resample(img, ys, xs)


def detector_input(
    img: jnp.ndarray, target: int = 800, divisor: int = 32
) -> tuple[jnp.ndarray, float, Tuple[int, int]]:
    """Keep-ratio resize so max(h, w) fits ``target``, normalize, pad to
    ``divisor``. Returns (padded (1, Hp, Wp, 3), scale, (h_res, w_res)).
    Static output shape is a pure function of the input shape."""
    H, W, _ = img.shape
    scale = min(target / H, target / W)
    h_res, w_res = int(round(H * scale)), int(round(W * scale))
    resized = resize_bilinear(img.astype(jnp.float32), (h_res, w_res))
    norm = normalize_rgb(resized)
    Hp = -(-h_res // divisor) * divisor
    Wp = -(-w_res // divisor) * divisor
    padded = jnp.pad(norm, ((0, Hp - h_res), (0, Wp - w_res), (0, 0)))
    return padded[None], scale, (h_res, w_res)


def detector_input_batch(
    imgs: jnp.ndarray, target: int = 800, divisor: int = 32
) -> tuple[jnp.ndarray, float, Tuple[int, int]]:
    """Batched ``detector_input``: (B, H, W, 3) -> (padded (B, Hp, Wp, 3),
    scale, (h_res, w_res)). Scale/pad are static functions of the input
    shape, so the whole chunk resizes in one batched einsum."""
    B, H, W, _ = imgs.shape
    scale = min(target / H, target / W)
    h_res, w_res = int(round(H * scale)), int(round(W * scale))
    sy, sx = H / h_res, W / w_res
    ys = (jnp.arange(h_res) + 0.5) * sy - 0.5
    xs = (jnp.arange(w_res) + 0.5) * sx - 0.5
    Wy = _interp_matrix(ys, H)
    Wx = _interp_matrix(xs, W)
    resized = jnp.einsum("ih,bhwc,jw->bijc", Wy,
                         imgs.astype(jnp.float32), Wx,
                         preferred_element_type=jnp.float32)
    norm = normalize_rgb(resized)
    Hp = -(-h_res // divisor) * divisor
    Wp = -(-w_res // divisor) * divisor
    padded = jnp.pad(norm, ((0, 0), (0, Hp - h_res), (0, Wp - w_res), (0, 0)))
    return padded, scale, (h_res, w_res)


def bbox_to_center_scale(
    bboxes: jnp.ndarray, aspect: float = 192.0 / 256.0, padding: float = 1.25
):
    """xyxy (N, 4) -> (center (N, 2), scale (N, 2)) with aspect snapping
    (mmpose bbox_xyxy2cs + fix_aspect_ratio)."""
    x1, y1, x2, y2 = (bboxes[:, i] for i in range(4))
    center = jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2], axis=1)
    w = (x2 - x1) * padding
    h = (y2 - y1) * padding
    w_fix = jnp.where(w > aspect * h, w, h * aspect)
    h_fix = jnp.where(w > aspect * h, w / aspect, h)
    return center, jnp.stack([w_fix, h_fix], axis=1)


def udp_crop(
    img: jnp.ndarray,
    centers: jnp.ndarray,
    scales: jnp.ndarray,
    out_hw: Tuple[int, int] = (256, 192),
) -> jnp.ndarray:
    """Batched UDP affine crop: output pixel (i, j) samples the input at
    ``center - scale/2 + (j, i) * scale / (out-1)`` (mmpose
    get_udp_warp_matrix with rot=0, inverted).

    img (H, W, 3); centers (N, 2); scales (N, 2) -> (N, oh, ow, 3)."""
    oh, ow = out_hw

    def crop_one(center, scale):
        sx = scale[0] / (ow - 1)
        sy = scale[1] / (oh - 1)
        xs = center[0] - scale[0] / 2 + jnp.arange(ow) * sx
        ys = center[1] - scale[1] / 2 + jnp.arange(oh) * sy
        return _matmul_resample(img, ys, xs)

    return jax.vmap(crop_one)(centers, scales)


def crop_coords_to_image(
    kps: jnp.ndarray, centers: jnp.ndarray, scales: jnp.ndarray,
    out_hw: Tuple[int, int] = (256, 192),
) -> jnp.ndarray:
    """Map keypoints decoded in crop space (N, K, 2) back to image pixels
    (inverse of udp_crop's sampling map)."""
    oh, ow = out_hw
    s = scales[:, None, :] / jnp.asarray([ow - 1, oh - 1], jnp.float32)
    origin = centers[:, None, :] - scales[:, None, :] / 2
    return origin + kps * s


def id_crops(
    img: jnp.ndarray, bboxes: jnp.ndarray, out: int = 224, resize_to: int = 256
) -> jnp.ndarray:
    """Classifier patches: crop xyxy box, resize to 256x256, center-crop 224
    (reference step1:140-163 + mmpretrain test pipeline)."""
    def one(box):
        x1, y1, x2, y2 = box
        w = jnp.maximum(x2 - x1, 1.0)
        h = jnp.maximum(y2 - y1, 1.0)
        # resize crop -> 256, then center-crop 224: effective source grid
        off = (resize_to - out) / 2
        xs = x1 + (off + jnp.arange(out) + 0.5) * (w / resize_to) - 0.5
        ys = y1 + (off + jnp.arange(out) + 0.5) * (h / resize_to) - 0.5
        return _matmul_resample(img, ys, xs)

    return jax.vmap(one)(bboxes.astype(jnp.float32))
