"""UDP heatmap decoding and flip-test fusion, fully batched in JAX.

Implements the UDPHeatmap codec used by the reference's pose model
(model/pose/td-hm_ViTPose-huge...py:4-14,109: UDP codec, sigma 2,
flip_test with heatmap mode, shift_heatmap=False): DARK-style sub-pixel
refinement — Gaussian-blur + log + one Newton step on the heatmap —
followed by the UDP coordinate convention ``pixel = hm * (in-1)/(hm-1)``.

The reference decodes per-sample on CPU inside mmpose; here the decode is a
single fused program over (batch, joints) on the TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# COCO/macaque 17-kp left-right swap pairs (model/pose/macaque.py:15-130)
MACAQUE_FLIP_PAIRS = [(1, 2), (3, 4), (5, 6), (7, 8), (9, 10),
                      (11, 12), (13, 14), (15, 16)]


def _gaussian_kernel1d(ksize: int) -> np.ndarray:
    """cv2.getGaussianKernel(ksize, sigma=0) semantics: sigma derived from
    ksize as 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1.0) + 0.8
    x = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / k.sum()


def gaussian_blur_heatmaps(heatmaps: jnp.ndarray, kernel: int = 11) -> jnp.ndarray:
    """Zero-padded separable Gaussian blur with per-map max re-scaling
    (mmpose ``gaussian_blur`` semantics). heatmaps: (..., H, W)."""
    k = jnp.asarray(_gaussian_kernel1d(kernel), heatmaps.dtype)
    border = (kernel - 1) // 2
    orig_max = jnp.max(heatmaps, axis=(-2, -1), keepdims=True)

    pad = [(0, 0)] * (heatmaps.ndim - 2) + [(border, border), (border, border)]
    hp = jnp.pad(heatmaps, pad)
    # separable correlation along W then H (NHWC depth-1 convs)
    shape = hp.shape
    x = hp.reshape(-1, shape[-2], shape[-1], 1)
    kw = k.reshape(1, kernel, 1, 1)
    kh = k.reshape(kernel, 1, 1, 1)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x.reshape(shape)[..., border:-border, border:-border]
    new_max = jnp.max(x, axis=(-2, -1), keepdims=True)
    return x * orig_max / jnp.maximum(new_max, 1e-12)


def udp_decode(
    heatmaps: jnp.ndarray,
    input_size: tuple[int, int] = (192, 256),
    blur_kernel: int = 11,
):
    """Decode heatmaps (B, H, W, K) -> (keypoints (B, K, 2) in input-pixel
    coords, scores (B, K)).

    Matches mmpose UDPHeatmap.decode: argmax, DARK refinement on the
    blurred log heatmap (one Newton step using central differences on an
    edge-padded map), then scale by (input-1)/(heatmap-1).
    """
    hm = jnp.moveaxis(heatmaps, -1, -3)  # (B, K, H, W)
    B, K, H, W = hm.shape

    flat = hm.reshape(B, K, -1)
    idx = jnp.argmax(flat, axis=-1)
    vals = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    x = (idx % W).astype(jnp.float32)
    y = (idx // W).astype(jnp.float32)

    blurred = gaussian_blur_heatmaps(hm, blur_kernel)
    logh = jnp.log(jnp.clip(blurred, 1e-3, 50.0))
    padded = jnp.pad(logh, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")

    xi = x.astype(jnp.int32) + 1
    yi = y.astype(jnp.int32) + 1

    def at(dy, dx):
        return padded[
            jnp.arange(B)[:, None], jnp.arange(K)[None, :], yi + dy, xi + dx
        ]

    # mmpose DARK-UDP stencil (refine_keypoints_dark_udp)
    c = at(0, 0)
    dx = 0.5 * (at(0, 1) - at(0, -1))
    dy = 0.5 * (at(1, 0) - at(-1, 0))
    dxx = at(0, 1) - 2 * c + at(0, -1)
    dyy = at(1, 0) - 2 * c + at(-1, 0)
    dxy = 0.5 * (
        at(1, 1) - at(0, 1) - at(1, 0) + 2 * c - at(0, -1) - at(-1, 0)
        + at(-1, -1)
    )

    eps = jnp.finfo(jnp.float32).eps
    a11, a12, a22 = dxx + eps, dxy, dyy + eps
    det = a11 * a22 - a12 * a12
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 0, det, 1.0)
    off_x = -(a22 * dx - a12 * dy) * inv_det
    off_y = -(a11 * dy - a12 * dx) * inv_det

    x = x + off_x
    y = y + off_y

    in_w, in_h = input_size
    kx = (in_w - 1) / (W - 1)
    ky = (in_h - 1) / (H - 1)
    kp = jnp.stack([x * kx, y * ky], axis=-1)
    return kp, vals


def flip_heatmaps(heatmaps: jnp.ndarray, flip_pairs=MACAQUE_FLIP_PAIRS):
    """Undo a horizontal image flip on heatmaps (B, H, W, K): mirror the W
    axis and swap left/right channels (mmpose flip_mode='heatmap',
    shift_heatmap=False)."""
    hm = heatmaps[..., ::-1, :]
    perm = np.arange(heatmaps.shape[-1])
    for a, b in flip_pairs:
        perm[a], perm[b] = perm[b], perm[a]
    return hm[..., perm]


def pose_forward_flip(apply_fn, params, crops, flip_pairs=MACAQUE_FLIP_PAIRS):
    """Flip-test wrapper: average the direct heatmaps with the
    flipped-input heatmaps mapped back (reference step1:101)."""
    hm = apply_fn(params, crops)
    hm_f = apply_fn(params, crops[:, :, ::-1, :])
    return 0.5 * (hm + flip_heatmaps(hm_f, flip_pairs))
