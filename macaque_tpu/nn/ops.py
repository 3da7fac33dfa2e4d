"""Detection ops: anchors, box coding, IoU, static-shape NMS, RoIAlign.

Pure-JAX, statically shaped equivalents of the mmdet/mmcv CUDA ops the
reference's detector relies on (anchor generation, DeltaXYWH coding, NMS,
aligned RoIAlign; model/detection/SWIN-Mask_R-CNN_bbox_only.py:137-185).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------- anchors

def make_anchors(
    feat_sizes, strides, scales=(8.0,), ratios=(0.5, 1.0, 2.0)
) -> list[np.ndarray]:
    """mmdet AnchorGenerator semantics (center_offset 0): per level,
    base anchors of area (scale*stride)^2 at each ratio, tiled over the
    feature grid. Returns one (H*W*A, 4) xyxy array per level."""
    out = []
    for (H, W), stride in zip(feat_sizes, strides):
        base = []
        for r in ratios:
            for s in scales:
                size = s * stride
                w = size * np.sqrt(1.0 / r)
                h = size * np.sqrt(r)
                base.append([-w / 2, -h / 2, w / 2, h / 2])
        base = np.asarray(base)  # (A, 4)
        xs = (np.arange(W) * stride)[None, :, None]
        ys = (np.arange(H) * stride)[:, None, None]
        ctr = np.stack(
            [np.broadcast_to(xs, (H, W, 1)), np.broadcast_to(ys, (H, W, 1))],
            axis=-1,
        ).reshape(H, W, 1, 2)
        anchors = np.concatenate([ctr, ctr], axis=-1) + base[None, None]
        out.append(anchors.reshape(-1, 4).astype(np.float32))
    return out


# ------------------------------------------------------------- box coding

def delta2bbox(anchors, deltas, stds=(1.0, 1.0, 1.0, 1.0),
               max_shape=None, wh_ratio_clip=16 / 1000):
    """mmdet DeltaXYWHBBoxCoder.decode (means 0)."""
    stds = jnp.asarray(stds, deltas.dtype)
    d = deltas * stds
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = (anchors[..., 0] + anchors[..., 2]) / 2
    ay = (anchors[..., 1] + anchors[..., 3]) / 2
    max_ratio = jnp.abs(jnp.log(wh_ratio_clip))
    dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
    dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)
    cx = ax + d[..., 0] * aw
    cy = ay + d[..., 1] * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    boxes = jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )
    if max_shape is not None:
        h_img, w_img = max_shape
        boxes = jnp.stack(
            [
                jnp.clip(boxes[..., 0], 0, w_img),
                jnp.clip(boxes[..., 1], 0, h_img),
                jnp.clip(boxes[..., 2], 0, w_img),
                jnp.clip(boxes[..., 3], 0, h_img),
            ],
            axis=-1,
        )
    return boxes


# -------------------------------------------------------------------- IoU

def bbox_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of (..., N, 4) x (..., M, 4) xyxy boxes -> (..., N, M)."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0) * jnp.maximum(
        a[..., 3] - a[..., 1], 0
    )
    area_b = jnp.maximum(b[..., 2] - b[..., 0], 0) * jnp.maximum(
        b[..., 3] - b[..., 1], 0
    )
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


# -------------------------------------------------------------------- NMS

def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thr: float,
              max_out: int):
    """Exact greedy NMS with static shapes, parallel-iteration form.

    The greedy recurrence ``alive[i] = !any(j < i: alive[j] & iou > thr)``
    is solved by fixed-point iteration instead of an O(N)-step sequential
    loop: starting from all-alive, each sweep recomputes every box's
    status from the previous sweep. The even/odd iterates bracket the
    greedy solution and meet after ~chain-depth sweeps (rarely more than
    a dozen); each sweep is one masked (N, N) reduction on the VPU. An
    O(N) sequential loop costs ~N kernel latencies on TPU (~40 ms at
    N≈4k); this runs in a few sweeps of ~30 us.

    boxes (N, 4), scores (N,) with invalid entries at score -inf.
    Returns (keep_idx (max_out,), keep_valid (max_out,) bool) in
    descending score order.
    """
    N = boxes.shape[0]
    # full descending order is required by greedy NMS; unstable sort is
    # cheaper on TPU and score ties are measure-zero for real detections
    order = jnp.argsort(-scores, stable=False)
    b = boxes[order]
    s = scores[order]
    iou = bbox_iou(b, b)
    tri = jnp.tril(jnp.ones((N, N), bool), k=-1)
    # suppress[i, j] true when higher-ranked j (j < i) overlaps i.
    # Bitpacked along j (32 candidates per uint32 lane): every sweep
    # re-reads the whole suppression matrix, and at N~4.5k the bool form
    # is 20 MB/image — packing cuts sweep traffic 8x (profiled: NMS
    # sweeps were ~17 ms of a 16-frame detector chunk on v5e).
    suppress = (iou > iou_thr) & tri
    valid = s > -jnp.inf

    n_words = -(-N // 32)
    pad = n_words * 32 - N
    bit = jnp.left_shift(jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32))
    sup_packed = jnp.sum(
        jnp.pad(suppress, ((0, 0), (0, pad)))
        .reshape(N, n_words, 32).astype(jnp.uint32) * bit,
        axis=-1, dtype=jnp.uint32,
    )                                               # (N, n_words)

    def pack(alive):
        return jnp.sum(
            jnp.pad(alive, (0, pad)).reshape(n_words, 32)
            .astype(jnp.uint32) * bit,
            axis=-1, dtype=jnp.uint32,
        )

    def body(state):
        alive, _, it = state
        hit = jnp.any((sup_packed & pack(alive)[None, :]) != 0, axis=1)
        new = valid & ~hit
        return new, alive, it + 1

    def cond(state):
        alive, prev, it = state
        return jnp.any(alive != prev) & (it < N)

    alive0 = valid
    alive, _, _ = jax.lax.while_loop(
        cond, body, (alive0, jnp.zeros_like(alive0), jnp.int32(0))
    )
    alive_scores = jnp.where(alive, s, -jnp.inf)
    # survivors in rank order: alive_scores is already descending where
    # alive, so top_k (O(N log k)) replaces a second full argsort
    top_scores, top = jax.lax.top_k(alive_scores, max_out)
    keep_valid = top_scores > -jnp.inf
    keep_idx = order[top]
    return keep_idx, keep_valid


def batched_nms_fixed(boxes, scores, ids, iou_thr, max_out):
    """Class/level-aware NMS via the coordinate-offset trick
    (mmcv batched_nms semantics)."""
    offset = ids.astype(boxes.dtype)[:, None] * (
        jnp.max(boxes) + 1.0
    )
    return nms_fixed(boxes + offset, scores, iou_thr, max_out)


# --------------------------------------------------------------- RoIAlign

def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, out_size: int,
              spatial_scale: float, sampling_ratio: int = 2) -> jnp.ndarray:
    """Aligned RoIAlign (mmcv aligned=True semantics: half-pixel offset).

    feat: (H, W, C); rois: (R, 4) xyxy in image coords.
    Returns (R, out_size, out_size, C).

    The reference's RoI layer uses sampling_ratio=0 (adaptive sample count
    per bin); a fixed sampling_ratio=2 is used here so shapes stay static —
    the standard TPU/ONNX approximation, accurate to interpolation
    tolerance for typical box sizes.
    """
    H, W, C = feat.shape
    x1 = rois[:, 0] * spatial_scale - 0.5
    y1 = rois[:, 1] * spatial_scale - 0.5
    x2 = rois[:, 2] * spatial_scale - 0.5
    y2 = rois[:, 3] * spatial_scale - 0.5
    bin_w = (x2 - x1) / out_size
    bin_h = (y2 - y1) / out_size

    s = sampling_ratio
    # sample positions within each bin: (out, s) offsets
    grid = (jnp.arange(s) + 0.5) / s

    gx = (
        x1[:, None, None]
        + (jnp.arange(out_size)[None, :, None] + grid[None, None, :])
        * bin_w[:, None, None]
    )  # (R, out, s)
    gy = (
        y1[:, None, None]
        + (jnp.arange(out_size)[None, :, None] + grid[None, None, :])
        * bin_h[:, None, None]
    )

    gx = gx.reshape(rois.shape[0], -1)  # (R, out*s)
    gy = gy.reshape(rois.shape[0], -1)

    def bilinear(yq, xq):
        y0 = jnp.floor(yq)
        x0 = jnp.floor(xq)
        wy1 = yq - y0
        wx1 = xq - x0
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        y1i = jnp.clip(y0i + 1, 0, H - 1)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        x1i = jnp.clip(x0i + 1, 0, W - 1)
        # zero out samples fully outside the feature map (mmcv behaviour)
        inside = (yq > -1.0) & (yq < H) & (xq > -1.0) & (xq < W)
        v00 = feat[y0i, x0i]
        v01 = feat[y0i, x1i]
        v10 = feat[y1i, x0i]
        v11 = feat[y1i, x1i]
        wy1e = wy1[..., None]
        wx1e = wx1[..., None]
        val = (
            v00 * (1 - wy1e) * (1 - wx1e)
            + v01 * (1 - wy1e) * wx1e
            + v10 * wy1e * (1 - wx1e)
            + v11 * wy1e * wx1e
        )
        return jnp.where(inside[..., None], val, 0.0)

    # all sample points: (R, out*s, out*s, C) via outer grid of gy x gx
    yq = gy[:, :, None]
    xq = gx[:, None, :]
    yq = jnp.broadcast_to(yq, (rois.shape[0], gy.shape[1], gx.shape[1]))
    xq = jnp.broadcast_to(xq, yq.shape)
    vals = bilinear(yq, xq)  # (R, out*s, out*s, C)
    R = rois.shape[0]
    vals = vals.reshape(R, out_size, s, out_size, s, C)
    return vals.mean(axis=(2, 4))


def roi_align_windowed(feats, rois: jnp.ndarray, levels: jnp.ndarray,
                       out_size: int, strides, sampling_ratio: int = 2,
                       window: int = 48) -> jnp.ndarray:
    """Aligned pyramid RoIAlign via per-RoI window slices + separable
    interpolation matmuls (the production detector path).

    Two TPU-specific observations make this exact and fast:

    1. mmdet's scale-based level assignment (``finest_scale=56``,
       detector.py) bounds every RoI's sqrt-area extent *in its own
       level's coordinates* to 28 px — the long axis of an aspect-a box
       to 28*sqrt(a) px — so a fixed ``window``x``window`` slice around
       the RoI covers all its sample points (window=48 covers aspect 2,
       the RPN anchor-ratio range). Each RoI then needs one contiguous
       block read instead of ``(out_size*s)^2`` scattered row gathers
       (gathers are indices-bound on TPU: ~54 ms per 16x256-RoI chunk
       measured on v5e, vs a few ms of block DMA for this path).
    2. The sample grid is an outer product (gy x gx) and bilinear
       weights separate per axis, so averaging the s x s samples per
       bin is *exactly* a pair of small interpolation matrices:
       ``out[p,q] = mean_ab w_y(p,a)·w_x(q,b)·F = (Ky @ F @ Kx^T)[p,q]``
       — the same matmul-form resampling trick as preprocess.udp_crop,
       here with mmcv's outside-map zeroing and border clamping baked
       into the matrix rows.

    feats: list of (B, H_l, W_l, C); rois (B, R, 4) image-coord xyxy;
    levels (B, R) int. Returns (B, R, out, out, C).

    RoIs whose extent exceeds ``window - 2`` px at their level (aspect
    ratio beyond ~2.9 at the level's top scale — outside the RPN anchor
    ratios) have their sample grid clamped to the window, a
    border-replication approximation on the overflowing axis.
    """
    canvas, ys, xs, Ky, Kx, window = _roi_window_geometry(
        feats, rois, levels, out_size, strides, sampling_ratio, window)
    B, L, H0, W0, C = canvas.shape
    R = rois.shape[1]

    # one contiguous window block per RoI via vmapped dynamic_slice.
    # XLA unrolls this into one slice kernel per RoI — measured v5e at
    # 16x256 RoIs that is the FASTEST lowering (~28 ms/chunk, ~170 GB/s
    # per slice): a single multi-dim-slice gather lowers element-wise
    # (~66 ms), a flat 1-D gather of per-row runs serializes (~620 ms),
    # and the 196-sample flat-index row gather (the pyramid path) is
    # indices-bound (~54 ms). (pallas_roialign.roi_align_windowed_fused
    # goes further: it never materializes the windows in HBM.)
    bidx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, R))

    def slice_one(b, lvl, y0, x0):
        return jax.lax.dynamic_slice(
            canvas,
            (b, lvl.astype(jnp.int32),
             y0.astype(jnp.int32), x0.astype(jnp.int32), jnp.int32(0)),
            (1, 1, window, window, C),
        )[0, 0]

    win = jax.vmap(jax.vmap(slice_one))(bidx, levels, ys, xs)
    # separable interpolation on the MXU, in the table dtype (bf16 in
    # production: weight quantization ~0.4% of a bin, below box noise)
    Ky = Ky.astype(canvas.dtype)
    Kx = Kx.astype(canvas.dtype)
    mid = jnp.einsum("brpi,brijc->brpjc", Ky, win)
    return jnp.einsum("brqj,brpjc->brpqc", Kx, mid)


def _roi_level_canvas(feats, pad_x: int = 0):
    """Level stack on a common (H0, W0 + pad_x) canvas; rows beyond a
    level's H_l are zero (never read: stencil indices are clamped to the
    valid extent). Hoist this out of chunked/conditional RoIAlign calls —
    it only depends on the FPN maps, and rebuilding it inside a
    lax.map/lax.switch body costs ~2 ms of HBM traffic per call at
    production shapes."""
    B, H0, W0, C = feats[0].shape
    return jnp.stack(
        [jnp.pad(f, ((0, 0), (0, H0 - f.shape[1]),
                     (0, W0 + pad_x - f.shape[2]), (0, 0))) for f in feats],
        axis=1,
    )                                       # (B, L, H0, W0+pad_x, C)


def _roi_window_geometry(feats, rois, levels, out_size, strides,
                         sampling_ratio, window, pad_x: int = 0,
                         align_x: int = 0, canvas=None):
    """Shared front half of the windowed RoIAlign paths (XLA slice+einsum
    above and the fused Pallas kernel in pallas_roialign.py): builds the
    common level canvas, the per-RoI window start coordinates, and the
    separable interpolation matrices.

    ``pad_x`` adds extra zero columns on the canvas right edge (free —
    folded into the level-stack pad) so a caller that rounds window
    starts DOWN to an alignment boundary and widens the window by the
    same amount (the Pallas DMA path: Mosaic only accepts sublane-dim
    dynamic offsets with provable 8-alignment) can never read past W0.

    ``align_x`` > 0 bakes that alignment into the x geometry directly:
    the returned xs are rounded DOWN to the alignment boundary and Kx is
    built (window + align_x) wide with the sub-offset folded into its
    column positions — identical numerics to shifting an unaligned Kx,
    without the per-RoI shift matmul. ``canvas`` supplies a prebuilt
    _roi_level_canvas(feats, pad_x) to skip rebuilding it per call.

    Returns (canvas (B, L, H0, W0+pad_x, C), ys (B, R), xs (B, R),
    Ky (B, R, out, window), Kx (B, R, out, window + align_x), window)."""
    B, H0, W0, C = feats[0].shape
    window = min(window, H0, W0)   # tiny inputs: window can't exceed canvas

    if canvas is None:
        canvas = _roi_level_canvas(feats, pad_x)

    gy, gx, Hs, Ws = _roi_sample_grids(
        feats, rois, levels, out_size, strides, sampling_ratio)

    def axis_matrix(g, extent, max_start, align=0):
        """g (B, R, n) sample coords; extent (B, R) valid length H_l/W_l.
        Returns (start (B, R) int, K (B, R, n, window + align))."""
        center = 0.5 * (g[..., 0] + g[..., -1])
        start = jnp.clip(
            jnp.floor(center).astype(jnp.int32) - window // 2,
            0, jnp.maximum(max_start, 0),
        )
        startf = start.astype(g.dtype)[..., None]
        # mmcv semantics: samples fully outside (-1, extent) contribute 0;
        # inside samples clamp their stencil to [0, extent-1]
        inside = (g > -1.0) & (g < extent[..., None])
        gc = jnp.clip(g, 0.0, extent[..., None] - 1.0)
        # clamp into the window (only binds for >window-2 px extents)
        rel = jnp.clip(gc - startf, 0.0, window - 1.0)
        if align:
            # aligned start: round down, widen K by the alignment, and
            # shift the stencil positions by the remainder — exactly the
            # unaligned K with its columns moved right by (start - qstart)
            qstart = (start // align) * align
            rel = rel + (start - qstart).astype(g.dtype)[..., None]
            start = qstart
        idx = jnp.arange(window + align, dtype=g.dtype)
        K = jnp.maximum(0.0, 1.0 - jnp.abs(rel[..., None] - idx))
        return start, K * inside[..., None]

    ys, Ky = axis_matrix(gy, Hs.astype(gy.dtype), Hs - window)
    xs, Kx = axis_matrix(gx, Ws.astype(gx.dtype), Ws - window,
                         align=align_x)

    # fold the s-sample average into the matrices: (B, R, out, window)
    s = sampling_ratio
    B_, R_ = rois.shape[:2]
    Ky = Ky.reshape(B_, R_, out_size, s, window).mean(3)
    Kx = Kx.reshape(B_, R_, out_size, s, window + align_x).mean(3)
    return canvas, ys, xs, Ky, Kx, window


def _roi_sample_grids(feats, rois, levels, out_size, strides,
                      sampling_ratio):
    """Per-RoI bilinear sample coordinates in assigned-level feature-map
    units (mmcv aligned RoIAlign grid). Shared between the window
    geometry above and the adaptive window-bucket selector
    (pallas_roialign.roi_window_buckets).

    Returns (gy (B, R, out*s), gx (B, R, out*s), Hs (B, R), Ws (B, R))
    where Hs/Ws are the assigned level's valid extents."""
    L = len(feats)
    s = sampling_ratio
    n = out_size * s

    Hs = jnp.asarray([f.shape[1] for f in feats])[levels]   # (B, R)
    Ws = jnp.asarray([f.shape[2] for f in feats])[levels]
    scale = jnp.asarray(
        1.0 / np.asarray(strides, np.float32)[:L], rois.dtype)[levels]

    x1 = rois[..., 0] * scale - 0.5
    y1 = rois[..., 1] * scale - 0.5
    x2 = rois[..., 2] * scale - 0.5
    y2 = rois[..., 3] * scale - 0.5

    grid = (jnp.arange(n) + 0.5) / s                # fractional bin coords
    gy = y1[..., None] + grid * ((y2 - y1) / out_size)[..., None]
    gx = x1[..., None] + grid * ((x2 - x1) / out_size)[..., None]
    return gy, gx, Hs, Ws


def roi_align_pyramid(feats, rois: jnp.ndarray, levels: jnp.ndarray,
                      out_size: int, strides, sampling_ratio: int = 2
                      ) -> jnp.ndarray:
    """RoIAlign over an FPN pyramid with one gather pass.

    Instead of aligning every RoI against every level and masking (4x
    wasted gather traffic), the level maps are flattened into one
    (sum(H*W), C) table and each RoI's bilinear samples index into its
    assigned level via a per-level offset.

    feats: list of (H_l, W_l, C); rois (R, 4) image-coord xyxy;
    levels (R,) int in [0, len(feats)). Returns (R, out, out, C).

    Also accepts batched inputs — feats (B, H_l, W_l, C), rois (B, R, 4),
    levels (B, R) — by flattening the batch into the row table so the
    sample reads stay ONE flat-index gather. (A vmapped gather adds a
    batching dimension that XLA lowers ~3x slower on TPU: 292 ms vs 80 ms
    per 16x1000-RoI chunk, measured v5e.)
    """
    C = feats[0].shape[-1]
    if feats[0].ndim == 4:                      # batched path
        B = feats[0].shape[0]
        Hs = np.array([f.shape[1] for f in feats])
        Ws = np.array([f.shape[2] for f in feats])
        sizes = Hs * Ws
        sum_hw = int(sizes.sum())
        offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])

        def pack(f):
            # pack the 2x2 bilinear footprint into channels with
            # edge-clamped shifts (identical to index clipping), so every
            # sample point needs ONE gathered row instead of four — TPU
            # gathers are indices-bound (~15 ms per corner pass at
            # 16x256 RoIs, traced v5e), the dense shift-concat is cheap
            fx = jnp.concatenate([f[:, :, 1:], f[:, :, -1:]], axis=2)
            fy = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
            fxy = jnp.concatenate([fx[:, 1:], fx[:, -1:]], axis=1)
            return jnp.concatenate([f, fx, fy, fxy], axis=-1)

        table = jnp.concatenate(
            [pack(f).reshape(B, -1, 4 * C) for f in feats], axis=1
        ).reshape(B * sum_hw, 4 * C)
        # per-image row base so batched samples share ONE flat gather
        extra = jnp.arange(B, dtype=jnp.int32)[:, None] * sum_hw   # (B, 1)
    else:
        Hs = np.array([f.shape[0] for f in feats])
        Ws = np.array([f.shape[1] for f in feats])
        offsets = np.concatenate([[0], np.cumsum(Hs * Ws)[:-1]])
        table = jnp.concatenate([f.reshape(-1, C) for f in feats], axis=0)
        extra = jnp.zeros(levels.shape, jnp.int32)

    scale = jnp.asarray(1.0 / np.asarray(strides)[: len(feats)],
                        rois.dtype)[levels]          # (..., R)
    Hr = jnp.asarray(Hs)[levels]
    Wr = jnp.asarray(Ws)[levels]
    off = jnp.asarray(offsets)[levels] + extra

    x1 = rois[..., 0] * scale - 0.5
    y1 = rois[..., 1] * scale - 0.5
    x2 = rois[..., 2] * scale - 0.5
    y2 = rois[..., 3] * scale - 0.5
    bin_w = (x2 - x1) / out_size
    bin_h = (y2 - y1) / out_size

    s = sampling_ratio
    grid = (jnp.arange(out_size * s) + 0.5) / s  # fractional bin coords
    gx = x1[..., None] + grid * bin_w[..., None]     # (..., R, out*s)
    gy = y1[..., None] + grid * bin_h[..., None]

    lead = gy.shape[:-1]
    yq = jnp.broadcast_to(gy[..., :, None], lead + (out_size * s,) * 2)
    xq = jnp.broadcast_to(gx[..., None, :], yq.shape)

    y0 = jnp.floor(yq)
    x0 = jnp.floor(xq)
    # combine in the table dtype (bf16 in production): weight quantization
    # is ~0.4% of a bin, far below box-coordinate noise, and it halves the
    # bandwidth of the largest intermediates
    wy = (yq - y0)[..., None].astype(table.dtype)
    wx = (xq - x0)[..., None].astype(table.dtype)
    Hm = (Hr - 1)[..., None, None]
    Wm = (Wr - 1)[..., None, None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, Hm)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, Wm)
    inside = (yq > -1.0) & (yq < Hr[..., None, None]) & \
             (xq > -1.0) & (xq < Wr[..., None, None])

    base = off[..., None, None]
    Wrow = Wr[..., None, None]
    if feats[0].ndim == 4:
        v = table[base + y0i * Wrow + x0i]            # (..., 4C) packed
        v00, v01, v10, v11 = jnp.split(v, 4, axis=-1)
    else:
        y1i = jnp.clip(y0i + 1, 0, Hm)
        x1i = jnp.clip(x0i + 1, 0, Wm)
        v00 = table[base + y0i * Wrow + x0i]
        v01 = table[base + y0i * Wrow + x1i]
        v10 = table[base + y1i * Wrow + x0i]
        v11 = table[base + y1i * Wrow + x1i]
    val = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
           + v10 * wy * (1 - wx) + v11 * wy * wx)
    val = jnp.where(inside[..., None], val, 0.0)
    val = val.reshape(lead + (out_size, s, out_size, s, C))
    return val.mean(axis=(-4, -2))
