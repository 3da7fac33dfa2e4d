"""TPU-native training for the pose and ID networks.

The reference trains its CNNs externally through OpenMMLab runners; this
module provides the equivalent loops as pure JAX/optax so fine-tuning
runs on the same device mesh as inference. Hyperparameters follow the
reference configs:

  * pose (model/pose/td-hm_ViTPose-huge_8xb64-210e_coco-256x192_sn_
    macaque.py): UDPHeatmap codec (64x48, sigma 2, :4-14), KeypointMSE
    with target weights (:106), AdamW lr 5e-4 / wd 0.1 / betas
    (0.9, 0.999) with layer-wise lr decay 0.85 over the 32 blocks and
    no decay on bias/norm/pos_embed (:112-127), grad-norm clip 1.0,
    500-step linear warmup from 0.001x + MultiStep x0.1 at epochs
    170/200 (:128-140).
  * ID (model/id/sn_resnet152_*.py:53-70): label-smoothing (0.1)
    cross-entropy with per-class weights.

Everything here is functionally pure — `train_step` jits and shards
data-parallel over a mesh with replicated parameters.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax


# ------------------------------------------------------ UDP heatmap encode

def udp_encode(
    keypoints: jnp.ndarray,
    visible: jnp.ndarray,
    input_size: tuple[int, int] = (192, 256),
    heatmap_size: tuple[int, int] = (48, 64),
    sigma: float = 2.0,
):
    """mmpose UDPHeatmap.encode: keypoints (B, K, 2) in input-pixel
    coords + visibility (B, K) -> (heatmaps (B, H, W, K), weights (B, K)).

    UDP alignment: heatmap coords = pixel / ((input - 1) / (heatmap - 1)),
    Gaussian of ``sigma`` heatmap px at the continuous position (the
    inverse of heatmap.udp_decode's scale-back)."""
    Wi, Hi = input_size
    Wh, Hh = heatmap_size
    fx = (Wi - 1) / (Wh - 1)
    fy = (Hi - 1) / (Hh - 1)
    mu = jnp.stack([keypoints[..., 0] / fx, keypoints[..., 1] / fy], -1)

    xs = jnp.arange(Wh, dtype=jnp.float32)
    ys = jnp.arange(Hh, dtype=jnp.float32)
    dx2 = jnp.square(xs - mu[..., 0:1])               # (B, K, W)
    dy2 = jnp.square(ys - mu[..., 1:2])               # (B, K, H)
    hm = jnp.exp(-(dy2[..., :, None] + dx2[..., None, :])
                 / (2.0 * sigma * sigma))             # (B, K, H, W)

    inside = (
        (mu[..., 0] >= 0) & (mu[..., 0] <= Wh - 1)
        & (mu[..., 1] >= 0) & (mu[..., 1] <= Hh - 1)
    )
    weights = (visible.astype(jnp.float32)
               * inside.astype(jnp.float32))          # (B, K)
    hm = hm * weights[..., None, None]
    return jnp.moveaxis(hm, 1, -1), weights


def keypoint_mse_loss(pred_hm, target_hm, target_weights):
    """mmpose KeypointMSELoss(use_target_weight=True): per-keypoint MSE
    over heatmap pixels, weighted by the target weight, mean-reduced."""
    se = jnp.square(pred_hm - target_hm)              # (B, H, W, K)
    per_kp = jnp.mean(se, axis=(1, 2))                # (B, K)
    return jnp.mean(per_kp * target_weights)


# --------------------------------------------------- layer-decay optimizer

def _pose_layer_id(path: tuple, num_layers: int) -> int:
    """mmpose LayerDecayOptimWrapperConstructor layer assignment:
    patch_embed/pos_embed at 0, block i at i+1, everything after the
    backbone (final LN, head) at num_layers + 1."""
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(names)
    if "patch_embed" in joined or "pos_embed" in joined:
        return 0
    for n in names:
        if n.startswith("block"):
            return int(n[len("block"):]) + 1
    return num_layers + 1


def _no_decay(path: tuple) -> bool:
    """bias / norm / pos_embed / relative_position_bias_table get zero
    weight decay (reference paramwise_cfg)."""
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(names)
    if names and names[-1] in ("bias", "pos_embed", "rel_bias"):
        return True
    return any(n.startswith(("ln", "bn", "norm")) or "norm" in n
               for n in names)


def pose_lr_schedule(
    base_lr: float = 5e-4,
    warmup_steps: int = 500,
    warmup_factor: float = 1e-3,
    milestones_steps: Sequence[int] = (),
    gamma: float = 0.1,
):
    """LinearLR warmup + MultiStep decay (reference param_scheduler,
    pose config :128-140; milestones given in steps rather than epochs
    so callers convert with their own steps-per-epoch)."""
    def schedule(step):
        warm = warmup_factor + (1.0 - warmup_factor) * jnp.minimum(
            step / max(warmup_steps, 1), 1.0)
        decay = jnp.ones(())
        for m in milestones_steps:
            decay = decay * jnp.where(step >= m, gamma, 1.0)
        return base_lr * warm * decay

    return schedule


def make_pose_optimizer(
    params,
    base_lr: float = 5e-4,
    weight_decay: float = 0.1,
    layer_decay: float = 0.85,
    num_layers: int = 32,
    clip_norm: float = 1.0,
    schedule=None,
):
    """AdamW with layer-wise lr decay (backbone blocks scaled by
    ``layer_decay ** (num_layers + 1 - layer_id)``), zero decay on
    bias/norm/pos_embed, global-norm clipping."""
    lr_scale = jax.tree_util.tree_map_with_path(
        lambda path, _: layer_decay ** (
            num_layers + 1 - _pose_layer_id(path, num_layers)),
        params,
    )
    decay_mask = jax.tree_util.tree_map_with_path(
        lambda path, _: not _no_decay(path), params)

    def scale_by_layer():
        def init_fn(params):
            return optax.EmptyState()

        def update_fn(updates, state, params=None):
            return (jax.tree.map(lambda u, s: u * s, updates, lr_scale),
                    state)

        return optax.GradientTransformation(init_fn, update_fn)

    lr = schedule if schedule is not None else base_lr
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.scale_by_adam(b1=0.9, b2=0.999),
        optax.add_decayed_weights(weight_decay, mask=decay_mask),
        scale_by_layer(),
        optax.scale_by_learning_rate(lr),
    )


# --------------------------------------------------------- pose train step

def make_pose_train_step(model, optimizer):
    """Returns jittable ``train_step(params, opt_state, crops, kps,
    visible) -> (params, opt_state, loss)`` for a ViTPose model.
    Heatmap targets are UDP-encoded on device from pixel keypoints."""
    hm_hw = (model.cfg.grid[0] * 4, model.cfg.grid[1] * 4)
    input_size = (model.cfg.img_size[1], model.cfg.img_size[0])
    heatmap_size = (hm_hw[1], hm_hw[0])

    def loss_fn(params, batch_stats, crops, kps, visible):
        target, weights = udp_encode(kps, visible, input_size,
                                     heatmap_size)
        variables = {"params": params, **batch_stats}
        out = model.apply(variables, crops, train=True,
                          mutable=["batch_stats"])
        pred, updates = out
        loss = keypoint_mse_loss(pred.astype(jnp.float32), target, weights)
        return loss, updates

    @jax.jit
    def train_step(params, batch_stats, opt_state, crops, kps, visible):
        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, crops, kps, visible)
        deltas, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, deltas)
        return params, updates, opt_state, loss

    return train_step


# ----------------------------------------------------------- ID classifier

# reference class weights (model/id/..._finetuned.py:54-61) for classes
# ['b', 'd', 'g', 'r', 'unknown', 'w']
ID_CLASS_WEIGHTS = (5.08130081300813, 4.693818601964183,
                    11.475988700564972, 9.057971014492754,
                    0.1894734387388648, 8.708467309753484)


def label_smooth_loss(logits, labels, class_weight=None,
                      smooth: float = 0.1):
    """mmpretrain LabelSmoothLoss (mode='original') with per-class
    weights: smoothed one-hot eps/K + (1-eps), weighted cross-entropy,
    mean over the batch."""
    K = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, K)
    y = onehot * (1.0 - smooth) + smooth / K
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    w = (jnp.ones((K,)) if class_weight is None
         else jnp.asarray(class_weight, jnp.float32))
    return -jnp.mean(jnp.sum(y * w * logp, axis=-1))


def make_id_train_step(model, optimizer,
                       class_weight=ID_CLASS_WEIGHTS, smooth=0.1):
    """Returns jittable ``train_step(params, batch_stats, opt_state,
    images, labels)`` for the ResNet collar-ID classifier."""

    def loss_fn(params, batch_stats, images, labels):
        variables = {"params": params, **batch_stats}
        logits, updates = model.apply(variables, images, train=True,
                                      mutable=["batch_stats"])
        return label_smooth_loss(logits, labels, class_weight, smooth), \
            updates

    @jax.jit
    def train_step(params, batch_stats, opt_state, images, labels):
        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images, labels)
        deltas, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, deltas)
        return params, updates, opt_state, loss

    return train_step


# ---------------------------------------------------- detection training
#
# The reference trains the Swin Mask R-CNN through mmdet's runner with
# MaxIoUAssigner + RandomSampler target assignment and sigmoid-BCE/L1
# (RPN) + softmax-CE/L1 (RoI) losses
# (model/detection/SWIN-Mask_R-CNN_bbox_only.py:186-222 train_cfg,
# :137-174 rpn_head losses, :90-124 roi_head). Below is the TPU-native
# equivalent: every step is fixed-shape (rank-based sampling masks, no
# data-dependent gathers), so the whole train step jits and shards
# data-parallel over the mesh.


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) xyxy -> (N, M) IoU."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * \
        jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * \
        jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def bbox2delta(proposals: jnp.ndarray, gt: jnp.ndarray,
               stds=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """DeltaXYWHBBoxCoder.encode (means 0): inverse of ops.delta2bbox."""
    pw = jnp.maximum(proposals[..., 2] - proposals[..., 0], 1e-6)
    ph = jnp.maximum(proposals[..., 3] - proposals[..., 1], 1e-6)
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    gw = jnp.maximum(gt[..., 2] - gt[..., 0], 1e-6)
    gh = jnp.maximum(gt[..., 3] - gt[..., 1], 1e-6)
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    s = jnp.asarray(stds)
    return jnp.stack([
        (gx - px) / pw / s[0],
        (gy - py) / ph / s[1],
        jnp.log(gw / pw) / s[2],
        jnp.log(gh / ph) / s[3],
    ], axis=-1)


def max_iou_assign(
    boxes: jnp.ndarray, gt: jnp.ndarray, gt_valid: jnp.ndarray,
    pos_iou_thr: float, neg_iou_thr: float, min_pos_iou: float,
    match_low_quality: bool = True,
):
    """mmdet MaxIoUAssigner (train_cfg :186-222 semantics).

    Returns ``assigned`` int32 (N,): ``-1`` negative, ``-2`` ignored
    (between neg and pos thresholds), ``>= 0`` index of the assigned gt.
    ``match_low_quality`` additionally assigns, for every gt, all boxes
    tying its best overlap (mmdet's per-gt loop, later gts override
    earlier ones on conflict) when that overlap >= ``min_pos_iou``.
    """
    ious = iou_matrix(boxes, gt)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    max_iou = ious.max(axis=1)
    argmax = ious.argmax(axis=1).astype(jnp.int32)

    assigned = jnp.where(
        max_iou >= pos_iou_thr, argmax,
        jnp.where(max_iou < neg_iou_thr, -1, -2).astype(jnp.int32),
    )
    if match_low_quality:
        M = gt.shape[0]
        gt_best = ious.max(axis=0)                       # (M,)
        is_best = (ious == gt_best[None, :]) & \
            (gt_best[None, :] >= min_pos_iou) & gt_valid[None, :]
        any_best = is_best.any(axis=1)
        last_best = (M - 1) - jnp.argmax(
            is_best[:, ::-1], axis=1).astype(jnp.int32)
        assigned = jnp.where(any_best, last_best, assigned)
    return assigned


def random_sample_masks(
    assigned: jnp.ndarray, num: int, pos_fraction: float,
    key: jax.Array,
):
    """mmdet RandomSampler as fixed-shape masks.

    Returns ``(pos_sampled, neg_sampled, avg_factor)``: boolean (N,)
    masks selecting up to ``num * pos_fraction`` random positives and
    ``num - n_pos`` random negatives (``neg_pos_ub=-1``), and the
    number sampled (the loss normalizer, mmdet's ``avg_factor``).
    Rank-based: every candidate gets a random key; the top-k by key
    within its pool is selected — no dynamic-shape gathers.
    """
    n = assigned.shape[0]
    pos = assigned >= 0
    neg = assigned == -1
    r = jax.random.uniform(key, (n,))

    def rank_of(mask):
        score = jnp.where(mask, r, jnp.inf)
        order = jnp.argsort(score)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        return rank

    num_pos_want = int(num * pos_fraction)
    pos_sampled = pos & (rank_of(pos) < num_pos_want)
    n_pos = jnp.sum(pos_sampled)
    neg_sampled = neg & (rank_of(neg) < (num - n_pos))
    avg = jnp.maximum(jnp.sum(pos_sampled) + jnp.sum(neg_sampled), 1)
    return pos_sampled, neg_sampled, avg.astype(jnp.float32)


def rpn_loss(
    rpn_outs, anchors, gt_boxes, gt_valid, key,
    pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
    num_samples=256, pos_fraction=0.5,
):
    """RPN losses for ONE image: sigmoid BCE on objectness + L1 on
    deltas of sampled positives (loss_cls/loss_bbox, ref config
    :137-174; train_cfg.rpn :205-218).

    rpn_outs: list over levels of ((h, w, 3) cls, (h, w, 12) reg);
    anchors: list over levels of (h*w*3, 4).
    """
    cls_flat = jnp.concatenate(
        [cls.reshape(-1) for cls, _ in rpn_outs])
    reg_flat = jnp.concatenate(
        [reg.reshape(-1, 4) for _, reg in rpn_outs])
    anc = jnp.concatenate([jnp.asarray(a) for a in anchors])

    assigned = max_iou_assign(anc, gt_boxes, gt_valid,
                              pos_iou_thr, neg_iou_thr, min_pos_iou,
                              match_low_quality=True)
    pos_s, neg_s, avg = random_sample_masks(
        assigned, num_samples, pos_fraction, key)

    labels = pos_s.astype(jnp.float32)
    bce = optax.sigmoid_binary_cross_entropy(
        cls_flat.astype(jnp.float32), labels)
    loss_cls = jnp.sum(jnp.where(pos_s | neg_s, bce, 0.0)) / avg

    tgt = bbox2delta(anc, gt_boxes[jnp.maximum(assigned, 0)])
    l1 = jnp.sum(jnp.abs(reg_flat.astype(jnp.float32) - tgt), axis=-1)
    loss_reg = jnp.sum(jnp.where(pos_s, l1, 0.0)) / avg
    return loss_cls, loss_reg


def roi_loss(
    cls_logits, reg, proposals, assigned, gt_boxes, key,
    num_samples=512, pos_fraction=0.25, num_classes=1,
):
    """RoI box-head losses for ONE image: softmax CE (fg classes +
    background last) + class-specific L1 on sampled positives
    (ref roi_head :90-124; train_cfg.rcnn :187-204). ``assigned`` comes
    from max_iou_assign on the (gt-augmented) proposals."""
    pos_s, neg_s, avg = random_sample_masks(
        assigned, num_samples, pos_fraction, key)

    # single foreground class: label 0 = macaque, 1 = background
    labels = jnp.where(pos_s, 0, num_classes)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        cls_logits.astype(jnp.float32), labels)
    loss_cls = jnp.sum(jnp.where(pos_s | neg_s, ce, 0.0)) / avg

    tgt = bbox2delta(proposals, gt_boxes[jnp.maximum(assigned, 0)],
                     stds=(0.1, 0.1, 0.2, 0.2))
    l1 = jnp.sum(jnp.abs(reg.reshape(-1, num_classes, 4)[:, 0]
                         .astype(jnp.float32) - tgt), axis=-1)
    loss_reg = jnp.sum(jnp.where(pos_s, l1, 0.0)) / avg
    return loss_cls, loss_reg


def make_detection_optimizer(params, lr: float = 1e-4,
                             weight_decay: float = 0.05):
    """AdamW per the reference's AmpOptimWrapper (config :227-238),
    no decay on bias/norm parameters."""
    def decay_mask(tree):
        def keep(path, x):
            name = path[-1].key if hasattr(path[-1], "key") else ""
            return name not in ("bias", "scale", "rel_bias", "wscale")
        return jax.tree_util.tree_map_with_path(keep, tree)

    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=weight_decay,
                    mask=decay_mask),
    )


def make_detection_train_step(model, optimizer, num_proposals=512):
    """Full detection train step (batch of images + padded gt boxes).

    ``train_step(params, opt_state, key, images, gt_boxes, gt_valid)``
    -> (params, opt_state, metrics dict). The RoI stage trains on the
    RPN's own proposals (stop-gradient through NMS, as mmdet) with the
    gt boxes appended (add_gt_as_proposals=True, train_cfg :196).
    """
    from macaque_tpu.nn.ops import (
        make_anchors, delta2bbox, batched_nms_fixed, roi_align_windowed,
    )

    c = model.cfg

    def loss_fn(params, key, images, gt_boxes, gt_valid):
        B = images.shape[0]
        variables = {"params": params}
        fpn_feats, rpn_outs = model.apply(variables, images,
                                          method="trunk")
        feat_sizes = [(f.shape[1], f.shape[2]) for f in fpn_feats]
        anchors = make_anchors(feat_sizes, c.strides)
        img_shape = (images.shape[1], images.shape[2])

        keys = jax.random.split(key, 2 * B)

        # ---- RPN losses per image
        def rpn_one(i):
            outs_i = [(cls[i], reg[i]) for cls, reg in rpn_outs]
            return rpn_loss(outs_i, anchors, gt_boxes[i], gt_valid[i],
                            keys[i])

        rpn_cls, rpn_reg = zip(*[rpn_one(i) for i in range(B)])
        loss_rpn_cls = jnp.mean(jnp.stack(rpn_cls))
        loss_rpn_reg = jnp.mean(jnp.stack(rpn_reg))

        # ---- proposals (train budget), gt-augmented, stop-gradient
        def proposals_one(rpn_img):
            all_boxes, all_scores, all_ids = [], [], []
            for lvl, ((cls, reg), anc) in enumerate(zip(rpn_img,
                                                        anchors)):
                score = jax.nn.sigmoid(cls.reshape(-1))
                delta = reg.reshape(-1, 4)
                k = min(c.rpn_nms_pre, score.shape[0])
                top_s, top_i = jax.lax.top_k(score, k)
                boxes = delta2bbox(
                    jnp.asarray(anc)[top_i], delta[top_i],
                    stds=(1.0, 1.0, 1.0, 1.0), max_shape=img_shape)
                all_boxes.append(boxes)
                all_scores.append(top_s)
                all_ids.append(jnp.full((k,), lvl, jnp.int32))
            pb = jnp.concatenate(all_boxes)
            ps = jnp.concatenate(all_scores)
            pi = jnp.concatenate(all_ids)
            keep, keep_valid = batched_nms_fixed(
                pb, ps, pi, c.rpn_iou_thr,
                min(num_proposals, pb.shape[0]))
            return pb[keep], keep_valid

        def per_img(i):
            outs_i = [(cls[i], reg[i]) for cls, reg in rpn_outs]
            props, pvalid = proposals_one(outs_i)
            props = jnp.concatenate([props, gt_boxes[i]])
            pvalid = jnp.concatenate([pvalid, gt_valid[i]])
            props = jax.lax.stop_gradient(props)
            assigned = max_iou_assign(
                props, gt_boxes[i], gt_valid[i],
                pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
                match_low_quality=True)
            assigned = jnp.where(pvalid, assigned, -2)
            return props, assigned

        props_all, assigned_all = zip(*[per_img(i) for i in range(B)])
        props_all = jnp.stack(props_all)          # (B, P, 4)
        assigned_all = jnp.stack(assigned_all)

        # ---- RoI features + head
        w = jnp.maximum(props_all[..., 2] - props_all[..., 0], 0)
        h = jnp.maximum(props_all[..., 3] - props_all[..., 1], 0)
        lvl = jnp.clip(jnp.floor(jnp.log2(
            jnp.sqrt(w * h) / c.finest_scale + 1e-6)), 0, 3)
        roi_feats = roi_align_windowed(
            [f.astype(c.compute_dtype) for f in fpn_feats[:4]],
            props_all, lvl.astype(jnp.int32), 7, c.strides)
        P = props_all.shape[1]
        cls_logits, reg = model.apply(
            variables,
            roi_feats.reshape(B * P, *roi_feats.shape[2:])
            .astype(c.compute_dtype),
            method=lambda m, x: m.bbox_head(x))
        cls_logits = cls_logits.reshape(B, P, -1)
        reg = reg.reshape(B, P, -1)

        roi_cls, roi_reg = zip(*[
            roi_loss(cls_logits[i], reg[i], props_all[i],
                     assigned_all[i], gt_boxes[i], keys[B + i],
                     num_classes=c.num_classes)
            for i in range(B)
        ])
        loss_roi_cls = jnp.mean(jnp.stack(roi_cls))
        loss_roi_reg = jnp.mean(jnp.stack(roi_reg))

        total = loss_rpn_cls + loss_rpn_reg + loss_roi_cls + loss_roi_reg
        return total, {
            "loss": total, "rpn_cls": loss_rpn_cls,
            "rpn_reg": loss_rpn_reg, "roi_cls": loss_roi_cls,
            "roi_reg": loss_roi_reg,
        }

    @jax.jit
    def train_step(params, opt_state, key, images, gt_boxes, gt_valid):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key, images, gt_boxes, gt_valid)
        deltas, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, deltas)
        return params, opt_state, metrics

    return train_step
