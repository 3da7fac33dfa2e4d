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
