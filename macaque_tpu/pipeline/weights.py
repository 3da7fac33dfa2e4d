"""Checkpoint loading for the production perception stack.

``build_flax_perception`` mirrors the reference's model-initialisation
role (reference run_demo.py:21-39 / src/pipeline/step1_proc2d.py
``init_all_models``): convert the released .pth checkpoints into the
Flax detector / pose / ID models and wrap them in a
:class:`~macaque_tpu.pipeline.perception.FlaxPerception`.

Serving tiers (all opt-in via env vars, default = exact-mmdet parity):
  * ``MACAQUE_TPU_INT8=1``    — int8 ViT pose blocks (nn/quant.py)
  * ``MACAQUE_TPU_SERVING=1`` — 512/128 RPN-RoI detector budgets + int8 pose
  * ``MACAQUE_TPU_FAST=1``    — 640-input detector + single-pass int8 pose
Trade-offs are documented in ARCHITECTURE.md "Roofline".
"""

from __future__ import annotations

import os


def build_flax_perception(weights_dir: str):
    """Load converted .pth checkpoints into the Flax models.

    Conversions are cached as Orbax checkpoints under
    ``<weights_dir>/orbax_cache/`` (override with
    ``MACAQUE_TPU_ORBAX_CACHE``): the first run converts through torch,
    later runs restore natively — the reference re-loads .pth through
    torch on every run (step1:98-120)."""
    import jax
    import jax.numpy as jnp

    from macaque_tpu.nn import (
        DetectorConfig, ResNetClassifier, ResNetConfig, SwinMaskRCNN,
        ViTPose, VitPoseConfig,
    )
    from macaque_tpu.nn.checkpoint import convert_and_cache
    from macaque_tpu.nn.convert import (
        convert_resnet, convert_swin_maskrcnn, convert_vitpose,
    )
    from macaque_tpu.nn.swin import SwinConfig
    from macaque_tpu.pipeline.perception import FlaxPerception

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    int8 = os.environ.get("MACAQUE_TPU_INT8", "0") == "1"
    fast = os.environ.get("MACAQUE_TPU_FAST", "0") == "1"
    serving = os.environ.get("MACAQUE_TPU_SERVING", "0") == "1" or fast
    int8 = int8 or serving
    # keep-ratio detector input target (mmdet parity 800; the fast tier's
    # 640 is a documented trade-off). The env override exists for
    # wiring drills / constrained hosts — changing it changes accuracy.
    det_target = int(os.environ.get(
        "MACAQUE_TPU_DET_TARGET", 640 if fast else 800))
    det_kw = dict(swin=SwinConfig(compute_dtype=dtype),
                  compute_dtype=dtype)
    det = SwinMaskRCNN(DetectorConfig.serving(**det_kw) if serving
                       else DetectorConfig(**det_kw))
    pose = ViTPose(VitPoseConfig(
        compute_dtype=dtype,
        # packed-qkv pallas attention (bf16 dots, blocked crops)
        use_pallas_attention=(jax.default_backend() == "tpu"),
        quantize="int8" if int8 else None,
    ))
    idm = ResNetClassifier(ResNetConfig(compute_dtype=dtype))

    cache_dir = os.environ.get(
        "MACAQUE_TPU_ORBAX_CACHE", os.path.join(weights_dir, "orbax_cache"))
    det_vars = jax.tree.map(jnp.asarray, convert_and_cache(
        os.path.join(weights_dir, "detection/detection.pth"),
        convert_swin_maskrcnn, cache_dir))
    pose_vars = jax.tree.map(jnp.asarray, convert_and_cache(
        os.path.join(weights_dir, "pose/pose.pth"),
        convert_vitpose, cache_dir))
    if int8:
        from macaque_tpu.nn.quant import quantize_vitpose_params

        pose_vars = quantize_vitpose_params(pose_vars)
    id_vars = jax.tree.map(jnp.asarray, convert_and_cache(
        os.path.join(weights_dir, "id/id_finetuned.pth"),
        convert_resnet, cache_dir))
    return FlaxPerception(det, det_vars, pose, pose_vars, idm, id_vars,
                          flip_test=not fast, det_target=det_target)
