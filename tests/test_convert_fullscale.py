"""Full-scale weight-conversion coverage tests.

Mechanically generates the complete mm-named state dict (names + exact
shapes) for each of the three REAL reference architectures — straight
from the released config hyperparameters — then asserts the converters:

  1. consume 100% of the checkpoint keys (nothing silently dropped), and
  2. produce a parameter tree whose structure and shapes match the Flax
     models' own init exactly (via jax.eval_shape — no FLOPs),

so a real released .pth will convert first try; any key-naming or layout
drift in either direction fails here at full architecture size.

Architectures (reference configs):
  * ViTPose-huge: model/pose/td-hm_ViTPose-huge_8xb64-210e_coco-256x192_
    sn_macaque.py:55-108 (1280-d, depth 32, heads 16, patch 16 pad 2,
    2x deconv-256 head, 17 kp)
  * Swin-S Mask R-CNN bbox-only: model/detection/SWIN-Mask_R-CNN_bbox_
    only.py:33-185 (depths 2,2,18,2; FPN 256; RPN 3 anchors; Shared2FC
    head 1024, 1 class)
  * ResNet-152 ID: model/id/sn_resnet152_8xb32_in1k_snmacaque*.py
    (stages 3,8,36,3; 6 classes)
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from macaque_tpu.nn import convert as cv  # noqa: E402


def _fill(shapes: dict) -> dict:
    return {k: np.zeros(s, np.float32) for k, s in shapes.items()}


def _ln(d, p, n):
    d[f"{p}.weight"] = (n,)
    d[f"{p}.bias"] = (n,)


def _bn(d, p, n):
    d[f"{p}.weight"] = (n,)
    d[f"{p}.bias"] = (n,)
    d[f"{p}.running_mean"] = (n,)
    d[f"{p}.running_var"] = (n,)
    d[f"{p}.num_batches_tracked"] = ()


def _linear(d, p, n_in, n_out, bias=True):
    d[f"{p}.weight"] = (n_out, n_in)
    if bias:
        d[f"{p}.bias"] = (n_out,)


def _conv(d, p, c_in, c_out, k, bias=True):
    d[f"{p}.weight"] = (c_out, c_in, k, k)
    if bias:
        d[f"{p}.bias"] = (c_out,)


# --------------------------------------------------------------------------
# state-dict generators (full size, from the reference config values)
# --------------------------------------------------------------------------


def mm_vitpose_full():
    D, depth, mlp = 1280, 32, 4
    d: dict = {}
    _conv(d, "backbone.patch_embed.projection", 3, D, 16)
    # 256x192, patch 16, pad 2 -> 16x12 = 192 tokens (+ cls slot kept by
    # the MAE-pretrained mmpretrain ViT even with with_cls_token=False)
    d["backbone.pos_embed"] = (1, 193, D)
    for i in range(depth):
        p = f"backbone.layers.{i}"
        _ln(d, f"{p}.ln1", D)
        _linear(d, f"{p}.attn.qkv", D, 3 * D)
        _linear(d, f"{p}.attn.proj", D, D)
        _ln(d, f"{p}.ln2", D)
        _linear(d, f"{p}.ffn.layers.0.0", D, D * mlp)
        _linear(d, f"{p}.ffn.layers.1", D * mlp, D)
    _ln(d, "backbone.ln1", D)
    # HeatmapHead: deconv_out_channels (256, 256), kernels 4 -> the
    # Sequential indices [deconv, BN, ReLU] * 2
    d["head.deconv_layers.0.weight"] = (D, 256, 4, 4)
    _bn(d, "head.deconv_layers.1", 256)
    d["head.deconv_layers.3.weight"] = (256, 256, 4, 4)
    _bn(d, "head.deconv_layers.4", 256)
    _conv(d, "head.final_layer", 256, 17, 1)
    return d


def mm_swin_maskrcnn_full():
    E, depths, mlp, window = 96, (2, 2, 18, 2), 4, 7
    d: dict = {}
    _conv(d, "backbone.patch_embed.projection", 3, E, 4)
    _ln(d, "backbone.patch_embed.norm", E)
    heads = (3, 6, 12, 24)
    for s, depth in enumerate(depths):
        C = E * 2 ** s
        for b in range(depth):
            p = f"backbone.stages.{s}.blocks.{b}"
            _ln(d, f"{p}.norm1", C)
            _linear(d, f"{p}.attn.w_msa.qkv", C, 3 * C)
            _linear(d, f"{p}.attn.w_msa.proj", C, C)
            d[f"{p}.attn.w_msa.relative_position_bias_table"] = (
                (2 * window - 1) ** 2, heads[s])
            d[f"{p}.attn.w_msa.relative_position_index"] = (
                window * window, window * window)
            _ln(d, f"{p}.norm2", C)
            _linear(d, f"{p}.ffn.layers.0.0", C, C * mlp)
            _linear(d, f"{p}.ffn.layers.1", C * mlp, C)
        if s < len(depths) - 1:
            _ln(d, f"backbone.stages.{s}.downsample.norm", 4 * C)
            _linear(d, f"backbone.stages.{s}.downsample.reduction",
                    4 * C, 2 * C, bias=False)
        _ln(d, f"backbone.norm{s}", C)

    for i, cin in enumerate((96, 192, 384, 768)):
        _conv(d, f"neck.lateral_convs.{i}.conv", cin, 256, 1)
        _conv(d, f"neck.fpn_convs.{i}.conv", 256, 256, 3)

    # RPN: 3 anchors (scales [8] x ratios [0.5, 1, 2]), sigmoid cls
    _conv(d, "rpn_head.rpn_conv", 256, 256, 3)
    _conv(d, "rpn_head.rpn_cls", 256, 3, 1)
    _conv(d, "rpn_head.rpn_reg", 256, 12, 1)

    # Shared2FCBBoxHead: flattened 256x7x7 -> 1024 -> 1024; 1 class
    _linear(d, "roi_head.bbox_head.shared_fcs.0", 256 * 7 * 7, 1024)
    _linear(d, "roi_head.bbox_head.shared_fcs.1", 1024, 1024)
    _linear(d, "roi_head.bbox_head.fc_cls", 1024, 2)
    _linear(d, "roi_head.bbox_head.fc_reg", 1024, 4)
    return d


def mm_resnet152_full():
    d: dict = {}
    _conv(d, "backbone.conv1", 3, 64, 7, bias=False)
    _bn(d, "backbone.bn1", 64)
    stage_blocks = (3, 8, 36, 3)
    c_in = 64
    for s, blocks in enumerate(stage_blocks):
        planes = 64 * 2 ** s
        c_out = planes * 4
        for b in range(blocks):
            p = f"backbone.layer{s + 1}.{b}"
            d[f"{p}.conv1.weight"] = (planes, c_in, 1, 1)
            _bn(d, f"{p}.bn1", planes)
            d[f"{p}.conv2.weight"] = (planes, planes, 3, 3)
            _bn(d, f"{p}.bn2", planes)
            d[f"{p}.conv3.weight"] = (c_out, planes, 1, 1)
            _bn(d, f"{p}.bn3", c_out)
            if b == 0:
                d[f"{p}.downsample.0.weight"] = (c_out, c_in, 1, 1)
                _bn(d, f"{p}.downsample.1", c_out)
            c_in = c_out
    _linear(d, "head.fc", 2048, 6)
    return d


# --------------------------------------------------------------------------
# helpers: coverage capture + tree/shape comparison
# --------------------------------------------------------------------------


@pytest.fixture
def coverage(monkeypatch):
    """Capture the converters' key-coverage report."""
    captured = {}

    def spy(sd, name):
        unused = [
            k for k in sd.keys()
            if k not in sd.accessed
            and not any(p in k for p in cv._IGNORABLE_PATTERNS)
        ]
        captured[name] = unused

    monkeypatch.setattr(cv, "_report_coverage", spy)
    return captured


def _shape_tree(tree):
    return jax.tree.map(lambda x: tuple(np.shape(x)), tree)


def _assert_trees_match(converted, expected, label):
    got = _shape_tree(converted)
    want = jax.tree.map(lambda x: tuple(x.shape), expected)
    flat_got = dict(jax.tree_util.tree_flatten_with_path(got)[0])
    flat_want = dict(jax.tree_util.tree_flatten_with_path(want)[0])
    missing = sorted(set(flat_want) - set(flat_got), key=str)
    extra = sorted(set(flat_got) - set(flat_want), key=str)
    assert not missing, f"{label}: converter missing params {missing[:5]}"
    assert not extra, f"{label}: converter produced extras {extra[:5]}"
    for k in flat_want:
        assert flat_got[k] == flat_want[k], \
            f"{label}: shape mismatch at {k}: " \
            f"{flat_got[k]} != {flat_want[k]}"


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


def test_vitpose_huge_full_conversion(coverage):
    from macaque_tpu.nn import ViTPose, VitPoseConfig

    sd = _fill(mm_vitpose_full())
    variables = cv.convert_vitpose(sd, depth=32)
    assert coverage["vitpose"] == []

    model = ViTPose(VitPoseConfig())  # full huge defaults
    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 192, 3))))
    _assert_trees_match(variables, expected, "vitpose-huge")


def test_swin_maskrcnn_full_conversion(coverage):
    from macaque_tpu.nn import SwinMaskRCNN, DetectorConfig

    sd = _fill(mm_swin_maskrcnn_full())
    variables = cv.convert_swin_maskrcnn(sd)
    assert coverage["swin_maskrcnn"] == []

    model = SwinMaskRCNN(DetectorConfig())
    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 224, 224, 3))))
    _assert_trees_match(variables, expected, "swin-maskrcnn")


def test_resnet152_full_conversion(coverage):
    from macaque_tpu.nn import ResNetClassifier, ResNetConfig

    sd = _fill(mm_resnet152_full())
    variables = cv.convert_resnet(sd)
    assert coverage["resnet"] == []

    model = ResNetClassifier(ResNetConfig())
    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 224, 224, 3))))
    _assert_trees_match(variables, expected, "resnet-152")
