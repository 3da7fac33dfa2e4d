"""NN-stack tests: torch numerical parity (via the weight converter),
UDP decode accuracy, NMS/RoIAlign oracles, detector smoke test.

The torch reference modules below are built with mm-style parameter names
so they exercise the real converter path end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
tn = torch.nn


# ----------------------------------------------------------- torch ViTPose

def build_torch_vitpose(dim=64, depth=2, heads=2, img=(64, 48), patch=16,
                        pad=2, nkp=17, deconv=32):
    class Attn(tn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = tn.Linear(dim, dim * 3)
            self.proj = tn.Linear(dim, dim)

        def forward(self, x):
            B, N, D = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, heads, D // heads)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * (D // heads) ** -0.5
            attn = attn.softmax(dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(B, N, D)
            return self.proj(out)

    class FFN(tn.Module):
        def __init__(self):
            super().__init__()
            self.layers = tn.ModuleList(
                [tn.Sequential(tn.Linear(dim, dim * 4)), tn.Linear(dim * 4, dim)]
            )

        def forward(self, x):
            return self.layers[1](tn.functional.gelu(self.layers[0](x)))

    class Block(tn.Module):
        def __init__(self):
            super().__init__()
            self.ln1 = tn.LayerNorm(dim, eps=1e-6)
            self.attn = Attn()
            self.ln2 = tn.LayerNorm(dim, eps=1e-6)
            self.ffn = FFN()

        def forward(self, x):
            x = x + self.attn(self.ln1(x))
            return x + self.ffn(self.ln2(x))

    gh = (img[0] + 2 * pad - patch) // patch + 1
    gw = (img[1] + 2 * pad - patch) // patch + 1

    class PatchEmbed(tn.Module):
        def __init__(self):
            super().__init__()
            self.projection = tn.Conv2d(3, dim, patch, patch, pad)

        def forward(self, x):
            return self.projection(x)

    class Backbone(tn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = PatchEmbed()
            self.pos_embed = tn.Parameter(torch.randn(1, gh * gw, dim) * 0.02)
            self.layers = tn.ModuleList([Block() for _ in range(depth)])
            self.ln1 = tn.LayerNorm(dim, eps=1e-6)

        def forward(self, x):
            x = self.patch_embed(x)
            B, D, h, w = x.shape
            x = x.flatten(2).transpose(1, 2)
            x = x + self.pos_embed
            for blk in self.layers:
                x = blk(x)
            x = self.ln1(x)
            return x.transpose(1, 2).reshape(B, D, h, w)

    class Head(tn.Module):
        def __init__(self):
            super().__init__()
            self.deconv_layers = tn.Sequential(
                tn.ConvTranspose2d(dim, deconv, 4, 2, 1, bias=False),
                tn.BatchNorm2d(deconv),
                tn.ReLU(),
                tn.ConvTranspose2d(deconv, deconv, 4, 2, 1, bias=False),
                tn.BatchNorm2d(deconv),
                tn.ReLU(),
            )
            self.final_layer = tn.Conv2d(deconv, nkp, 1)

        def forward(self, x):
            return self.final_layer(self.deconv_layers(x))

    class Model(tn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()
            self.head = Head()

        def forward(self, x):
            return self.head(self.backbone(x))

    return Model().eval()


def test_vitpose_matches_torch():
    from macaque_tpu.nn import ViTPose, VitPoseConfig
    from macaque_tpu.nn.convert import convert_vitpose

    torch.manual_seed(0)
    tm = build_torch_vitpose()
    sd = {k: v for k, v in tm.state_dict().items()}

    cfg = VitPoseConfig(img_size=(64, 48), embed_dim=64, depth=2, num_heads=2,
                        deconv_channels=(32, 32))
    model = ViTPose(cfg)
    variables = convert_vitpose(sd, depth=2)
    variables = jax.tree.map(jnp.asarray, variables)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 48, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = model.apply(variables, jnp.asarray(x))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=2e-5)


# ------------------------------------------------------------ torch ResNet

def build_torch_resnet(stage_blocks=(2, 2), num_classes=6):
    class Bottleneck(tn.Module):
        def __init__(self, cin, ch, stride, downsample):
            super().__init__()
            self.conv1 = tn.Conv2d(cin, ch, 1, bias=False)
            self.bn1 = tn.BatchNorm2d(ch)
            self.conv2 = tn.Conv2d(ch, ch, 3, stride, 1, bias=False)
            self.bn2 = tn.BatchNorm2d(ch)
            self.conv3 = tn.Conv2d(ch, ch * 4, 1, bias=False)
            self.bn3 = tn.BatchNorm2d(ch * 4)
            self.downsample = None
            if downsample:
                self.downsample = tn.Sequential(
                    tn.Conv2d(cin, ch * 4, 1, stride, bias=False),
                    tn.BatchNorm2d(ch * 4),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = tn.functional.relu(self.bn1(self.conv1(x)))
            out = tn.functional.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return tn.functional.relu(out + idt)

    class Backbone(tn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tn.BatchNorm2d(64)
            cin = 64
            for s, blocks in enumerate(stage_blocks):
                ch = 64 * (2 ** s)
                layer = []
                for b in range(blocks):
                    stride = 2 if (s > 0 and b == 0) else 1
                    layer.append(Bottleneck(cin, ch, stride, b == 0))
                    cin = ch * 4
                setattr(self, f"layer{s + 1}", tn.Sequential(*layer))

        def forward(self, x):
            x = tn.functional.relu(self.bn1(self.conv1(x)))
            x = tn.functional.max_pool2d(x, 3, 2, 1)
            for s in range(len(stage_blocks)):
                x = getattr(self, f"layer{s + 1}")(x)
            return x

    class Head(tn.Module):
        def __init__(self, cin):
            super().__init__()
            self.fc = tn.Linear(cin, num_classes)

        def forward(self, x):
            return self.fc(x.mean(dim=(2, 3)))

    class Model(tn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()
            self.head = Head(64 * (2 ** (len(stage_blocks) - 1)) * 4)

        def forward(self, x):
            return self.head(self.backbone(x))

    return Model().eval()


def test_resnet_matches_torch():
    from macaque_tpu.nn.resnet import ResNetClassifier, ResNetConfig
    from macaque_tpu.nn.convert import convert_resnet
    from dataclasses import dataclass

    torch.manual_seed(1)
    tm = build_torch_resnet((2, 2))
    # randomize BN stats so the test exercises them
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    sd = tm.state_dict()

    @dataclass(frozen=True)
    class TinyCfg(ResNetConfig):
        @property
        def stage_blocks(self):
            return (2, 2)

    model = ResNetClassifier(TinyCfg())
    variables = jax.tree.map(jnp.asarray, convert_resnet(sd, (2, 2)))

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4)


# ----------------------------------------------------------------- decode

def test_udp_decode_recovers_subpixel_peak():
    from macaque_tpu.nn.heatmap import udp_decode

    H, W, K = 64, 48, 3
    rng = np.random.default_rng(2)
    truth = np.stack(
        [rng.uniform(10, W - 10, K), rng.uniform(10, H - 10, K)], axis=1
    )
    ys, xs = np.mgrid[0:H, 0:W]
    hm = np.exp(
        -((xs[None] - truth[:, 0, None, None]) ** 2
          + (ys[None] - truth[:, 1, None, None]) ** 2) / (2 * 2.0 ** 2)
    )
    kp, scores = udp_decode(jnp.asarray(hm.transpose(1, 2, 0)[None]),
                            input_size=(W, H))
    # input_size == heatmap size -> coords directly comparable
    got = np.asarray(kp)[0]
    np.testing.assert_allclose(got, truth, atol=0.05)
    assert np.asarray(scores).min() > 0.9


def test_flip_heatmaps_roundtrip():
    from macaque_tpu.nn.heatmap import flip_heatmaps

    rng = np.random.default_rng(3)
    hm = rng.normal(size=(1, 8, 6, 17))
    out = np.asarray(flip_heatmaps(flip_heatmaps(jnp.asarray(hm))))
    np.testing.assert_allclose(out, hm)


# -------------------------------------------------------------------- NMS

def nms_np(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    supp = np.zeros(len(boxes), bool)
    for i in order:
        if supp[i] or not np.isfinite(scores[i]):
            continue
        keep.append(i)
        for j in order:
            if j == i or supp[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if scores[j] < scores[i] and inter / (a + b - inter) > thr:
                supp[j] = True
    return keep


def test_nms_matches_oracle():
    from macaque_tpu.nn.ops import nms_fixed

    rng = np.random.default_rng(4)
    N = 40
    ctr = rng.uniform(50, 450, (N, 2))
    wh = rng.uniform(20, 80, (N, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1)
    scores = rng.uniform(0.1, 1.0, N)
    keep_idx, keep_valid = nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, N
    )
    got = list(np.asarray(keep_idx)[np.asarray(keep_valid)])
    want = nms_np(boxes, scores, 0.5)
    assert got == want


# --------------------------------------------------------------- RoIAlign

def test_roi_align_constant_and_linear():
    from macaque_tpu.nn.ops import roi_align

    # constant feature map -> every bin equals the constant
    feat = np.full((32, 32, 2), 3.5, np.float32)
    rois = jnp.asarray([[4.0, 4.0, 20.0, 28.0]])
    out = np.asarray(roi_align(jnp.asarray(feat), rois, 7, 1.0))
    np.testing.assert_allclose(out, 3.5, atol=1e-6)

    # linear ramp f(x, y) = x -> bin centers must reproduce the ramp
    xs = np.arange(32, dtype=np.float32)
    feat = np.broadcast_to(xs[None, :, None], (32, 32, 1)).copy()
    roi = np.array([[8.0, 8.0, 22.0, 22.0]])
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(roi), 7, 1.0))[0, :, :, 0]
    bin_w = (22 - 8) / 7
    centers = 8 - 0.5 + (np.arange(7) + 0.5) * bin_w
    np.testing.assert_allclose(out[0], centers, atol=1e-5)


# ------------------------------------------------------------- detector

@pytest.mark.slow
def test_detector_smoke():
    from macaque_tpu.nn.detector import SwinMaskRCNN, DetectorConfig
    from macaque_tpu.nn.swin import SwinConfig

    cfg = DetectorConfig(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 4, 8)),
        rpn_nms_pre=50, rpn_max=50, rcnn_max=10,
    )
    model = SwinMaskRCNN(cfg)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.normal(size=(1, 128, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    boxes, scores, valid = model.apply(variables, img)
    assert boxes.shape == (10, 4)
    assert scores.shape == (10,)
    assert valid.shape == (10,)


@pytest.mark.slow
def test_detector_default_is_untruncated_mmdet_parity():
    """The DEFAULT config must feed every RPN proposal to the RoI head
    exactly like mmdet (test_cfg rpn_max=1000, ref detection config
    :175-185); RoI truncation is only the opt-in serving preset. Checked
    both as a config invariant and functionally: topk == rpn_max must be
    bit-identical to an effectively-unlimited topk."""
    from macaque_tpu.nn.detector import SwinMaskRCNN, DetectorConfig
    from macaque_tpu.nn.swin import SwinConfig

    # config invariant: no truncation by default, serving preset opts in
    d = DetectorConfig()
    assert d.rcnn_roi_topk >= d.rpn_max
    s = DetectorConfig.serving()
    assert s.rcnn_roi_topk < s.rpn_max

    kw = dict(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 4, 8)),
        rpn_nms_pre=50, rpn_max=50, rcnn_max=10,
    )
    full = SwinMaskRCNN(DetectorConfig(rcnn_roi_topk=50, **kw))
    huge = SwinMaskRCNN(DetectorConfig(rcnn_roi_topk=100000, **kw))
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.normal(size=(1, 128, 96, 3)).astype(np.float32))
    variables = full.init(jax.random.PRNGKey(1), img)
    b0, s0, v0 = full.apply(variables, img)
    b1, s1, v1 = huge.apply(variables, img)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=0,
                               atol=0)
    np.testing.assert_allclose(np.asarray(b0), np.asarray(b1), rtol=0,
                               atol=0)


@pytest.mark.slow
def test_detector_roi_chunking_exact():
    """Sequencing the windowed RoIAlign in rcnn_roi_chunk-sized pieces
    (the HBM guard that lets the parity budget 16x1000 RoIs fit v5e's
    16 GB) must reproduce the single-shot align, including the
    non-divisible padded tail. Tolerance is reduction-order noise only
    (different einsum batch shapes tile differently; <= ~5e-7 observed),
    with identical NMS survivor sets."""
    from macaque_tpu.nn.detector import SwinMaskRCNN, DetectorConfig
    from macaque_tpu.nn.swin import SwinConfig

    kw = dict(
        swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 4, 8)),
        rpn_nms_pre=50, rpn_max=50, rcnn_max=10, rcnn_roi_topk=50,
    )
    whole = SwinMaskRCNN(DetectorConfig(rcnn_roi_chunk=256, **kw))
    chunked = SwinMaskRCNN(DetectorConfig(rcnn_roi_chunk=16, **kw))

    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.normal(size=(2, 128, 96, 3)).astype(np.float32))
    variables = whole.init(jax.random.PRNGKey(2), img[:1])
    # compare the plain applies (the production detect_frames path);
    # an outer vmap would batch every matmul differently and the float
    # reassociation cascades through two discrete NMS stages
    for i in range(2):
        b0, s0, v0 = whole.apply(variables, img[i : i + 1])
        b1, s1, v1 = chunked.apply(variables, img[i : i + 1])
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(b0), np.asarray(b1),
                                   rtol=1e-5, atol=5e-4)


def test_roi_align_pyramid_matches_per_level():
    from macaque_tpu.nn.ops import roi_align, roi_align_pyramid

    rng = np.random.default_rng(8)
    feats = [jnp.asarray(rng.normal(size=(64 // (2 ** l), 48 // (2 ** l), 8))
                         .astype(np.float32)) for l in range(4)]
    strides = (4, 8, 16, 32)
    rois = jnp.asarray(rng.uniform(10, 150, (6, 2)))
    rois = jnp.concatenate([rois, rois + rng.uniform(30, 80, (6, 2))], 1)
    levels = jnp.asarray(rng.integers(0, 4, 6), jnp.int32)

    got = np.asarray(roi_align_pyramid(feats, rois, levels, 7, strides))
    for i in range(6):
        L = int(levels[i])
        want = np.asarray(
            roi_align(feats[L], rois[i:i + 1], 7, 1.0 / strides[L])
        )[0]
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_roi_align_windowed_matches_flat_gather():
    """Windowed slice+matmul RoIAlign == the flat-gather pyramid path
    (interior boxes; at map borders the windowed path follows mmcv's
    stencil clamping exactly, which the gather path only approximates)."""
    from macaque_tpu.nn.ops import roi_align_pyramid, roi_align_windowed

    rng = np.random.default_rng(9)
    B, C = 3, 8
    feats = [jnp.asarray(rng.normal(
        size=(B, 200 // (2 ** l), 152 // (2 ** l), C)).astype(np.float32))
        for l in range(4)]
    strides = (4, 8, 16, 32)
    R = 40
    # boxes sized for their level assignment (finest_scale=56 semantics):
    # extent at the assigned level stays inside the default 48px window
    # for the full RPN anchor aspect range [0.5, 2]
    scale = rng.uniform(40, 400, (B, R))
    lvl = np.clip(np.floor(np.log2(scale / 56 + 1e-6)), 0, 3).astype(np.int32)
    ar = rng.uniform(0.5, 2.0, (B, R))
    w = scale * np.sqrt(ar)
    h = scale / np.sqrt(ar)
    cx = rng.uniform(100, 500, (B, R))
    cy = rng.uniform(100, 650, (B, R))
    # keep sample stencils strictly inside every level's valid extent:
    # at the border the windowed path applies mmcv's index clamping
    # (y_low = y_high = H-1) while the gather path blends two rows —
    # a genuine semantic difference, exercised separately below
    stride_of = np.asarray(strides)[lvl].astype(np.float64)
    lo = 0.6 * stride_of          # x/stride - 0.5 >= 0
    hi_x = 608 - 0.6 * stride_of  # x/stride - 0.5 <= W_l - 1
    hi_y = 800 - 0.6 * stride_of
    rois = jnp.asarray(np.stack(
        [np.clip(cx - w / 2, lo, None), np.clip(cy - h / 2, lo, None),
         np.clip(cx + w / 2, None, hi_x), np.clip(cy + h / 2, None, hi_y)],
        axis=-1))
    levels = jnp.asarray(lvl)

    got = np.asarray(roi_align_windowed(feats, rois, levels, 7, strides))
    want = np.asarray(roi_align_pyramid(feats, rois, levels, 7, strides))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_udp_decode_matches_numpy_oracle():
    from macaque_tpu.nn.heatmap import udp_decode
    from tests.oracles import udp_decode_np

    rng = np.random.default_rng(12)
    H, W, K = 64, 48, 5
    ys, xs = np.mgrid[0:H, 0:W]
    truth = np.stack([rng.uniform(8, W - 8, K), rng.uniform(8, H - 8, K)], 1)
    hm = np.exp(-((xs[None] - truth[:, 0, None, None]) ** 2
                  + (ys[None] - truth[:, 1, None, None]) ** 2) / (2 * 4.0))
    hm += rng.uniform(0, 0.05, hm.shape)  # noise floor
    hm = hm.transpose(1, 2, 0)[None]
    want_kp, want_v = udp_decode_np(hm, input_size=(192, 256))
    got_kp, got_v = udp_decode(jnp.asarray(hm), input_size=(192, 256))
    np.testing.assert_allclose(np.asarray(got_kp), want_kp, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_v), want_v, atol=1e-6)
