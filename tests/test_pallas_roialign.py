"""Differential test: fused Pallas windowed RoIAlign vs the XLA
slice+einsum path (ops.roi_align_windowed) — identical geometry by
construction (shared _roi_window_geometry), so outputs must agree to
matmul-reassociation tolerance.

Runs the kernel in interpreter mode (CPU test host); the real-TPU
timing lives in the detector chunk benchmarks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macaque_tpu.nn.ops import roi_align_windowed
from macaque_tpu.nn.pallas_roialign import (
    WINDOW_BUCKETS,
    roi_align_windowed_fused,
    roi_align_windowed_switch,
    roi_window_buckets,
)


def _make_case(seed, B=2, R=10, C=128, H0=32, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    strides = (4, 8, 16, 32)
    feats = [
        jnp.asarray(rng.normal(0, 1, (B, H0 // (1 << l), H0 // (1 << l), C)
                               ).astype(np.float32), dtype=dtype)
        for l in range(4)
    ]
    img = H0 * strides[0]
    # boxes spanning all levels, some tiny / near borders
    x1 = rng.uniform(0, img * 0.8, (B, R))
    y1 = rng.uniform(0, img * 0.8, (B, R))
    w = rng.uniform(2, img * 0.5, (B, R))
    h = rng.uniform(2, img * 0.5, (B, R))
    rois = jnp.asarray(
        np.stack([x1, y1, np.minimum(x1 + w, img), np.minimum(y1 + h, img)],
                 axis=-1).astype(np.float32))
    scale = np.sqrt(np.maximum(w, 0) * np.maximum(h, 0))
    lvl = np.clip(np.floor(np.log2(scale / 56.0 + 1e-6)), 0, 3)
    levels = jnp.asarray(lvl.astype(np.int32))
    return feats, rois, levels, strides


class TestFusedRoIAlign:
    @pytest.mark.parametrize("group", [1, 4])
    def test_matches_xla_path_f32(self, group):
        feats, rois, levels, strides = _make_case(0)
        ref = roi_align_windowed(feats, rois, levels, 7, strides)
        got = roi_align_windowed_fused(
            feats, rois, levels, 7, strides, group=group, interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_matches_xla_path_bf16(self):
        feats, rois, levels, strides = _make_case(1, dtype=jnp.bfloat16)
        ref = roi_align_windowed(feats, rois, levels, 7, strides)
        got = roi_align_windowed_fused(
            feats, rois, levels, 7, strides, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)

    def test_nondivisible_group_padding(self):
        # N = B*R = 2*10 = 20, group 8 -> padded to 24; pad lanes must
        # not contaminate real outputs
        feats, rois, levels, strides = _make_case(2)
        ref = roi_align_windowed(feats, rois, levels, 7, strides)
        got = roi_align_windowed_fused(
            feats, rois, levels, 7, strides, group=8, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def _adversarial_case(seed, B=2, R=24, C=128, H0=64):
    """Boxes engineered to hit every bucket: sub-56px-scale boxes
    (bucket 16), level-boundary near-square boxes, aspect-2 boxes at a
    level's top scale (bucket 48's reason to exist), aspect-4 overflow
    boxes (clamped even at 48), border boxes, and degenerate zero boxes
    (the chunk-padding case)."""
    rng = np.random.default_rng(seed)
    strides = (4, 8, 16, 32)
    feats = [
        jnp.asarray(rng.normal(0, 1, (B, H0 // (1 << l), H0 // (1 << l), C)
                               ).astype(np.float32))
        for l in range(4)
    ]
    img = H0 * strides[0]
    boxes = []
    for _ in range(B):
        rows = []
        for i in range(R):
            kind = i % 6
            if kind == 0:       # tiny: scale < 56 -> level 0, extent < 14
                w = h = rng.uniform(8, 40)
            elif kind == 1:     # near-square at a level boundary
                w = h = rng.uniform(100, 112)
            elif kind == 2:     # aspect 2 at top-of-level scale
                h = rng.uniform(70, 79)
                w = 2 * h
            elif kind == 3:     # aspect 4: overflows every window
                h = rng.uniform(40, 50)
                w = 4 * h
            elif kind == 4:     # border-clipped
                w = h = rng.uniform(60, 120)
            else:               # degenerate zero box (chunk padding)
                rows.append((0.0, 0.0, 0.0, 0.0))
                continue
            x1 = rng.uniform(-10, img - 10)
            y1 = rng.uniform(-10, img - 10)
            rows.append((max(x1, 0), max(y1, 0),
                         min(x1 + w, img), min(y1 + h, img)))
        boxes.append(rows)
    rois = jnp.asarray(np.asarray(boxes, np.float32))
    wh = np.maximum(np.asarray(rois)[..., 2:] - np.asarray(rois)[..., :2], 0)
    scale = np.sqrt(wh[..., 0] * wh[..., 1])
    lvl = np.clip(np.floor(np.log2(scale / 56.0 + 1e-6)), 0, 3)
    levels = jnp.asarray(lvl.astype(np.int32))
    return feats, rois, levels, strides


class TestAdaptiveWindows:
    def test_buckets_cover_expected_shapes(self):
        feats, rois, levels, strides = _adversarial_case(0)
        idx = np.asarray(roi_window_buckets(feats, rois, levels, 7, strides))
        # tiny boxes (both extents) land in the smallest bucket, zero
        # boxes (chunk padding) too
        tiny = ((rois[..., 2] - rois[..., 0] < 45)
                & (rois[..., 3] - rois[..., 1] < 45))
        assert idx[np.asarray(tiny)].max() == 0
        # something must need the largest bucket (aspect-2 top-of-level)
        assert idx.max() == len(WINDOW_BUCKETS) - 1

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_switch_equals_fixed_window(self, seed):
        """The adaptive path gated on the per-call max bucket must equal
        the fixed worst-case window exactly (the bucket selector only
        assigns a smaller window when coverage provably matches)."""
        feats, rois, levels, strides = _adversarial_case(seed)
        ref = roi_align_windowed_fused(
            feats, rois, levels, 7, strides, interpret=True)
        need = roi_window_buckets(feats, rois, levels, 7, strides)
        got = roi_align_windowed_switch(
            feats, rois, levels, 7, strides, need.max(), interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_each_bucket_exact_for_its_rois(self):
        """Per-RoI guarantee: running EVERY RoI at its own assigned
        bucket (not just the call max) matches the fixed window."""
        feats, rois, levels, strides = _adversarial_case(3)
        ref = roi_align_windowed_fused(
            feats, rois, levels, 7, strides, interpret=True)
        need = np.asarray(
            roi_window_buckets(feats, rois, levels, 7, strides))
        for i, w in enumerate(WINDOW_BUCKETS[:-1]):
            sel = need == i
            if not sel.any():
                continue
            got = roi_align_windowed_fused(
                feats, rois, levels, 7, strides, window=w, interpret=True)
            np.testing.assert_allclose(
                np.asarray(got)[sel], np.asarray(ref)[sel],
                rtol=1e-5, atol=1e-6,
                err_msg=f"bucket {w} not exact for its RoIs")

    def test_prebuilt_canvas_matches(self):
        """canvas= (hoisted out of chunk loops by the detector) must be
        exactly the internally-built canvas path."""
        from macaque_tpu.nn.ops import _roi_level_canvas
        from macaque_tpu.nn.pallas_roialign import _ALIGN

        feats, rois, levels, strides = _adversarial_case(4)
        ref = roi_align_windowed_fused(
            feats, rois, levels, 7, strides, interpret=True)
        canvas = _roi_level_canvas(feats, pad_x=_ALIGN)
        got = roi_align_windowed_fused(
            feats, rois, levels, 7, strides, interpret=True, canvas=canvas)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    @pytest.mark.slow  # ~2 min: full detect twice, Pallas interpret mode
    def test_detector_adaptive_path_matches_xla(self):
        """Full detect with roialign_impl='pallas' (adaptive windows +
        RoI sort + chunked lax.switch, interpret mode on CPU) against
        the XLA path: same boxes/scores up to RoI-order permutation."""
        import jax

        from macaque_tpu.nn.detector import DetectorConfig, SwinMaskRCNN
        from macaque_tpu.nn.swin import SwinConfig

        cfg_kw = dict(
            swin=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                            num_heads=(1, 2, 4, 8)),
            rpn_nms_pre=16, rpn_max=16, rcnn_max=8,
            rcnn_roi_topk=16, rcnn_roi_chunk=4,   # 4 chunks -> sorted map
        )
        imgs = jnp.asarray(np.random.default_rng(0).normal(
            0, 1, (2, 96, 96, 3)).astype(np.float32))
        outs = {}
        for impl in ("xla", "pallas"):
            model = SwinMaskRCNN(DetectorConfig(roialign_impl=impl,
                                                **cfg_kw))
            variables = model.init(jax.random.PRNGKey(0), imgs[:1])
            outs[impl] = model.apply(variables, imgs)
        for a, b in zip(outs["xla"], outs["pallas"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
