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
from macaque_tpu.nn.pallas_roialign import roi_align_windowed_fused


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
