"""Differential golden test: the REFERENCE's own anipose 2D medfilt
filter (/root/reference/src/third_party/anipose/filter_pose.py:213
``filter_pose_medfilt`` — scipy medfilt + offset/score thresholds +
spline/linear gap interpolation) against this repo's
``filters.smoothing.filter_pose_medfilt_2d`` on identical candidate
arrays. The Viterbi filter is already differentially pinned through the
reference's step4 (tests/test_golden_step4.py); this closes the medfilt
branch of anipose's filter_pose surface.
"""

import sys

import numpy as np
import pytest

from macaque_tpu.filters.smoothing import filter_pose_medfilt_2d

F, J, P = 120, 5, 3


def _import_reference_filter_pose():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests.oracles import (
        install_cv2_omnidir_shim, install_numba_shim, install_toml_shim,
    )

    install_numba_shim()
    install_toml_shim()
    install_cv2_omnidir_shim()
    # anipose/common.py imports `aniposelib` absolutely
    if "aniposelib" not in sys.modules:
        from src.third_party import aniposelib as _al

        sys.modules["aniposelib"] = _al
    import src.third_party.anipose.filter_pose as ref_fp

    return ref_fp


def _candidates(seed=0):
    """Smooth trajectories + spike outliers + low-score runs + NaN-able
    gaps in candidate 0; candidates 1.. are decoys both filters ignore."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 2 * np.pi, F)
    pts = np.full((F, J, P, 3), np.nan)
    for j in range(J):
        x = 900 + 300 * np.cos(t * (1 + 0.2 * j)) + rng.normal(0, 1.5, F)
        y = 700 + 250 * np.sin(t * (1.3 + 0.1 * j)) + rng.normal(0, 1.5, F)
        s = rng.uniform(0.4, 0.99, F)
        spikes = rng.random(F) < 0.06
        x = np.where(spikes, x + rng.uniform(60, 200, F), x)
        low = rng.random(F) < 0.08
        s = np.where(low, rng.uniform(0.0, 0.04, F), s)
        pts[:, j, 0, 0], pts[:, j, 0, 1], pts[:, j, 0, 2] = x, y, s
        pts[:, j, 1:, :2] = rng.uniform(0, 2000, (F, P - 1, 2))
        pts[:, j, 1:, 2] = rng.uniform(0, 1, (F, P - 1))
    # joint 4: >50% removed -> neither side may interpolate it
    pts[: F // 2 + 10, 4, 0, 2] = 0.0
    return pts


@pytest.mark.parametrize("spline", [True, False])
def test_golden_medfilt(spline):
    ref_fp = _import_reference_filter_pose()
    pts = _candidates()
    config = {"filter": {
        "medfilt": 13, "offset_threshold": 25,
        "score_threshold": 0.05, "spline": spline,
    }}
    bodyparts = [f"bp{j}" for j in range(J)]

    p_ref, s_ref = ref_fp.filter_pose_medfilt(config, pts, bodyparts)
    p_our, s_our = filter_pose_medfilt_2d(
        pts, kernel_size=13, offset_threshold=25,
        score_threshold=0.05, spline=spline)

    assert np.array_equal(np.isnan(p_ref), np.isnan(p_our))
    # the starved joint (<50% valid) is never interpolated: its removed
    # prefix stays NaN on both sides
    assert np.isnan(p_ref[: F // 2 + 10, 4]).all()
    np.testing.assert_allclose(np.nan_to_num(p_our), np.nan_to_num(p_ref),
                               atol=1e-9)
    np.testing.assert_allclose(s_our, s_ref, atol=0)
    # the filter actually did something: spikes were removed/replaced
    assert not np.allclose(np.nan_to_num(p_ref[:, 0, 0]), pts[:, 0, 0, 0])
