"""Joint-angle computation and 3D post-filters.

Covers the anipose CLI analysis surface the reference vendors
(src/third_party/anipose/compute_angles.py, filter_3d.py): joint angles
from bodypart triplets and median-filter-based 3D smoothing with
error-threshold gating — vectorized over animals/frames.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from macaque_tpu.core.config import MACAQUE_BODYPARTS

# default angle triplets (vertex at the middle bodypart)
DEFAULT_ANGLES = {
    "left_elbow": ("left_shoulder", "left_elbow", "left_wrist"),
    "right_elbow": ("right_shoulder", "right_elbow", "right_wrist"),
    "left_knee": ("left_hip", "left_knee", "left_ankle"),
    "right_knee": ("right_hip", "right_knee", "right_ankle"),
    "left_shoulder": ("left_elbow", "left_shoulder", "left_hip"),
    "right_shoulder": ("right_elbow", "right_shoulder", "right_hip"),
    "left_hip": ("left_shoulder", "left_hip", "left_knee"),
    "right_hip": ("right_shoulder", "right_hip", "right_knee"),
}


def compute_angles(
    kp3d: np.ndarray,
    angles: dict | None = None,
    bodyparts: Sequence[str] = tuple(MACAQUE_BODYPARTS),
) -> dict:
    """(..., J, 3) -> {name: (...,) angle in degrees at the vertex}."""
    angles = angles or DEFAULT_ANGLES
    idx = {b: i for i, b in enumerate(bodyparts)}
    out = {}
    for name, (a, b, c) in angles.items():
        va = kp3d[..., idx[a], :] - kp3d[..., idx[b], :]
        vc = kp3d[..., idx[c], :] - kp3d[..., idx[b], :]
        cos = np.sum(va * vc, axis=-1) / (
            np.linalg.norm(va, axis=-1) * np.linalg.norm(vc, axis=-1) + 1e-12
        )
        out[name] = np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))
    return out


def filter_3d_medfilt(
    kp3d: np.ndarray,
    errors: np.ndarray | None = None,
    error_threshold: float = 15.0,
    size: int = 15,
    max_nan_frac: float = 0.85,
) -> np.ndarray:
    """Median-filter 3D trajectories over time, NaN-ing high-error frames
    first (reference filter_3d.py:14-43 semantics: interpolate, medfilt
    kernel 15 with median padding, skip series that are mostly NaN).

    kp3d (..., T, J, 3) with time on axis -3."""
    from scipy import signal

    out = np.array(kp3d, float)
    if errors is not None:
        bad = np.nan_to_num(errors, nan=1e5) > error_threshold
        out[bad] = np.nan

    flat = out.reshape(-1, *out.shape[-3:])
    padsize = size + 5
    for b in range(flat.shape[0]):
        for j in range(flat.shape[-2]):
            for c in range(3):
                v = flat[b, :, j, c]
                nans = np.isnan(v)
                if nans.mean() > max_nan_frac:
                    continue
                t = np.arange(v.shape[0])
                vi = v.copy()
                vi[nans] = np.interp(t[nans], t[~nans], v[~nans])
                vp = np.pad(vi, (padsize, padsize), mode="median",
                            stat_length=5)
                flat[b, :, j, c] = signal.medfilt(vp, size)[padsize:-padsize]
    return flat.reshape(out.shape)
