"""Temporal filters: NaN interpolation, median filter, EMA, Viterbi.

TPU-native (lax.scan / static-window) replacements for the reference's
scipy/multiprocessing filters (anipose/filter_pose.py, aniposelib
medfilt/interpolate, step1 EMA smoothing).
"""

from macaque_tpu.filters.smoothing import (
    interpolate_nan,
    median_filter_1d,
    ema_smooth,
)
from macaque_tpu.filters.viterbi import viterbi_filter, viterbi_filter_joints
from macaque_tpu.filters.autoencoder import (
    train_autoencoder,
    filter_scores_autoencoder,
)

__all__ = [
    "interpolate_nan",
    "median_filter_1d",
    "ema_smooth",
    "viterbi_filter",
    "viterbi_filter_joints",
    "train_autoencoder",
    "filter_scores_autoencoder",
]
