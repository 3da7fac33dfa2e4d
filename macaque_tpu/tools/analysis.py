"""Post-hoc analysis over kp3d results: trajectories, inter-animal
proximity, joint-length statistics.

Covers the analysis surface of the reference's notebooks
(analysis_plots.ipynb trajectory/proximity plots,
bbox_optimisation_algorithm.ipynb joint-length stats) as library
functions.
"""

from __future__ import annotations

import numpy as np


def trajectories(kp3d: np.ndarray) -> np.ndarray:
    """(A, T, J, 3) -> (A, T, 3) body-centre trajectories (median joints)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        return np.nanmedian(kp3d, axis=2)


def pairwise_proximity(kp3d: np.ndarray) -> np.ndarray:
    """(A, T, J, 3) -> (A, A, T) inter-animal centre distances (mm)."""
    c = trajectories(kp3d)
    return np.linalg.norm(c[:, None] - c[None, :], axis=-1)


def proximity_events(kp3d: np.ndarray, threshold_mm: float = 500.0):
    """Frames where animal pairs are closer than ``threshold_mm``.
    Returns dict (a, b) -> bool array (T,)."""
    d = pairwise_proximity(kp3d)
    A = d.shape[0]
    return {
        (a, b): d[a, b] < threshold_mm
        for a in range(A) for b in range(a + 1, A)
    }


def joint_length_stats(kp3d: np.ndarray, constraints) -> dict:
    """Per-constraint bone-length median/MAD over animals and time
    (feeds the fixed-joint-length mode, reference step4:179-183)."""
    out = {}
    for (a, b) in constraints:
        seg = kp3d[:, :, a] - kp3d[:, :, b]
        lengths = np.linalg.norm(seg, axis=-1).ravel()
        lengths = lengths[~np.isnan(lengths)]
        med = float(np.median(lengths)) if lengths.size else float("nan")
        mad = float(np.median(np.abs(lengths - med))) if lengths.size else float("nan")
        out[(a, b)] = {"median": med, "mad": mad, "n": int(lengths.size)}
    return out


def speed(kp3d: np.ndarray, fps: float = 24.0) -> np.ndarray:
    """(A, T, J, 3) -> (A, T-1) centre speed in mm/s."""
    c = trajectories(kp3d)
    return np.linalg.norm(np.diff(c, axis=1), axis=-1) * fps
