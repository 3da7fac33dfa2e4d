"""NaN-aware temporal smoothing primitives, static shapes only.

Replacements for ``interpolate_data`` / ``medfilt_data``
(reference: src/third_party/aniposelib/cameras.py:129-145) and the per-track
EMA keypoint smoothing of step1 (reference:
src/pipeline/step1_proc2d.py:319-342) — expressed as scans/windows so they
vmap over joints/coords/animals and fuse on the TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interpolate_nan(x: jnp.ndarray) -> jnp.ndarray:
    """Linearly interpolate NaN runs in a 1-D series (np.interp semantics:
    ends are extended with the nearest valid value). All-NaN input -> zeros
    (reference: cameras.py:138-145).

    Static-shape algorithm: forward scan carries (last valid value, index),
    backward scan carries (next valid value, index); blend linearly.
    """
    n = x.shape[0]
    idx = jnp.arange(n)
    valid = ~jnp.isnan(x)

    def fwd(carry, inp):
        v, i = carry
        xv, ii, ok = inp
        v = jnp.where(ok, xv, v)
        i = jnp.where(ok, ii, i)
        return (v, i), (v, i)

    (_, _), (fv, fi) = jax.lax.scan(fwd, (jnp.nan, -1), (x, idx, valid))

    def bwd(carry, inp):
        v, i = carry
        xv, ii, ok = inp
        v = jnp.where(ok, xv, v)
        i = jnp.where(ok, ii, i)
        return (v, i), (v, i)

    (_, _), (bv, bi) = jax.lax.scan(bwd, (jnp.nan, n), (x, idx, valid), reverse=True)

    has_prev = fi >= 0
    has_next = bi < n
    t = jnp.where(
        (bi - fi) > 0, (idx - fi) / jnp.maximum(bi - fi, 1), 0.0
    )
    interp = fv + t * (bv - fv)
    out = jnp.where(valid, x, jnp.where(
        has_prev & has_next, interp,
        jnp.where(has_prev, fv, jnp.where(has_next, bv, 0.0)),
    ))
    return jnp.where(jnp.any(valid), out, jnp.zeros_like(x))


def median_filter_1d(x: jnp.ndarray, size: int = 7) -> jnp.ndarray:
    """Median filter with reflect padding (reference: cameras.py:129-133
    semantics within the cropped region)."""
    half = size // 2
    xp = jnp.pad(x, (half, half), mode="reflect")
    windows = jnp.stack([xp[i : i + x.shape[0]] for i in range(size)], axis=-1)
    return jnp.median(windows, axis=-1)


def filter_pose_medfilt_2d(
    points,
    kernel_size: int = 13,
    offset_threshold: float = 25.0,
    score_threshold: float = 0.05,
    spline: bool = True,
):
    """anipose's medfilt 2D pose filter (reference:
    src/third_party/anipose/filter_pose.py:213-261), assembled from the
    same steps: per-joint median filter of candidate 0, outlier removal
    by median-offset and score thresholds, then gap interpolation
    (cubic interpolating spline, or linear when ``spline=False``) for
    joints missing in <50% of frames with >5 valid samples.

    This is a host-side data-cleaning utility (the device path filters
    with the Viterbi scan in filters/viterbi.py, the pipeline default);
    it runs once per session on small arrays, so it is plain NumPy.

    points: (F, J, P, 3) [x, y, score] candidate array.
    Returns (points (F, J, 2) — NaN where removed and not interpolable,
    scores (F, J)).
    """
    import numpy as np

    points = np.asarray(points, float)
    F, J, P, _ = points.shape
    out = np.full((F, J, 2), np.nan)
    half = kernel_size // 2

    def medfilt_zero(x):
        # scipy.signal.medfilt semantics: ZERO padding at the edges
        xp = np.concatenate([np.zeros(half), x, np.zeros(half)])
        win = np.lib.stride_tricks.sliding_window_view(xp, kernel_size)
        return np.median(win, axis=-1)

    for j in range(J):
        x = points[:, j, 0, 0]
        y = points[:, j, 0, 1]
        score = points[:, j, 0, 2]
        err = np.abs(x - medfilt_zero(x)) + np.abs(y - medfilt_zero(y))
        bad = (err >= offset_threshold) | (score < score_threshold)
        Xf = np.stack([x, y], axis=1)
        Xf[bad] = np.nan
        for i in range(2):
            vals = Xf[:, i].copy()
            nans = np.isnan(vals)
            ix = np.flatnonzero(~nans)
            if nans.sum() > 0 and (~nans).mean() > 0.5 and len(ix) > 5:
                if spline:
                    from scipy.interpolate import splev, splrep

                    tck = splrep(ix, vals[ix], k=3, s=0)
                    vals[nans] = splev(np.flatnonzero(nans), tck)
                else:
                    vals[nans] = np.interp(
                        np.flatnonzero(nans), ix, vals[ix])
            out[:, j, i] = vals
    return out, points[:, :, 0, 2]


def ema_smooth(
    kp: jnp.ndarray,
    alpha: float = 0.5,
    disp_thr: float = 20.0,
) -> jnp.ndarray:
    """Per-joint EMA over time with a displacement gate.

    kp: (T, J, 3) [x, y, score]; NaN x/y marks missing joints.
    Where both previous (smoothed) and current are valid and the raw
    displacement is under ``disp_thr``, blend
    ``alpha * prev + (1 - alpha) * current``; otherwise pass through.

    Matches the semantics of step1's deque-based smoother (reference:
    step1_proc2d.py:319-342): the "previous" frame is the previous *smoothed*
    output for the same track, and the displacement test uses the raw current
    vs previous smoothed positions.
    """
    xy = kp[..., :2]
    score = kp[..., 2:]

    def step(prev_xy, cur_xy):
        valid_both = ~(jnp.isnan(prev_xy[..., 0]) | jnp.isnan(cur_xy[..., 0]))
        disp = jnp.linalg.norm(
            jnp.nan_to_num(cur_xy - prev_xy), axis=-1
        )
        blend = valid_both & (disp < disp_thr)
        out = jnp.where(
            blend[..., None], alpha * prev_xy + (1 - alpha) * cur_xy, cur_xy
        )
        return out, out

    _, smoothed = jax.lax.scan(step, xy[0], xy[1:])
    smoothed = jnp.concatenate([xy[:1], smoothed], axis=0)
    return jnp.concatenate([smoothed, score], axis=-1)
