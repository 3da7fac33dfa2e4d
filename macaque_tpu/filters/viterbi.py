"""Particle-Viterbi 2D keypoint filter as a single ``lax.scan``.

Reimplements the semantics of anipose's ``viterbi_path`` /
``filter_pose_viterbi`` (reference: src/third_party/anipose/filter_pose.py:
48-120, 151-186) without the per-joint ``multiprocessing.Pool``: particles
live in a fixed-size buffer (``n_possible * n_back + 1`` slots, the last
being the "missing" particle), the forward pass is one scan over frames, and
joints batch via ``vmap`` — so the whole filter is one XLA program per
(animal, camera) instead of a pool of processes.

Particle model (matching the reference):
  * frame i's candidates are the detections of frames i, i-1, .., i-n_back+1
    with scores discounted by 2^-j for a j-frame look-back;
  * transition log-prob between particles at distance d is
    ``log( Phi((d+2)/s) - Phi((d-2)/s) )`` clipped at -100, with a fixed
    ``log(0.001)`` for transitions to/from the missing particle;
  * emission log-prob is the discounted detection score.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm as jnorm

# Python float (not jnp) so importing this module never initializes a JAX
# backend — the driver imports the package before selecting a platform.
_MISSING_LOGP = math.log(0.001)


def _dedup_frame(points: jnp.ndarray, thres: float) -> jnp.ndarray:
    """Within-frame duplicate removal (reference ``remove_dups``,
    filter_pose.py:26-46): of any pair closer than ``thres``, NaN-out the
    higher-indexed detection. (Cross-frame pairs are impossible in the
    reference because the time axis is scaled by 100 >> thres.)"""
    P = points.shape[-2]
    if P <= 1:
        return points
    d = jnp.linalg.norm(points[..., :, None, :] - points[..., None, :, :], axis=-1)
    i_idx = jnp.arange(P)[:, None]
    j_idx = jnp.arange(P)[None, :]
    pair = (d < thres) & (i_idx < j_idx)
    pair = jnp.where(jnp.isnan(d), False, pair)
    dup = jnp.any(pair, axis=-2)  # j is a duplicate of some earlier i
    return jnp.where(dup[..., None], jnp.nan, points)


def viterbi_filter(
    points: jnp.ndarray,
    scores: jnp.ndarray,
    n_back: int = 3,
    thres_dist: float = 30.0,
    score_threshold: float = 0.3,
):
    """Filter one joint's detections over time.

    points: (T, P, 2) candidate positions (NaN = missing)
    scores: (T, P) detection scores
    Returns (points_new (T, 2), scores_new (T,)).
    """
    T, P, _ = points.shape
    pts = jnp.where((scores < score_threshold)[..., None], jnp.nan, points)
    pts = _dedup_frame(pts, thres=5.0)
    valid = ~jnp.isnan(pts[..., 0])  # (T, P)

    n_slots = P * n_back + 1

    # Build per-frame particle tensors: positions (T, n_slots, 2),
    # log-scores (T, n_slots) with -inf for inactive slots.
    pos_list, logp_list, active_list = [], [], []
    for j in range(n_back):
        shifted_pts = jnp.roll(pts, j, axis=0)
        shifted_valid = jnp.roll(valid, j, axis=0)
        shifted_scores = jnp.roll(scores, j, axis=0)
        in_range = (jnp.arange(T) - j >= 0)[:, None]
        act = shifted_valid & in_range
        pos_list.append(jnp.where(act[..., None], shifted_pts, 0.0))
        logp_list.append(
            jnp.where(act, jnp.log(jnp.maximum(shifted_scores, 1e-30)) + jnp.log(2.0) * (-j), -jnp.inf)
        )
        active_list.append(act)

    pos = jnp.concatenate(pos_list, axis=1)          # (T, P*n_back, 2)
    logp = jnp.concatenate(logp_list, axis=1)        # (T, P*n_back)
    active = jnp.concatenate(active_list, axis=1)    # (T, P*n_back)

    none_active = ~jnp.any(active, axis=1)           # (T,)
    miss_pos = jnp.broadcast_to(jnp.array([-1.0, -1.0]), (T, 1, 2))
    miss_logp = jnp.where(none_active, _MISSING_LOGP, -jnp.inf)[:, None]
    pos = jnp.concatenate([pos, miss_pos], axis=1)       # (T, n_slots, 2)
    logp = jnp.concatenate([logp, miss_logp], axis=1)    # (T, n_slots)
    is_missing = jnp.concatenate(
        [jnp.zeros((T, P * n_back), bool), none_active[:, None]], axis=1
    )

    sigma = thres_dist

    def trans_logprob(pa, miss_a, pb, miss_b):
        # (n_slots_a, 2) x (n_slots_b, 2) -> (n_slots_b, n_slots_a)
        d = jnp.linalg.norm(pa[None, :, :] - pb[:, None, :], axis=-1)
        hi = jnorm.logcdf((d + 2.0) / sigma)
        lo = jnorm.logcdf((d - 2.0) / sigma)
        # log(exp(hi) - exp(lo)) = hi + log(-expm1(lo - hi)); expm1 keeps
        # precision when hi ~ lo (far particles), where naive log1p(-exp(..))
        # cancels to -inf long before the reference's -100 clip kicks in.
        diff = -jnp.expm1(lo - hi)
        lp = hi + jnp.log(jnp.maximum(diff, 1e-45))
        lp = jnp.maximum(lp, -100.0)
        lp = jnp.where(miss_b[:, None] | miss_a[None, :], _MISSING_LOGP, lp)
        return lp

    def step(carry, inp):
        prev_lp = carry  # (n_slots,)
        pos_i, logp_i, miss_i, pos_prev, miss_prev = inp
        P_trans = trans_logprob(pos_prev, miss_prev, pos_i, miss_i)
        possible = prev_lp[None, :] + P_trans        # (n_slots_b, n_slots_a)
        best = jnp.max(possible, axis=1) + logp_i
        back = jnp.argmax(possible, axis=1)
        return best, (best, back)

    init_lp = logp[0]
    inputs = (pos[1:], logp[1:], is_missing[1:], pos[:-1], is_missing[:-1])
    _, (lps, backs) = jax.lax.scan(step, init_lp, inputs)
    # lps: (T-1, n_slots); backs: (T-1, n_slots)

    last = jnp.argmax(lps[-1]) if T > 1 else jnp.argmax(init_lp)

    def back_step(nxt, back_row):
        cur = back_row[nxt]
        return cur, cur

    _, path_rev = jax.lax.scan(back_step, last, backs, reverse=True)
    path = jnp.concatenate([path_rev, jnp.array([last])])  # (T,)

    t_idx = jnp.arange(T)
    out_pos = pos[t_idx, path]
    raw_score = jnp.exp(logp)  # undo log; discounted scores
    out_score = raw_score[t_idx, path]
    out_score = jnp.where(is_missing[t_idx, path], 0.001, out_score)
    return out_pos, out_score


def viterbi_filter_joints(
    points: jnp.ndarray,
    scores: jnp.ndarray,
    n_back: int = 3,
    thres_dist: float = 30.0,
    score_threshold: float = 0.3,
):
    """vmap of :func:`viterbi_filter` over the joint axis.

    points: (T, J, P, 2); scores: (T, J, P).
    Returns (points (T, J, 2), scores (T, J)) — the TPU-native equivalent of
    ``filter_pose_viterbi``'s process pool (reference:
    filter_pose.py:151-186).
    """
    pts = jnp.moveaxis(points, 1, 0)  # (J, T, P, 2)
    scs = jnp.moveaxis(scores, 1, 0)
    f = jax.vmap(
        lambda p, s: viterbi_filter(p, s, n_back, thres_dist, score_threshold)
    )
    out_pos, out_score = f(pts, scs)
    return jnp.moveaxis(out_pos, 0, 1), jnp.moveaxis(out_score, 0, 1)
