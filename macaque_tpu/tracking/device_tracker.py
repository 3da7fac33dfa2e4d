"""Fully on-device multi-object tracker: BoT-SORT association as one
``lax.scan`` over a frame chunk.

The chunked host tracker (tracking/botsort.py) already avoids per-frame
device sync; this variant removes the host from the loop entirely — a
fixed-capacity track table (means, covariances, states) is the scan
carry, association uses the JAX Jonker-Volgenant assignment, and a whole
chunk of detections is tracked in a single device program. Semantics
match the host tracker (two-stage ByteTrack association, unconfirmed
births, track buffer) and are parity-tested against it.

Table layout (capacity K):
  mean (K, 8), cov (K, 8, 8), tid (K,), state (K,) in
  {0 empty, 1 tracked, 2 lost, 3 unconfirmed}, lost_frames (K,),
  next_id scalar.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from macaque_tpu.tracking.kalman import kalman_predict_jax, kalman_update_jax
from macaque_tpu.tracking.hungarian import hungarian_jax
from macaque_tpu.nn.ops import bbox_iou

EMPTY, TRACKED, LOST, UNCONFIRMED = 0, 1, 2, 3


class TrackTable(NamedTuple):
    mean: jnp.ndarray          # (K, 8)
    cov: jnp.ndarray           # (K, 8, 8)
    tid: jnp.ndarray           # (K,)
    state: jnp.ndarray         # (K,)
    lost_frames: jnp.ndarray   # (K,)
    next_id: jnp.ndarray       # ()
    frame: jnp.ndarray         # ()


def make_table(capacity: int = 16) -> TrackTable:
    return TrackTable(
        mean=jnp.zeros((capacity, 8)),
        cov=jnp.tile(jnp.eye(8), (capacity, 1, 1)),
        tid=jnp.full((capacity,), -1, jnp.int32),
        state=jnp.zeros((capacity,), jnp.int32),
        lost_frames=jnp.zeros((capacity,), jnp.int32),
        next_id=jnp.int32(1),
        frame=jnp.int32(0),
    )


def _xyxy_to_cxcywh(b):
    return jnp.stack([
        (b[..., 0] + b[..., 2]) / 2, (b[..., 1] + b[..., 3]) / 2,
        b[..., 2] - b[..., 0], b[..., 3] - b[..., 1],
    ], axis=-1)


def _cxcywh_to_xyxy(m):
    cx, cy, w, h = m[..., 0], m[..., 1], m[..., 2], m[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1)


def _associate(track_boxes, track_ok, det_boxes, det_scores, det_ok,
               thresh, proximity, fuse):
    """Hungarian matching on (1 - fused IoU) with gating.

    Returns det4track (K,) int — detection index matched to each track
    slot, -1 if unmatched."""
    K = track_boxes.shape[0]
    D = det_boxes.shape[0]
    iou = bbox_iou(track_boxes, det_boxes)
    sim = jnp.where(iou >= proximity, iou, 0.0)
    if fuse:
        sim = sim * det_scores[None, :]
    cost = 1.0 - sim
    BIG = 10.0
    cost = jnp.where(track_ok[:, None] & det_ok[None, :], cost, BIG)
    # pad rows<=cols for JV: K x (D + K) with dummy columns
    pad = jnp.full((K, K), BIG + 1.0)
    col4row = hungarian_jax(jnp.concatenate([cost, pad], axis=1))
    matched = (col4row < D) & track_ok
    gate = jnp.take_along_axis(
        jnp.concatenate([cost, pad], axis=1), col4row[:, None], axis=1
    )[:, 0] <= thresh
    det4track = jnp.where(matched & gate, col4row, -1)
    return det4track


@partial(jax.jit, static_argnames=(
    "high_thresh", "low_thresh", "new_thresh", "match_thresh",
    "track_buffer", "proximity"))
def track_chunk_device(
    table: TrackTable,
    boxes: jnp.ndarray,    # (T, D, 4) xyxy
    scores: jnp.ndarray,   # (T, D)
    high_thresh: float = 0.85,
    low_thresh: float = 0.10,
    new_thresh: float = 0.85,
    match_thresh: float = 0.80,
    track_buffer: int = 72,
    proximity: float = 0.5,
):
    """Track a chunk of frames on device.

    Returns (table', out_boxes (T, K, 4), out_tids (T, K) with -1 for
    inactive slots)."""
    K = table.mean.shape[0]

    def step(tb: TrackTable, inp):
        det_boxes, det_scores = inp
        D = det_boxes.shape[0]
        high = det_scores >= high_thresh
        low = (det_scores > low_thresh) & ~high

        active = tb.state != EMPTY
        activated = (tb.state == TRACKED) | (tb.state == LOST)

        # predict activated tracks (lost tracks freeze w/h velocity)
        mean = tb.mean
        mean = mean.at[:, 6:8].set(
            jnp.where((tb.state != TRACKED)[:, None], 0.0, mean[:, 6:8])
        )
        pm, pc = kalman_predict_jax(mean, tb.cov)
        mean = jnp.where(activated[:, None], pm, tb.mean)
        cov = jnp.where(activated[:, None, None], pc, tb.cov)

        tboxes = _cxcywh_to_xyxy(mean[:, :4])

        # stage 1: high dets vs activated tracks
        d1 = _associate(tboxes, activated, det_boxes, det_scores, high,
                        match_thresh, proximity, True)
        # stage 2: low dets vs remaining tracked-state tracks
        rem = activated & (d1 < 0) & (tb.state == TRACKED)
        d2 = _associate(tboxes, rem, det_boxes, det_scores, low,
                        0.5, proximity, False)
        # stage 3: leftover high dets vs unconfirmed tracks
        def mark_taken(taken, d4t):
            # scatter True at matched det indices; unmatched rows write
            # out-of-bounds and are dropped
            idx = jnp.where(d4t >= 0, d4t, D)
            return taken.at[idx].set(True, mode="drop")

        det_taken = mark_taken(jnp.zeros((D,), bool), d1)
        det_taken = mark_taken(det_taken, d2)
        unconf = tb.state == UNCONFIRMED
        d3 = _associate(tboxes, unconf, det_boxes, det_scores,
                        high & ~det_taken, 0.7, proximity, True)
        det4track = jnp.where(d1 >= 0, d1, jnp.where(d2 >= 0, d2, d3))
        det_taken = mark_taken(det_taken, d3)

        # KF update for matched slots
        meas = _xyxy_to_cxcywh(det_boxes[jnp.maximum(det4track, 0)])
        um, uc = kalman_update_jax(mean, cov, meas)
        got = det4track >= 0
        mean = jnp.where(got[:, None], um, mean)
        cov = jnp.where(got[:, None, None], uc, cov)

        state = tb.state
        lost_frames = jnp.where(got, 0, tb.lost_frames)
        state = jnp.where(got, TRACKED, state)
        # unmatched: activated -> lost (+1), unconfirmed -> removed
        newly_lost = activated & ~got
        state = jnp.where(newly_lost, LOST, state)
        lost_frames = jnp.where(newly_lost, tb.lost_frames + 1, lost_frames)
        state = jnp.where(unconf & ~got, EMPTY, state)
        # expire
        state = jnp.where(lost_frames > track_buffer, EMPTY, state)

        # births: unmatched high dets above new_thresh claim empty slots
        birth_det = high & ~det_taken & (det_scores >= new_thresh)
        empty_slots = state == EMPTY
        # rank dets and slots; pair k-th birth with k-th empty slot
        det_rank = jnp.cumsum(birth_det) - 1          # (D,)
        slot_rank = jnp.cumsum(empty_slots) - 1        # (K,)
        n_births = jnp.sum(birth_det)

        # slot s takes det d where slot_rank[s] == det_rank[d]
        def birth_for_slot(s_rank, is_empty):
            want = (det_rank == s_rank) & birth_det
            idx = jnp.argmax(want)
            ok = is_empty & (s_rank < n_births) & jnp.any(want)
            return jnp.where(ok, idx, -1)

        bidx = jax.vmap(birth_for_slot)(slot_rank, empty_slots)
        born = bidx >= 0
        bm = _xyxy_to_cxcywh(det_boxes[jnp.maximum(bidx, 0)])
        init_mean = jnp.zeros((K, 8)).at[:, :4].set(bm)
        w = bm[:, 2]
        h = bm[:, 3]
        stds = jnp.stack([
            2 / 20 * w, 2 / 20 * h, 2 / 20 * w, 2 / 20 * h,
            10 / 160 * w, 10 / 160 * h, 10 / 160 * w, 10 / 160 * h,
        ], axis=-1)
        init_cov = jnp.einsum("ki,ij->kij", stds ** 2, jnp.eye(8))
        mean = jnp.where(born[:, None], init_mean, mean)
        cov = jnp.where(born[:, None, None], init_cov, cov)
        first_frame = tb.frame == 0
        state = jnp.where(
            born, jnp.where(first_frame, TRACKED, UNCONFIRMED), state
        )
        new_ids = tb.next_id + slot_rank.astype(jnp.int32)
        tid = jnp.where(born, new_ids, tb.tid)
        lost_frames = jnp.where(born, 0, lost_frames)
        next_id = tb.next_id + n_births.astype(jnp.int32)

        # outputs: activated tracked slots matched this frame (or frame-1
        # births, which are immediately activated)
        emit = (state == TRACKED) & (got | (born & first_frame))
        out_boxes = jnp.where(emit[:, None], _cxcywh_to_xyxy(mean[:, :4]),
                              jnp.nan)
        out_tids = jnp.where(emit, tid, -1)

        tb2 = TrackTable(mean, cov, tid, state, lost_frames, next_id,
                         tb.frame + 1)
        return tb2, (out_boxes, out_tids)

    table, (out_boxes, out_tids) = jax.lax.scan(step, table,
                                                (boxes, scores))
    return table, out_boxes, out_tids
