"""Multi-object tracking: BoT-SORT-style two-stage association with a
constant-velocity Kalman filter.

Replaces the reference's boxmot ``BotSort`` usage (step1_proc2d.py:77-89,
240-241: with_reid=False, track_high 0.85, track_low 0.1, new_track 0.85,
buffer 72, match 0.8). Camera-motion compensation (cmc='sift') is omitted:
the rig's cameras are statically mounted (SURVEY.md §7.3).

TPU design note: the tracker operates on tiny (<=8 boxes/frame) box lists
*between* batched device stages — detection for a whole frame-chunk runs
on-device first, the association loop then runs on host over the chunk's
box lists (microseconds/frame), and pose/ID crops batch back onto the
device. One transfer per chunk each way instead of per-frame sync.
"""

from macaque_tpu.tracking.kalman import KalmanXYWH
from macaque_tpu.tracking.botsort import BotSortTracker, TrackerParams
from macaque_tpu.tracking.hungarian import hungarian

__all__ = ["KalmanXYWH", "BotSortTracker", "TrackerParams", "hungarian"]
