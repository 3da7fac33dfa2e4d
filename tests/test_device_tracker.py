import numpy as np
import jax.numpy as jnp

from macaque_tpu.tracking import BotSortTracker
from macaque_tpu.tracking.device_tracker import make_table, track_chunk_device
from tests.test_tracking import simulate_boxes

D_SLOTS = 8


def _pad(boxes, scores, d=D_SLOTS):
    b = np.zeros((d, 4))
    s = np.zeros(d)
    n = min(len(boxes), d)
    b[:n] = boxes[:n]
    s[:n] = scores[:n]
    return b, s


def run_device(frames):
    boxes = np.stack([_pad(b, s)[0] for b, s, _ in frames])
    scores = np.stack([_pad(b, s)[1] for b, s, _ in frames])
    table = make_table(16)
    _, out_boxes, out_tids = track_chunk_device(
        table, jnp.asarray(boxes), jnp.asarray(scores)
    )
    return np.asarray(out_boxes), np.asarray(out_tids)


def run_host(frames):
    tr = BotSortTracker()
    outs = []
    for b, s, _ in frames:
        outs.append(tr.update(b, s))
    return outs


def test_device_tracker_matches_host_on_clean_tracks():
    frames = simulate_boxes(T=40, n_obj=3, seed=11)
    dev_boxes, dev_tids = run_device(frames)
    host = run_host(frames)
    for t in range(40):
        hb, ht = host[t]
        active = dev_tids[t] >= 0
        assert active.sum() == len(ht), f"frame {t}"
        # same geometry (order-independent): match by nearest centre
        db = dev_boxes[t][active]
        for box in hb:
            d = np.linalg.norm(db - box[None], axis=1)
            assert d.min() < 1e-4


def test_device_tracker_id_stability():
    frames = simulate_boxes(T=50, n_obj=3, seed=13)
    dev_boxes, dev_tids = run_device(frames)
    # each ground-truth object keeps one device track id across time
    gt_to_tid: dict = {}
    for t, (boxes, scores, gts) in enumerate(frames):
        active = np.where(dev_tids[t] >= 0)[0]
        for slot in active:
            c = (dev_boxes[t, slot, :2] + dev_boxes[t, slot, 2:]) / 2
            centers = (boxes[:, :2] + boxes[:, 2:]) / 2
            gt = gts[int(np.argmin(np.linalg.norm(centers - c, axis=1)))]
            tid = int(dev_tids[t, slot])
            if gt in gt_to_tid:
                assert gt_to_tid[gt] == tid, f"id switch at frame {t}"
            else:
                gt_to_tid[gt] = tid
    assert len(set(gt_to_tid.values())) == 3


def test_device_tracker_survives_occlusion():
    frames = list(simulate_boxes(T=40, n_obj=1, seed=17))
    for t in range(15, 25):
        b, s, g = frames[t]
        frames[t] = (np.zeros((0, 4)), np.zeros((0,)), g)
    dev_boxes, dev_tids = run_device(frames)
    ids = set(int(i) for t in range(40) for i in dev_tids[t] if i >= 0)
    assert len(ids) == 1
