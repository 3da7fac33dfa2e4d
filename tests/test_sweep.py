"""Tracker hyperparameter sweep harness tests (tools/sweep.py).

A synthetic run_fn produces kp3d whose quality depends on the tracker
parameters (one known-good configuration tracks cleanly, the others
drop detections / hallucinate), so the harness must rank the good
config first in the aggregated CSV. Also checks the resumability
protocol (DONE flag -> skip) and the sweep_log.csv schema
(reference notebooks/tracking_evaluation.ipynb cells 2-4).
"""

import os

import numpy as np
import pytest

from macaque_tpu.pipeline.artifacts import write_pickle
from macaque_tpu.tools.sweep import (
    SweepPoint, rank_sweep, run_tracker_sweep, sweep_grid,
)

GOOD = SweepPoint(0.85, 0.50, 0.05, 72, True)
BAD1 = SweepPoint(0.65, 0.30, 0.25, 36, False)
BAD2 = SweepPoint(0.65, 0.50, 0.05, 120, False)

A, T, J = 2, 40, 17


def _gt(session_seed):
    rng = np.random.default_rng(session_seed)
    base = np.cumsum(rng.normal(0, 12, (A, T, 3)), axis=1)
    return base + np.array([0.0, 0.0, 500.0])


def _fake_run(gts):
    def run_fn(session, point, root):
        gt = gts[session]
        kp3d = np.tile(gt[:, :, None, :], (1, 1, J, 1))
        rng = np.random.default_rng(hash((session, point.tag())) % 2**31)
        if point != GOOD:
            # degraded tracking: lose half the frames of animal 1 and
            # displace animal 0 beyond the TP threshold in some frames
            kp3d[1, ::2] = np.nan
            miss = rng.uniform(size=T) < 0.4
            kp3d[0, miss] += 2000.0
        path = os.path.join(root, "kp3d.pickle")
        write_pickle(path, {"kp3d": kp3d})
        return path

    return run_fn


def test_sweep_ranks_good_config_first(tmp_path):
    sessions = ["sessA", "sessB"]
    gts = {s: _gt(i) for i, s in enumerate(sessions)}
    grid = [BAD1, GOOD, BAD2]

    log = run_tracker_sweep(sessions, grid, str(tmp_path / "sweep"),
                            _fake_run(gts), gts, verbose=False)
    assert os.path.basename(log) == "sweep_log.csv"

    with open(log) as f:
        header = f.readline().strip()
    assert header == ("session,match,prox,tlow,tbuf,fuse,results_root,"
                      "tp,fn,fp,precision,recall")

    ranking = rank_sweep(log)
    assert len(ranking) == 3
    best = ranking[0]
    assert (best["match"], best["prox"], best["tlow"], best["tbuf"],
            best["fuse"]) == (0.85, 0.50, 0.05, 72, True)
    assert best["recall"] > 0.99 and best["precision"] > 0.99
    assert ranking[1]["f1"] < best["f1"]

    # per-root artifacts: meta + DONE flag
    root = os.path.join(str(tmp_path / "sweep"), "sessA", GOOD.tag())
    assert os.path.exists(os.path.join(root, "sweep_meta.json"))
    assert os.path.exists(os.path.join(root, "sessA_DONE.flag"))


def test_sweep_resumes_with_skip(tmp_path):
    sessions = ["sessA"]
    gts = {s: _gt(0) for s in sessions}
    calls = []

    def run_fn(session, point, root):
        calls.append((session, point.tag()))
        return _fake_run(gts)(session, point, root)

    d = str(tmp_path / "sweep")
    run_tracker_sweep(sessions, [GOOD], d, run_fn, gts, verbose=False)
    run_tracker_sweep(sessions, [GOOD], d, run_fn, gts, verbose=False)
    assert len(calls) == 1  # second pass skipped via DONE flag

    # skip rows are appended without metrics and ignored by rank_sweep
    ranking = rank_sweep(os.path.join(d, "sweep_log.csv"))
    assert len(ranking) == 1


def test_sweep_point_to_tracker_params():
    tp = GOOD.tracker_params()
    assert tp.match_thresh == 0.85
    assert tp.proximity_thresh == 0.50
    assert tp.track_low_thresh == 0.05
    assert tp.track_buffer == 72
    assert tp.fuse_score is True
    assert tp.track_high_thresh == 0.85
    assert tp.new_track_thresh == 0.60


def test_sweep_grid_size():
    g = sweep_grid()
    assert len(g) == 3 * 3 * 3 * 3 * 2
    assert len({p.tag() for p in g}) == len(g)


@pytest.mark.slow
def test_run_synthetic_sweep_real_pipeline(tmp_path):
    """The CLI path: steps 1-4 over a small grid on a synthetic scene
    (oracle perception); all rows complete with near-perfect metrics."""
    from macaque_tpu.tools.sweep import run_synthetic_sweep

    grid = [SweepPoint(0.85, 0.50, 0.05, 72, True),
            SweepPoint(0.65, 0.30, 0.25, 36, False)]
    log = run_synthetic_sweep(str(tmp_path / "sweep"), grid=grid,
                              n_frame=60, n_cam=4, verbose=False)
    ranking = rank_sweep(log)
    assert len(ranking) == 2
    # oracle perception -> both configs should track cleanly
    for row in ranking:
        assert row["recall"] > 0.8, row
        assert row["precision"] > 0.8, row
