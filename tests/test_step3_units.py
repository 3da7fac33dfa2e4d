"""Unit tests for step3's intricate voting/splitting/flow helpers."""

import numpy as np

from macaque_tpu.pipeline.step3 import (
    set_tracklet_ids, split_multi_id_tracklets, _to_intervals,
    solve_flow, count_id_detections, remove_single_cam_tracklets,
)


def _mk_trk(n_frame, lo, hi, n_cam=4):
    trk = -np.ones((n_frame, n_cam), int)
    trk[lo:hi + 1, 0] = 1
    trk[lo:hi + 1, 1] = 2
    return trk


class TestSetTrackletIds:
    def test_single_identity_fills_whole_track(self):
        n = 400
        Trk = {0: _mk_trk(n, 50, 350)}
        cid0 = np.zeros((n, 4), int)
        cid0[100:300, 2] = 1  # steady detections of animal 2
        Cid = set_tracklet_ids(Trk, {0: cid0}, n, wsize=120)
        assert (Cid[0] == 2).all()

    def test_midpoint_split_between_identities(self):
        n = 600
        Trk = {0: _mk_trk(n, 0, 599)}
        cid0 = np.zeros((n, 4), int)
        cid0[:200, 0] = 1     # animal 0 detections early
        cid0[400:, 3] = 1     # animal 3 detections late
        Cid = set_tracklet_ids(Trk, {0: cid0}, n, wsize=120)
        c = Cid[0]
        assert c[0] == 0 and c[-1] == 3
        switch = np.where(np.diff(c) != 0)[0]
        assert len(switch) == 1
        # the split lands between the two detection clusters
        assert 150 < switch[0] < 450

    def test_low_support_gives_no_identity(self):
        n = 300
        Trk = {0: _mk_trk(n, 0, 299)}
        cid0 = np.zeros((n, 4), int)
        cid0[10:15, 1] = 1  # only 5 detections < MINDETCNT1
        Cid = set_tracklet_ids(Trk, {0: cid0}, n, wsize=120)
        assert (Cid[0] == -1).all()


class TestSplit:
    def test_multi_id_tracklet_splits_into_runs(self):
        n = 400
        trk = _mk_trk(n, 0, 399)
        cid = -np.ones(n, int)
        cid[0:150] = 1
        cid[250:400] = 2
        Trk = {0: trk}
        Cid = {0: cid}
        Trk, Cid = split_multi_id_tracklets(Trk, Cid, n_cam=4)
        assert 0 not in Trk
        # reference behaviour (div_3dtracklet iterates every unique id
        # incl. -1): pieces for id 1, id 2, and the unknown middle run
        ids = sorted(set(int(np.max(c)) for c in Cid.values()))
        assert ids == [-1, 1, 2]
        for k, c in Cid.items():
            if (c >= 0).any():
                runs = _to_intervals(c >= 0)
                assert runs.shape[0] == 1  # contiguous identity run
            trk_runs = _to_intervals((Trk[k] >= 0).any(axis=1))
            assert trk_runs.shape[0] == 1


class TestFlow:
    def test_chains_follow_cheapest_continuation(self):
        # 0 -> 1 cheap, 0 -> 2 expensive; 3 isolated
        edges = np.array([
            [0, 1, 10.0],
            [0, 2, 900.0],
        ])
        chains = solve_flow(edges)
        assert [0, 1] in chains

    def test_empty_graph(self):
        assert solve_flow(np.zeros((0, 3))) == []


class TestHelpers:
    def test_to_intervals(self):
        m = np.array([0, 1, 1, 0, 1, 0, 0, 1, 1, 1])
        iv = _to_intervals(m)
        np.testing.assert_array_equal(iv, [[1, 2], [4, 4], [7, 9]])

    def test_remove_single_cam(self):
        n = 50
        trk_multi = _mk_trk(n, 5, 40)
        trk_single = -np.ones((n, 4), int)
        trk_single[5:40, 0] = 7
        Trk = {0: trk_multi, 1: trk_single}
        Trk = remove_single_cam_tracklets(Trk)
        assert 0 in Trk and 1 not in Trk

    def test_count_id_detections(self):
        n = 30
        trk = _mk_trk(n, 0, 29)
        # alldata: cam0 bbox 1 carries collar class 2 ('g') confidently
        alldata = [[[] for _ in range(n)] for _ in range(4)]
        for f in range(n):
            alldata[0][f].append([1, 0, 0, 10, 10,
                                  [[0, 0, 0.9]] * 17, 2, 0.95])
        counts = count_id_detections(alldata, {0: trk}, n, 4)
        # class 2 maps to animal column 1 (valid classes 0,2,3,5)
        assert counts[0][:, 1].sum() == n
        assert counts[0][:, [0, 2, 3]].sum() == 0
