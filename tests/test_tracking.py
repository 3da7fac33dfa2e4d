import numpy as np
import jax.numpy as jnp

from macaque_tpu.tracking import BotSortTracker, TrackerParams, KalmanXYWH
from macaque_tpu.tracking.kalman import kalman_predict_jax, kalman_update_jax
from macaque_tpu.tracking.hungarian import hungarian_jax


def simulate_boxes(T=60, n_obj=3, seed=0):
    """Objects moving on straight lines with noise; returns per-frame
    (boxes, scores) and ground-truth object index per box."""
    rng = np.random.default_rng(seed)
    pos0 = rng.uniform(200, 1500, (n_obj, 2))
    vel = rng.uniform(-4, 4, (n_obj, 2))
    size = rng.uniform(120, 220, (n_obj, 2))
    frames = []
    for t in range(T):
        boxes, scores, gts = [], [], []
        for k in range(n_obj):
            c = pos0[k] + vel[k] * t + rng.normal(0, 1.5, 2)
            w, h = size[k]
            boxes.append([c[0] - w / 2, c[1] - h / 2, c[0] + w / 2, c[1] + h / 2])
            scores.append(rng.uniform(0.88, 0.99))
            gts.append(k)
        frames.append((np.array(boxes), np.array(scores), gts))
    return frames


class TestBotSort:
    def test_stable_ids(self):
        frames = simulate_boxes()
        tr = BotSortTracker()
        id_map = {}
        for boxes, scores, gts in frames:
            out_boxes, tids = tr.update(boxes, scores)
            assert len(tids) == 3
            # associate outputs back to gt by IoU
            for ob, tid in zip(out_boxes, tids):
                centers = (boxes[:, :2] + boxes[:, 2:]) / 2
                oc = (ob[:2] + ob[2:]) / 2
                k = int(np.argmin(np.linalg.norm(centers - oc, axis=1)))
                gt = gts[k]
                if gt in id_map:
                    assert id_map[gt] == tid, "track id switched"
                else:
                    id_map[gt] = tid
        assert len(set(id_map.values())) == 3

    def test_survives_occlusion(self):
        frames = simulate_boxes(T=40, n_obj=1, seed=3)
        tr = BotSortTracker(TrackerParams(track_buffer=30))
        ids_seen = []
        for t, (boxes, scores, _) in enumerate(frames):
            if 15 <= t < 25:  # occlusion gap of 10 frames < buffer
                boxes, scores = np.zeros((0, 4)), np.zeros((0,))
            _, tids = tr.update(boxes, scores)
            ids_seen.extend(tids.tolist())
        assert len(set(ids_seen)) == 1, "id must survive a short occlusion"

    def test_new_track_needs_confirmation(self):
        tr = BotSortTracker()
        b = np.array([[100, 100, 200, 200.0]])
        s = np.array([0.95])
        _, ids0 = tr.update(b, s)
        assert len(ids0) == 1  # first frame activates immediately
        # a brand-new object appearing later needs a second frame
        b2 = np.vstack([b, [[500, 500, 600, 600.0]]])
        s2 = np.array([0.95, 0.95])
        _, ids1 = tr.update(b2, s2)
        assert len(ids1) == 1
        _, ids2 = tr.update(b2, s2)
        assert len(ids2) == 2

    def test_low_score_keeps_track_alive(self):
        frames = simulate_boxes(T=20, n_obj=1, seed=5)
        tr = BotSortTracker()
        for t, (boxes, scores, _) in enumerate(frames):
            if t >= 5:
                scores = np.full_like(scores, 0.4)  # low-score regime
            out, tids = tr.update(boxes, scores)
            if t < 5:
                assert len(tids) == 1
            else:
                # second-stage association should keep matching it
                assert len(tids) == 1


class TestKalmanJaxParity:
    def test_predict_update_match_numpy(self):
        rng = np.random.default_rng(0)
        mean, cov = KalmanXYWH.initiate(np.array([100.0, 200, 50, 80]))
        jm, jc = jnp.asarray(mean), jnp.asarray(cov)
        for _ in range(5):
            mean, cov = KalmanXYWH.predict(mean, cov)
            jm, jc = kalman_predict_jax(jm, jc)
            meas = np.array([100, 200, 50, 80]) + rng.normal(0, 2, 4)
            mean, cov = KalmanXYWH.update(mean, cov, meas)
            jm, jc = kalman_update_jax(jm, jc, jnp.asarray(meas))
        np.testing.assert_allclose(np.asarray(jm), mean, atol=1e-8)
        np.testing.assert_allclose(np.asarray(jc), cov, atol=1e-8)

    def test_batched(self):
        means = jnp.asarray(np.random.default_rng(1).uniform(50, 500, (6, 8)))
        covs = jnp.asarray(np.tile(np.eye(8) * 4.0, (6, 1, 1)))
        m2, c2 = kalman_predict_jax(means, covs)
        assert m2.shape == (6, 8) and c2.shape == (6, 8, 8)


class TestHungarianJax:
    def test_matches_scipy_cost(self):
        from scipy.optimize import linear_sum_assignment

        rng = np.random.default_rng(2)
        for trial in range(20):
            n = rng.integers(2, 9)
            m = rng.integers(n, 12)
            cost = rng.uniform(0, 10, (n, m))
            col4row = np.asarray(hungarian_jax(jnp.asarray(cost)))
            assert len(set(col4row.tolist())) == n  # valid assignment
            got = cost[np.arange(n), col4row].sum()
            r, c = linear_sum_assignment(cost)
            want = cost[r, c].sum()
            np.testing.assert_allclose(got, want, atol=1e-5)
