import numpy as np
import jax.numpy as jnp

from macaque_tpu.filters import (
    interpolate_nan,
    median_filter_1d,
    ema_smooth,
    viterbi_filter,
    viterbi_filter_joints,
)
from tests.oracles import viterbi_path_np


class TestInterpolateNan:
    def test_matches_np_interp(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=50)
        x[[3, 4, 10, 20, 21, 22, 49]] = np.nan
        nans = np.isnan(x)
        ix = np.arange(50)
        want = x.copy()
        want[nans] = np.interp(ix[nans], ix[~nans], x[~nans])
        got = np.asarray(interpolate_nan(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_all_nan(self):
        got = np.asarray(interpolate_nan(jnp.full(10, np.nan)))
        np.testing.assert_allclose(got, 0.0)

    def test_leading_trailing(self):
        x = np.array([np.nan, np.nan, 2.0, 4.0, np.nan])
        got = np.asarray(interpolate_nan(jnp.asarray(x)))
        np.testing.assert_allclose(got, [2, 2, 2, 4, 4])


class TestMedianFilter:
    def test_matches_scipy_reflect(self):
        from scipy import signal

        rng = np.random.default_rng(1)
        x = rng.normal(size=60)
        size = 7
        padsize = size + 5
        vpad = np.pad(x, (padsize, padsize), mode="reflect")
        want = signal.medfilt(vpad, kernel_size=size)[padsize:-padsize]
        got = np.asarray(median_filter_1d(jnp.asarray(x), size))
        np.testing.assert_allclose(got, want, atol=1e-12)


class TestEma:
    def test_blends_when_close(self):
        T, J = 5, 3
        kp = np.zeros((T, J, 3))
        kp[..., 2] = 1.0
        kp[1:, :, 0] = 5.0  # small jump < 20 -> blended
        out = np.asarray(ema_smooth(jnp.asarray(kp), alpha=0.5, disp_thr=20.0))
        assert out[1, 0, 0] == 2.5  # 0.5*0 + 0.5*5
        # EMA uses previous smoothed: 0.5*2.5 + 0.5*5
        assert out[2, 0, 0] == 3.75

    def test_passthrough_when_far(self):
        kp = np.zeros((3, 1, 3))
        kp[1, 0, 0] = 100.0
        out = np.asarray(ema_smooth(jnp.asarray(kp)))
        assert out[1, 0, 0] == 100.0

    def test_nan_passthrough(self):
        kp = np.zeros((3, 1, 3))
        kp[1, 0, :2] = np.nan
        out = np.asarray(ema_smooth(jnp.asarray(kp)))
        assert np.isnan(out[1, 0, 0])
        assert out[2, 0, 0] == 0.0


class TestViterbi:
    def _run_case(self, T=30, P=1, seed=0, gap=None):
        rng = np.random.default_rng(seed)
        truth = np.cumsum(rng.normal(0, 3, (T, 2)), axis=0) + 100
        points = np.full((T, P, 2), np.nan)
        scores = np.zeros((T, P))
        points[:, 0] = truth + rng.normal(0, 1, (T, 2))
        scores[:, 0] = rng.uniform(0.5, 1.0, T)
        if P > 1:
            # decoy far detections with lower score
            points[:, 1] = truth + rng.normal(0, 1, (T, 2)) + 60
            scores[:, 1] = rng.uniform(0.31, 0.45, T)
        if gap:
            points[gap[0] : gap[1]] = np.nan
            scores[gap[0] : gap[1]] = 0.0
        return points, scores

    def test_matches_reference_oracle_p1(self):
        points, scores = self._run_case(T=40, P=1, seed=2, gap=(10, 14))
        # apply the score threshold like filter_pose_viterbi does
        pts = points.copy()
        pts[scores < 0.3] = np.nan
        want_p, want_s = viterbi_path_np(pts, scores, n_back=3, thres_dist=25.0)
        got_p, got_s = viterbi_filter(
            jnp.asarray(points), jnp.asarray(scores),
            n_back=3, thres_dist=25.0, score_threshold=0.3,
        )
        np.testing.assert_allclose(np.asarray(got_p), want_p, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_s), want_s, atol=1e-6)

    def test_matches_reference_oracle_p2(self):
        points, scores = self._run_case(T=25, P=2, seed=5)
        pts = points.copy()
        pts[scores < 0.3] = np.nan
        want_p, want_s = viterbi_path_np(pts, scores, n_back=3, thres_dist=25.0)
        got_p, got_s = viterbi_filter(
            jnp.asarray(points), jnp.asarray(scores),
            n_back=3, thres_dist=25.0, score_threshold=0.3,
        )
        np.testing.assert_allclose(np.asarray(got_p), want_p, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_s), want_s, atol=1e-6)

    def test_picks_track_not_decoy(self):
        points, scores = self._run_case(T=25, P=2, seed=7)
        got_p, _ = viterbi_filter(jnp.asarray(points), jnp.asarray(scores))
        # output should hug the high-score track (column 0)
        err = np.linalg.norm(np.asarray(got_p) - points[:, 0], axis=1)
        assert np.nanmax(err) < 30.0

    def test_joints_vmap(self):
        points, scores = self._run_case(T=20, P=1, seed=9)
        pj = np.stack([points, points + 10], axis=1)  # (T, J=2, P, 2)
        sj = np.stack([scores, scores], axis=1)
        got_p, got_s = viterbi_filter_joints(jnp.asarray(pj), jnp.asarray(sj))
        assert got_p.shape == (20, 2, 2)
        assert got_s.shape == (20, 2)
