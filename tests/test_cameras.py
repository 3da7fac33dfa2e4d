import numpy as np
import pytest

import jax.numpy as jnp

from macaque_tpu.cameras import (
    OmnidirCamera,
    PinholeCamera,
    omnidir_project,
    omnidir_undistort,
    omnidir_unproject_ray,
    pinhole_project,
    pinhole_undistort,
    rodrigues,
    rodrigues_inv,
)
from tests.oracles import omni_project_np

cv2 = pytest.importorskip("cv2")


def make_omni_cam(seed=0, n=1):
    rng = np.random.default_rng(seed)
    K = np.zeros((n, 3, 3))
    K[:, 0, 0] = 800 + rng.uniform(-50, 50, n)
    K[:, 1, 1] = 805 + rng.uniform(-50, 50, n)
    K[:, 0, 1] = rng.uniform(-2, 2, n)
    K[:, 0, 2] = 1024 + rng.uniform(-20, 20, n)
    K[:, 1, 2] = 768 + rng.uniform(-20, 20, n)
    K[:, 2, 2] = 1.0
    xi = 1.2 + rng.uniform(-0.2, 0.2, n)
    D = rng.uniform(-0.05, 0.05, (n, 4))
    rvec = rng.uniform(-0.5, 0.5, (n, 3))
    tvec = rng.uniform(-100, 100, (n, 3))
    tvec[:, 2] += 1500
    return OmnidirCamera(
        K=jnp.asarray(K), xi=jnp.asarray(xi), D=jnp.asarray(D),
        rvec=jnp.asarray(rvec), tvec=jnp.asarray(tvec),
    )


def world_points(seed=1, n=50):
    rng = np.random.default_rng(seed)
    return rng.uniform(-500, 500, (n, 3)) + np.array([0, 0, 500.0])


class TestRodrigues:
    def test_matches_cv2(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            rvec = rng.uniform(-2, 2, 3)
            R_cv, _ = cv2.Rodrigues(rvec)
            R_jax = np.asarray(rodrigues(jnp.asarray(rvec)))
            np.testing.assert_allclose(R_jax, R_cv, atol=1e-10)

    def test_zero_vector(self):
        R = np.asarray(rodrigues(jnp.zeros(3)))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-9)

    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        rvec = rng.uniform(-1.5, 1.5, (10, 3))
        back = np.asarray(rodrigues_inv(rodrigues(jnp.asarray(rvec))))
        np.testing.assert_allclose(back, rvec, atol=1e-8)

    def test_roundtrip_near_pi(self):
        """theta ~ pi: the skew part of R vanishes, so the log map needs
        the symmetric-part branch (cameras looking back along an axis
        sit exactly here; the old formula silently returned ~0)."""
        rng = np.random.default_rng(2)
        axes = rng.normal(size=(12, 3))
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        for dt in (0.0, 1e-9, 1e-6, 3e-5):
            rvec = axes * (np.pi - dt)
            R = rodrigues(jnp.asarray(rvec))
            back = np.asarray(rodrigues_inv(R))
            R2 = np.asarray(rodrigues(jnp.asarray(back)))
            # rvec sign is gauge at exactly pi — compare the rotations
            np.testing.assert_allclose(R2, np.asarray(R), atol=1e-7)
            np.testing.assert_allclose(
                np.linalg.norm(back, axis=1), np.pi - dt, atol=1e-6)


class TestOmnidir:
    def test_project_matches_numpy_oracle(self):
        cam = make_omni_cam(0)
        pts = world_points()
        got = np.asarray(omnidir_project(cam, jnp.asarray(pts)))[0]
        K = np.asarray(cam.K[0])
        want = omni_project_np(
            K, float(cam.xi[0]), np.asarray(cam.D[0]),
            np.asarray(cam.rvec[0]), np.asarray(cam.tvec[0]), pts,
        )
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_undistort_recovers_ideal_plane_coords(self):
        """undistort(project(X)) must equal Xc_xy / Xc_z — an analytic truth
        that exercises the fixed-point inversion and the sphere lift."""
        cam = make_omni_cam(2)
        pts = world_points(3)
        pix = omnidir_project(cam, jnp.asarray(pts))
        und = np.asarray(omnidir_undistort(cam, pix))[0]

        R, _ = cv2.Rodrigues(np.asarray(cam.rvec[0]))
        Xc = pts @ R.T + np.asarray(cam.tvec[0])[None]
        ideal = Xc[:, :2] / Xc[:, 2:3]
        np.testing.assert_allclose(und, ideal, atol=1e-7)

    def test_unproject_ray_contains_point(self):
        cam = make_omni_cam(4)
        pts = world_points(5, 20)
        pix = omnidir_project(cam, jnp.asarray(pts))
        near = np.asarray(omnidir_unproject_ray(cam, pix, 0.0))[0]
        far = np.asarray(omnidir_unproject_ray(cam, pix, 1000.0))[0]
        d = far - near
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        v = pts - near
        cross = np.cross(v, d)
        dist_to_line = np.linalg.norm(cross, axis=1)
        assert np.max(dist_to_line) < 1e-5

    def test_nan_propagation(self):
        cam = make_omni_cam(6)
        pix = jnp.asarray([[[np.nan, np.nan], [1000.0, 700.0]]])
        und = np.asarray(omnidir_undistort(cam, pix))[0]
        assert np.isnan(und[0]).all()
        assert np.isfinite(und[1]).all()


class TestPinhole:
    def test_project_matches_cv2(self):
        rng = np.random.default_rng(7)
        K = np.array([[900.0, 0, 640], [0, 910, 360], [0, 0, 1]])
        dist = np.array([-0.2, 0.05, 0.001, -0.002, 0.01])
        rvec = rng.uniform(-0.4, 0.4, 3)
        tvec = np.array([10.0, -5.0, 800.0])
        pts = world_points(8, 30)
        want, _ = cv2.projectPoints(pts.reshape(-1, 1, 3), rvec, tvec, K, dist)
        cam = PinholeCamera(
            K=jnp.asarray(K[None]), dist=jnp.asarray(dist[None]),
            rvec=jnp.asarray(rvec[None]), tvec=jnp.asarray(tvec[None]),
        )
        got = np.asarray(pinhole_project(cam, jnp.asarray(pts)))[0]
        np.testing.assert_allclose(got, want.reshape(-1, 2), atol=1e-6)

    def test_undistort_matches_cv2(self):
        K = np.array([[900.0, 0, 640], [0, 910, 360], [0, 0, 1]])
        dist = np.array([-0.2, 0.05, 0.001, -0.002, 0.01])
        rng = np.random.default_rng(9)
        pix = rng.uniform([200, 100], [1000, 600], (40, 2))
        want = cv2.undistortPoints(
            pix.reshape(-1, 1, 2), K, dist
        ).reshape(-1, 2)
        cam = PinholeCamera(
            K=jnp.asarray(K[None]), dist=jnp.asarray(dist[None]),
            rvec=jnp.zeros((1, 3)), tvec=jnp.zeros((1, 3)),
        )
        got = np.asarray(pinhole_undistort(cam, jnp.asarray(pix[None])))[0]
        np.testing.assert_allclose(got, want, atol=1e-6)
