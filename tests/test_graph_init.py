import numpy as np

import jax.numpy as jnp

from macaque_tpu.calib.graph_init import (
    initial_extrinsics_from_board_poses, make_M, get_rtvec,
)
from macaque_tpu.cameras.rotation import rodrigues


def test_extrinsics_from_shared_board_views():
    """Simulate a board moving through a 3-camera rig; the graph init must
    recover each camera's pose relative to camera 0."""
    rng = np.random.default_rng(0)
    cam_rv = np.vstack([np.zeros(3), rng.uniform(-0.5, 0.5, (2, 3))])
    cam_tv = np.vstack([np.zeros(3), rng.uniform(-500, 500, (2, 3))])
    cam_M = [make_M(cam_rv[c], cam_tv[c]) for c in range(3)]

    V = 8
    board_poses = [[None] * V for _ in range(3)]
    for v in range(V):
        Mb = make_M(rng.uniform(-1, 1, 3), rng.uniform(-300, 300, 3)
                    + np.array([0, 0, 1500.0]))
        for c in range(3):
            # camera 2 misses half the views (graph still connected)
            if c == 2 and v % 2 == 0:
                continue
            M_board_in_cam = cam_M[c] @ Mb
            rv, tv = get_rtvec(M_board_in_cam)
            board_poses[c][v] = (rv, tv)

    rvecs, tvecs = initial_extrinsics_from_board_poses(board_poses)
    np.testing.assert_allclose(rvecs[0], 0, atol=1e-12)
    for c in range(3):
        np.testing.assert_allclose(rvecs[c], cam_rv[c], atol=1e-8)
        np.testing.assert_allclose(tvecs[c], cam_tv[c], atol=1e-6)


def test_disconnected_graph_raises():
    import pytest

    board_poses = [
        [(np.zeros(3), np.zeros(3)), None],
        [None, (np.zeros(3), np.zeros(3))],
    ]
    with pytest.raises(ValueError, match="disconnected"):
        initial_extrinsics_from_board_poses(board_poses)


def test_compose_rtvecs_matches_matrix_product():
    """compose_rtvecs == Rodrigues-matrix product (reference
    multicam_toolbox.applytransform semantics, incl. inv)."""
    import numpy as np
    from macaque_tpu.calib.graph_init import compose_rtvecs, make_M

    rng = np.random.default_rng(3)
    r1, r2 = rng.normal(0, 0.6, (2, 3))
    t1, t2 = rng.normal(0, 100, (2, 3))
    for inv in (False, True):
        rv, tv = compose_rtvecs(r1, t1, r2, t2, inv=inv)
        M1 = make_M(r1, t1)
        if inv:
            M1 = np.linalg.inv(M1)
        want = M1 @ make_M(r2, t2)
        got = make_M(rv, tv.ravel())
        np.testing.assert_allclose(got, want, atol=1e-6)
