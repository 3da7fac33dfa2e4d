import numpy as np
import jax.numpy as jnp

from macaque_tpu.association import (
    match_svt,
    project_simplex,
    geometry_affinity,
    combined_affinity,
    infer_pictorial_3d,
    transitive_closure,
)
from macaque_tpu.association.pictorial import closure_to_clusters
from macaque_tpu.cameras import omnidir_project, omnidir_undistort
from tests.test_triangulate import make_rig


# ------------------------------------------------------------- simplex

def proj2pav_np(y):
    """Reference simplex projection restated in NumPy (step2:79-94)."""
    y = y.copy()
    y[y < 0] = 0
    if y.sum() < 1:
        return y
    u = np.sort(y)[::-1]
    sv = np.cumsum(u)
    idx = np.arange(1, len(u) + 1)
    rho = np.nonzero(u > (sv - 1) / idx)[0][-1]
    theta = max(0, (sv[rho] - 1) / (rho + 1))
    return np.maximum(y - theta, 0)


def test_project_simplex_matches_oracle():
    rng = np.random.default_rng(0)
    for _ in range(20):
        y = rng.normal(0.3, 1.0, 8)
        want = proj2pav_np(y)
        got = np.asarray(project_simplex(jnp.asarray(y)))
        np.testing.assert_allclose(got, want, atol=1e-12)


# ----------------------------------------------------------------- SVT

def match_svt_np(S, dimGroup, alpha=0.5, lam=50.0, tol=5e-4, max_iter=500):
    """NumPy restatement of the published SVT matching iteration
    (reference step2:130-216, dual_stochastic=False), used as oracle."""
    N = S.shape[0]
    S = S.copy()
    S[np.arange(N), np.arange(N)] = 0
    S = (S + S.T) / 2
    X = S.copy()
    Y = np.zeros_like(S)
    W = alpha - S
    mu = 64.0
    for _ in range(max_iter):
        X0 = X.copy()
        U, s, Vh = np.linalg.svd(Y / mu + X, full_matrices=False)
        s_th = np.maximum(s - lam / mu, 0)
        Q = U @ np.diag(s_th) @ Vh
        X = Q - (W + Y) / mu
        for i in range(len(dimGroup) - 1):
            i0, i1 = dimGroup[i], dimGroup[i + 1]
            X[i0:i1, i0:i1] = 0
        X[np.arange(N), np.arange(N)] = 1
        X = np.clip(X, 0, 1)
        X = (X + X.T) / 2
        Y = Y + mu * (X - Q)
        pRes = np.linalg.norm(X - Q) / N
        dRes = mu * np.linalg.norm(X - X0) / N
        if pRes < tol and dRes < tol:
            break
        if pRes > 10 * dRes:
            mu *= 2
        elif dRes > 10 * pRes:
            mu /= 2
    X = (X + X.T) / 2
    return (X > 0.5).astype(np.uint8)


def myproj2dpam_np(Y, tol=1e-2):
    """Reference myproj2dpam (step2:110-126)."""
    X = Y.copy()
    I2 = np.zeros_like(X)
    for _ in range(10):
        X1 = np.stack([proj2pav_np(r) for r in (X + I2)])
        I1 = X1 - (X + I2)
        X2 = np.stack([proj2pav_np(c) for c in (X + I1).T]).T
        I2 = X2 - (X + I1)
        if np.abs(X2 - X).sum() / X.size < tol:
            break
        X = X2
    return X


def match_svt_np_dual(S, dimGroup, alpha=0.5, lam=50.0, tol=5e-4,
                      max_iter=500):
    """Oracle WITH the per-block dual-stochastic projection
    (reference step2:180-186)."""
    N = S.shape[0]
    S = S.copy()
    S[np.arange(N), np.arange(N)] = 0
    S = (S + S.T) / 2
    X = S.copy()
    Y = np.zeros_like(S)
    W = alpha - S
    mu = 64.0
    for _ in range(max_iter):
        X0 = X.copy()
        U, s, Vh = np.linalg.svd(Y / mu + X, full_matrices=False)
        s_th = np.maximum(s - lam / mu, 0)
        Q = U @ np.diag(s_th) @ Vh
        X = Q - (W + Y) / mu
        for i in range(len(dimGroup) - 1):
            i0, i1 = dimGroup[i], dimGroup[i + 1]
            X[i0:i1, i0:i1] = 0
        X[np.arange(N), np.arange(N)] = 1
        X = np.clip(X, 0, 1)
        for i in range(len(dimGroup) - 1):
            r0, r1 = dimGroup[i], dimGroup[i + 1]
            for j in range(len(dimGroup) - 1):
                c0, c1 = dimGroup[j], dimGroup[j + 1]
                if r1 > r0 and c1 > c0:
                    X[r0:r1, c0:c1] = myproj2dpam_np(X[r0:r1, c0:c1])
        X = (X + X.T) / 2
        Y = Y + mu * (X - Q)
        pRes = np.linalg.norm(X - Q) / N
        dRes = mu * np.linalg.norm(X - X0) / N
        if pRes < tol and dRes < tol:
            break
        if pRes > 10 * dRes:
            mu *= 2
        elif dRes > 10 * pRes:
            mu /= 2
    X = (X + X.T) / 2
    return (X > 0.5).astype(np.uint8)


def test_svt_dual_stochastic_matches_oracle():
    rng = np.random.default_rng(7)
    dimGroup = [0, 2, 4, 6, 8]
    N = 8
    S = np.zeros((N, N))
    for i in range(N):
        for j in range(N):
            if i // 2 != j // 2 and i % 2 == j % 2:
                S[i, j] = 0.9 + rng.uniform(-0.05, 0.05)
            elif i // 2 != j // 2:
                S[i, j] = 0.1 + rng.uniform(-0.05, 0.05)
    S = (S + S.T) / 2

    want = match_svt_np_dual(S.copy(), dimGroup)
    got = np.asarray(match_svt(
        jnp.asarray(S), jnp.asarray(_block_mask(dimGroup, N)),
        dual_stochastic=True, block_size=2,
    ))
    np.testing.assert_array_equal(got, want)
    assert want[0, 2] == 1


def test_svt_dual_stochastic_padded_matches_compact():
    """Padded slot layout (block_size 2, cam det counts (2,1,2)) must
    reproduce the compact-matrix oracle: zero padding is neutral for
    the per-block projections."""
    rng = np.random.default_rng(9)
    counts = [2, 1, 2]
    dimGroup = [0, 2, 3, 5]
    Nc = 5
    S = rng.uniform(0.0, 0.2, (Nc, Nc))
    # one consistent identity: det 0 in each cam (compact idx 0, 2, 3)
    for i, j in [(0, 2), (0, 3), (2, 3)]:
        S[i, j] = S[j, i] = 0.92
    S = (S + S.T) / 2
    want = match_svt_np_dual(S.copy(), dimGroup)

    # pad to 3 cams x 2 slots
    M = 6
    slot_of = [0, 1, 2, 4, 5]  # compact index -> padded slot
    Sp = np.zeros((M, M))
    for a in range(Nc):
        for b in range(Nc):
            Sp[slot_of[a], slot_of[b]] = S[a, b]
    valid = np.zeros(M, bool)
    for s in slot_of:
        valid[s] = True
    blk = np.zeros((M, M), bool)
    for c in range(3):
        blk[2 * c:2 * c + 2, 2 * c:2 * c + 2] = True
    got = np.asarray(match_svt(
        jnp.asarray(Sp), jnp.asarray(blk), dual_stochastic=True,
        block_size=2, valid=jnp.asarray(valid),
    ))
    for a in range(Nc):
        for b in range(Nc):
            assert got[slot_of[a], slot_of[b]] == want[a, b], (a, b)


def _block_mask(dimGroup, N):
    m = np.zeros((N, N), bool)
    for i in range(len(dimGroup) - 1):
        m[dimGroup[i]:dimGroup[i + 1], dimGroup[i]:dimGroup[i + 1]] = True
    return m


def test_svt_matches_oracle():
    rng = np.random.default_rng(3)
    dimGroup = [0, 2, 4, 6, 8]  # 4 cams x 2 detections
    N = 8
    # two ground-truth identities: even idx = person A, odd = person B
    S = np.zeros((N, N))
    for i in range(N):
        for j in range(N):
            if i // 2 != j // 2 and i % 2 == j % 2:
                S[i, j] = 0.9 + rng.uniform(-0.05, 0.05)
            elif i // 2 != j // 2:
                S[i, j] = 0.1 + rng.uniform(-0.05, 0.05)
    S = (S + S.T) / 2

    want = match_svt_np(S.copy(), dimGroup)
    got = np.asarray(
        match_svt(jnp.asarray(S), jnp.asarray(_block_mask(dimGroup, N)))
    )
    np.testing.assert_array_equal(got, want)
    # and it actually recovers the identities
    assert want[0, 2] == 1 and want[0, 3] == 0


def test_svt_batched():
    rng = np.random.default_rng(4)
    dimGroup = [0, 2, 4, 6]
    N = 6
    batch = []
    for b in range(3):
        S = rng.uniform(0, 1, (N, N))
        S = (S + S.T) / 2
        batch.append(S)
    blk = _block_mask(dimGroup, N)
    got = np.asarray(match_svt(jnp.asarray(np.stack(batch)), jnp.asarray(blk)))
    for b in range(3):
        want = match_svt_np(batch[b].copy(), dimGroup)
        np.testing.assert_array_equal(got[b], want)


# ------------------------------------------------------------ affinity

def test_geometry_affinity_separates_people():
    cam = make_rig(4)
    rng = np.random.default_rng(5)
    J = 17
    person_a = rng.uniform(-100, 100, (J, 3))
    person_b = person_a + np.array([600.0, 400.0, 0.0])
    # detections: (cam0,pA),(cam0,pB),(cam1,pA),(cam1,pB),(cam2,pA),(cam3,pB)
    world = np.stack([person_a, person_b, person_a, person_b, person_a, person_b])
    cam_idx = np.array([0, 0, 1, 1, 2, 3])
    pix = []
    for m in range(6):
        c = cam_idx[m]
        import jax
        sub = jax.tree.map(lambda x: x[c:c+1], cam)
        p = omnidir_project(sub, jnp.asarray(world[m]))[0]
        u = omnidir_undistort(sub, p[None])[0]
        pix.append(np.asarray(u))
    und = jnp.asarray(np.stack(pix))[None]            # (1, 6, J, 2)
    scores = jnp.ones((1, 6, J))
    det_valid = jnp.ones((1, 6), bool)
    aff = np.asarray(
        geometry_affinity(cam, und, scores, jnp.asarray(cam_idx), det_valid)
    )[0]
    # same-person cross-camera pairs must beat different-person pairs
    assert aff[0, 2] > 0.7 and aff[0, 4] > 0.7
    assert aff[0, 3] < 0.2 and aff[1, 2] < 0.2
    assert aff[0, 1] == 0.0  # same camera
    np.testing.assert_allclose(aff, aff.T)


def test_combined_affinity_id_boost():
    geo = jnp.asarray(np.full((1, 4, 4), 0.5))
    cids = jnp.asarray([[0, 2, 0, -1]])
    cam_idx = jnp.asarray([0, 0, 1, 1])
    W = np.asarray(combined_affinity(geo, cids, cam_idx, alpha_id=0.2))[0]
    assert W[0, 2] > W[1, 2]           # matching collar id boosts
    assert W[0, 2] == 0.2 * 1 + 0.8 * 0.5
    assert W[0, 3] == 0.8 * 0.5        # unknown id: geometry only


# ----------------------------------------------------------- pictorial

def test_pictorial_picks_consistent_skeleton():
    rng = np.random.default_rng(6)
    C = 4
    bone = np.full(13, 100.0)
    std = np.full(13, 10.0)
    # candidate 0 for each joint = a consistent skeleton (chain spacing 100)
    from macaque_tpu.association.pictorial import PICTORIAL_PARENT

    pos = np.zeros((13, 3))
    for j in range(1, 13):
        p = PICTORIAL_PARENT[j]
        d = rng.normal(size=3)
        pos[j] = pos[p] + 100.0 * d / np.linalg.norm(d)
    cands = np.zeros((13, C, 3))
    cands[:, 0] = pos
    cands[:, 1:] = rng.uniform(-2000, 2000, (13, C - 1, 3))
    unary = np.full((13, C), 0.5)
    picks = np.asarray(infer_pictorial_3d(
        jnp.asarray(unary), jnp.asarray(cands),
        jnp.asarray(bone), jnp.asarray(std),
    ))
    np.testing.assert_array_equal(picks, 0)


def test_transitive_closure_and_clusters():
    X = np.zeros((5, 5), np.uint8)
    X[0, 1] = X[1, 0] = 1
    X[1, 2] = X[2, 1] = 1
    X[3, 4] = X[4, 3] = 1
    R = np.asarray(transitive_closure(jnp.asarray(X)))
    assert R[0, 2] and R[2, 0]
    assert not R[0, 3]
    clusters = closure_to_clusters(X)
    assert clusters[:3, 0].all()
    assert clusters[3:, 3].all()
    assert clusters.sum() == 5
