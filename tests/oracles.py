"""Independent NumPy/SciPy oracle implementations used only by tests.

These re-derive the reference's documented math (Mei omnidir model, DLT,
particle Viterbi) in plain NumPy so the JAX implementations are checked
against an independent formulation, not against themselves.
"""

from __future__ import annotations

import numpy as np
from scipy import stats
from scipy.spatial.distance import cdist
from scipy.special import logsumexp


# ---------------------------------------------------------------- omnidir

def omni_project_np(K, xi, D, rvec, tvec, pts):
    import cv2

    R, _ = cv2.Rodrigues(np.asarray(rvec, np.float64))
    Xc = pts @ R.T + np.asarray(tvec)[None, :]
    Xs = Xc / np.linalg.norm(Xc, axis=1, keepdims=True)
    m = Xs[:, :2] / (Xs[:, 2:3] + xi)
    k1, k2, p1, p2 = D
    x, y = m[:, 0], m[:, 1]
    r2 = x * x + y * y
    rad = 1 + k1 * r2 + k2 * r2 * r2
    xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    u = K[0, 0] * xd + K[0, 1] * yd + K[0, 2]
    v = K[1, 1] * yd + K[1, 2]
    return np.stack([u, v], axis=1)


def omni_undistort_np(pts, K, D, xi, n_iter=20):
    """Pixel -> normalized pinhole coords on the z=1 plane (the semantics
    of cv2.omnidir.undistortPoints with R=eye(3)): invert the affine K,
    fixed-point-invert the radial/tangential distortion, lift to the Mei
    unit sphere, reproject to z=1."""
    K = np.asarray(K, np.float64)
    xi = float(np.asarray(xi).ravel()[0])
    k1, k2, p1, p2 = np.asarray(D, np.float64).ravel()[:4]
    pp = np.asarray(pts, np.float64).reshape(-1, 2)
    y = (pp[:, 1] - K[1, 2]) / K[1, 1]
    x = (pp[:, 0] - K[0, 2] - K[0, 1] * y) / K[0, 0]
    xu, yu = x.copy(), y.copy()
    for _ in range(n_iter):
        r2 = xu * xu + yu * yu
        rad = 1 + k1 * r2 + k2 * r2 * r2
        dx = 2 * p1 * xu * yu + p2 * (r2 + 2 * xu * xu)
        dy = p1 * (r2 + 2 * yu * yu) + 2 * p2 * xu * yu
        xu = (x - dx) / rad
        yu = (y - dy) / rad
    r2 = xu * xu + yu * yu
    a = r2 + 1.0
    b = 2.0 * xi * r2
    c = r2 * xi * xi - 1.0
    Zs = (-b + np.sqrt(b * b - 4 * a * c)) / (2 * a)
    s = Zs + xi
    return np.stack([xu * s / Zs, yu * s / Zs], axis=1)


class _OmnidirShim:
    """Stand-in for the cv2.omnidir contrib module (absent from this
    OpenCV build) with the two entry points the reference pipeline uses."""

    @staticmethod
    def undistortPoints(pts, K, D, xi, R):
        assert np.allclose(np.asarray(R), np.eye(3))
        out = omni_undistort_np(pts, K, D, xi)
        return out.reshape(-1, 1, 2)

    @staticmethod
    def projectPoints(p3d, rvec, tvec, K, xi, D):
        pts = omni_project_np(
            np.asarray(K, np.float64), float(np.asarray(xi).ravel()[0]),
            np.asarray(D, np.float64).ravel()[:4],
            np.asarray(rvec, np.float64).ravel(),
            np.asarray(tvec, np.float64).ravel(),
            np.asarray(p3d, np.float64).reshape(-1, 3),
        )
        return pts.reshape(-1, 1, 2), None


def install_cv2_omnidir_shim():
    """Give the reference code a working ``cv2.omnidir`` namespace."""
    import cv2

    if not hasattr(cv2, "omnidir"):
        cv2.omnidir = _OmnidirShim()


def install_numba_shim():
    """This environment ships no numba; the reference's aniposelib only
    uses ``@jit`` as an accelerator (``forceobj`` wrappers are plain
    Python, and the ``nopython`` ``triangulate_simple`` runs unchanged
    un-jitted), so a pass-through decorator preserves semantics."""
    import sys
    import types

    if "numba" in sys.modules:
        return

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]

        def deco(f):
            return f

        return deco

    m = types.ModuleType("numba")
    m.jit = jit
    m.njit = jit
    m.prange = range
    sys.modules["numba"] = m


def install_toml_shim():
    """This environment ships no ``toml`` package; back the reference's
    ``toml.load``/``toml.dump`` with stdlib ``tomllib`` for reading and
    macaque_tpu's writer (round-trips through tomllib) for writing."""
    import sys
    import types
    import tomllib

    from macaque_tpu.utils.tomlwriter import dumps_toml

    if "toml" in sys.modules:
        return

    def load(f):
        if isinstance(f, (str, bytes)):
            with open(f, "rb") as fh:
                return tomllib.load(fh)
        return tomllib.loads(f.read())

    def dump(obj, f):
        f.write(dumps_toml(obj))

    m = types.ModuleType("toml")
    m.load = load
    m.loads = tomllib.loads
    m.dump = dump
    m.dumps = dumps_toml
    sys.modules["toml"] = m


# -------------------------------------------------------------------- DLT

def triangulate_svd_np(points, pmats):
    """Homogeneous DLT via full SVD (aniposelib triangulate_simple math)."""
    A = []
    for (x, y), P in zip(points, pmats):
        A.append(x * P[2] - P[0])
        A.append(y * P[2] - P[1])
    A = np.asarray(A)
    _, _, vh = np.linalg.svd(A, full_matrices=True)
    v = vh[-1]
    return v[:3] / v[3]


def triangulate_pinv_np(points, pmats):
    """Inhomogeneous DLT via pinv (multicam_toolbox.triangulatePoints math)."""
    A = []
    for (x, y), P in zip(points, pmats):
        A.append(x * P[2] - P[0])
        A.append(y * P[2] - P[1])
    A = np.asarray(A)
    a, b = A[:, :3], A[:, 3]
    return -(np.linalg.pinv(a) @ b)


# ---------------------------------------------------------------- viterbi

def viterbi_path_np(points, scores, n_back=3, thres_dist=30.0):
    """Particle Viterbi, faithful NumPy restatement of the published
    anipose algorithm (dynamic shapes, used as test oracle only)."""
    n_frames = points.shape[0]
    num_points = np.sum(~np.isnan(points[:, :, 0]), axis=1)
    num_max = int(np.max(num_points))

    particles = np.zeros((n_frames, num_max * n_back + 1, 3))
    valid = np.zeros(n_frames, dtype=int)
    for i in range(n_frames):
        s = 0
        for j in range(n_back):
            if i - j < 0:
                break
            ixs = np.where(~np.isnan(points[i - j, :, 0]))[0]
            nv = len(ixs)
            particles[i, s : s + nv, :2] = points[i - j, ixs]
            particles[i, s : s + nv, 2] = scores[i - j, ixs] * 2.0 ** (-j)
            s += nv
        if s == 0:
            particles[i, 0] = [-1, -1, 0.001]
            s = 1
        valid[i] = s

    n_particles = int(np.max(valid))
    T_logprob = np.full((n_frames, n_particles), -np.inf)
    T_back = np.zeros((n_frames, n_particles), dtype=int)
    T_logprob[0, : valid[0]] = np.log(particles[0, : valid[0], 2])

    for i in range(1, n_frames):
        va, vb = valid[i - 1], valid[i]
        pa = particles[i - 1, :va, :2]
        pb = particles[i, :vb, :2]
        dists = cdist(pa, pb)
        hi = stats.norm.logcdf(dists + 2, scale=thres_dist)
        lo = stats.norm.logcdf(dists - 2, scale=thres_dist)
        P_trans = logsumexp(
            np.stack([hi, lo], axis=0).T, b=np.array([1, -1]), axis=2
        )
        P_trans[P_trans < -100] = -100
        P_trans[pb[:, 0] == -1, :] = np.log(0.001)
        P_trans[:, pa[:, 0] == -1] = np.log(0.001)
        possible = T_logprob[i - 1, :va] + P_trans
        T_logprob[i, :vb] = np.max(possible, axis=1) + np.log(
            particles[i, :vb, 2]
        )
        T_back[i, :vb] = np.argmax(possible, axis=1)

    out = np.zeros(n_frames, dtype=int)
    out[-1] = int(np.argmax(T_logprob[-1]))
    for i in range(n_frames - 1, 0, -1):
        out[i - 1] = T_back[i, out[i]]
    trace = np.array([particles[i, out[i]] for i in range(n_frames)])
    return trace[:, :2], trace[:, 2]


# ------------------------------------------------------------- UDP decode

def udp_decode_np(heatmaps, input_size, blur_kernel=11):
    """DARK-UDP decode restated in NumPy/cv2 (mmpose UDPHeatmap semantics):
    argmax, Gaussian blur w/ max rescale, log, one Newton step on the
    edge-padded map, scale by (input-1)/(heatmap-1)."""
    import cv2

    B, H, W, K = heatmaps.shape
    hm = np.transpose(heatmaps, (0, 3, 1, 2)).astype(np.float64).copy()
    kps = np.zeros((B, K, 2))
    vals = np.zeros((B, K))
    border = (blur_kernel - 1) // 2
    for b in range(B):
        for k in range(K):
            h = hm[b, k]
            idx = np.argmax(h)
            y, x = divmod(int(idx), W)
            vals[b, k] = h[y, x]
            omax = h.max()
            dr = np.zeros((H + 2 * border, W + 2 * border))
            dr[border:-border, border:-border] = h
            dr = cv2.GaussianBlur(dr, (blur_kernel, blur_kernel), 0)
            h2 = dr[border:-border, border:-border]
            h2 = h2 * omax / max(h2.max(), 1e-12)
            h2 = np.log(np.clip(h2, 1e-3, 50.0))
            p = np.pad(h2, 1, mode="edge")
            xi, yi = x + 1, y + 1
            dx = 0.5 * (p[yi, xi + 1] - p[yi, xi - 1])
            dy = 0.5 * (p[yi + 1, xi] - p[yi - 1, xi])
            dxx = p[yi, xi + 1] - 2 * p[yi, xi] + p[yi, xi - 1]
            dyy = p[yi + 1, xi] - 2 * p[yi, xi] + p[yi - 1, xi]
            dxy = 0.5 * (p[yi + 1, xi + 1] - p[yi, xi + 1] - p[yi + 1, xi]
                         + 2 * p[yi, xi] - p[yi, xi - 1] - p[yi - 1, xi]
                         + p[yi - 1, xi - 1])
            eps = np.finfo(np.float32).eps
            Hm = np.array([[dxx + eps, dxy], [dxy, dyy + eps]])
            off = -np.linalg.inv(Hm) @ np.array([dx, dy])
            kps[b, k] = [(x + off[0]) * (input_size[0] - 1) / (W - 1),
                         (y + off[1]) * (input_size[1] - 1) / (H - 1)]
    return kps, vals
