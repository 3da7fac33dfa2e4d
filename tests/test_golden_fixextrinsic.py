"""Differential golden test for the post-BA re-anchoring utility
(reference ``fix_extrinsic_optim`` + ``applytransform``,
/root/reference/src/utils/multicam_toolbox.py:922-975) vs
``calib.workflow.fix_extrinsic_optim``.

This is an ASSERTED-DIVERGENCE golden: both restore the reference
camera's pre-BA pose exactly, but the reference composes the correction
on the LEFT (``M <- M_pre @ inv(M_post) @ M_cam``), which conjugates —
and therefore changes — the relative poses between cameras, while this
repo composes on the RIGHT (``M <- M_cam @ inv(M_post) @ M_pre``), the
world re-expression that provably preserves every relative pose:
``(M_i B)(M_j B)^-1 = M_i M_j^-1``. The test pins both behaviors so the
intentional deviation stays visible.
"""

import os
import shutil
import sys
import types

import numpy as np

from macaque_tpu.calib.workflow import fix_extrinsic_optim
from macaque_tpu.tools.synthetic import make_test_rig

N_CAM = 4


def _import_reference_mct():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests.oracles import install_cv2_omnidir_shim

    install_cv2_omnidir_shim()
    if not hasattr(np, "bool"):
        np.bool = bool
    if "imgstore" not in sys.modules:
        sys.modules["imgstore"] = types.ModuleType("imgstore")
    from src.utils import multicam_toolbox as mct

    # the reference ships applytransform/fix_extrinsic_optim DISABLED —
    # the file's tail is one module-level triple-quoted string
    # (mct:921-974). Execute that shipped block verbatim to obtain the
    # oracle functions.
    import cv2
    import h5py
    import yaml

    with open(mct.__file__) as f:
        src = f.read()
    block = src.rsplit('"""', 2)[1]
    assert "def fix_extrinsic_optim" in block
    ns = {"cv2": cv2, "np": np, "yaml": yaml, "h5py": h5py, "os": os}
    exec(block, ns)  # noqa: S102 — reference oracle code
    mct_tail = types.SimpleNamespace(
        applytransform=ns["applytransform"],
        fix_extrinsic_optim=ns["fix_extrinsic_optim"],
    )
    return mct_tail


def _write_problem(base, rig, rv_pre, tv_pre, rv_post, tv_post):
    import h5py
    import yaml

    os.makedirs(base, exist_ok=True)
    cfg_path = os.path.join(base, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"camera_id": [str(c) for c in rig.camera_ids]}, f)
    with h5py.File(os.path.join(base, "cam_extrinsic.h5"), "w") as f:
        for i, cid in enumerate(rig.camera_ids):
            f[f"/{cid}/rvec"] = rv_pre[i].reshape(3, 1)
            f[f"/{cid}/tvec"] = tv_pre[i].reshape(3, 1)
    with h5py.File(os.path.join(base, "cam_extrinsic_optim.h5"), "w") as f:
        for i, cid in enumerate(rig.camera_ids):
            # optimize_extrinsic writes rvec raveled (3,) and tvec (3,1)
            # (mct:617-624); the disabled fixer assigns back in exactly
            # those shapes
            f[f"/{cid}/rvec"] = rv_post[i].ravel()
            f[f"/{cid}/tvec"] = tv_post[i].reshape(3, 1)
    return cfg_path


def _read_optim(base, ids):
    import h5py

    rv, tv = [], []
    with h5py.File(os.path.join(base, "cam_extrinsic_optim.h5"), "r") as f:
        for cid in ids:
            rv.append(np.asarray(f[f"/{cid}/rvec"]).ravel())
            tv.append(np.asarray(f[f"/{cid}/tvec"]).ravel())
    return np.stack(rv), np.stack(tv)


def _M(rv, tv):
    import cv2

    M = np.eye(4)
    M[:3, :3] = cv2.Rodrigues(np.asarray(rv, float))[0]
    M[:3, 3] = np.asarray(tv, float).ravel()
    return M


def test_golden_fix_extrinsic_optim(tmp_path, capsys):
    mct = _import_reference_mct()
    rig = make_test_rig(N_CAM, seed=9)
    rng = np.random.default_rng(2)

    rv_pre = np.asarray(rig.rvec)
    tv_pre = np.asarray(rig.tvec)
    # post-BA: the whole rig drifted by a global transform + small noise,
    # exactly the gauge drift fix_extrinsic_optim exists to undo
    drift = _M(rng.normal(0, 0.05, 3), rng.normal(0, 40.0, 3))
    rv_post = np.empty_like(rv_pre)
    tv_post = np.empty_like(tv_pre)
    import cv2

    for i in range(N_CAM):
        Mi = _M(rv_pre[i], tv_pre[i]) @ drift
        rv_post[i] = cv2.Rodrigues(Mi[:3, :3])[0].ravel()
        tv_post[i] = Mi[:3, 3]

    ids = [str(c) for c in rig.camera_ids]
    base_ref = str(tmp_path / "ref")
    base_our = str(tmp_path / "ours")
    cfg_ref = _write_problem(base_ref, rig, rv_pre, tv_pre, rv_post, tv_post)
    cfg_our = _write_problem(base_our, rig, rv_pre, tv_pre, rv_post, tv_post)

    mct.fix_extrinsic_optim(cfg_ref, ref=0)
    fix_extrinsic_optim(cfg_our, ref=0, verbose=False)
    capsys.readouterr()  # swallow the reference's before/after prints

    rv_r, tv_r = _read_optim(base_ref, ids)
    rv_o, tv_o = _read_optim(base_our, ids)

    # both must restore the anchor camera's pre-BA pose exactly
    np.testing.assert_allclose(rv_r[0], rv_pre[0], atol=1e-9)
    np.testing.assert_allclose(tv_r[0], tv_pre[0], atol=1e-6)
    np.testing.assert_allclose(rv_o[0], rv_pre[0], atol=1e-9)
    np.testing.assert_allclose(tv_o[0], tv_pre[0], atol=1e-6)

    # ours must undo the pure-gauge drift for EVERY camera (relative
    # poses preserved => with cam0 re-anchored, all cameras return).
    # Compare poses as matrices: a camera at theta = pi has a genuinely
    # sign-ambiguous rvec (R(pi, v) = R(pi, -v))
    for i in range(N_CAM):
        np.testing.assert_allclose(_M(rv_o[i], tv_o[i]),
                                   _M(rv_pre[i], tv_pre[i]), atol=1e-6)

    # the reference's left-composition conjugates the relative poses:
    # pin the divergence so it stays a documented, deliberate deviation
    rel_pre = _M(rv_pre[1], tv_pre[1]) @ np.linalg.inv(
        _M(rv_pre[0], tv_pre[0]))
    rel_ref = _M(rv_r[1], tv_r[1]) @ np.linalg.inv(_M(rv_r[0], tv_r[0]))
    assert np.abs(rel_ref - rel_pre).max() > 1e-3, \
        "reference unexpectedly preserved relative poses — revisit " \
        "workflow.fix_extrinsic_optim's divergence note"


def test_golden_applytransform(tmp_path):
    """Our make_M/get_rtvec composition helpers match the reference's
    applytransform for both inv settings."""
    mct = _import_reference_mct()
    from macaque_tpu.calib.graph_init import get_rtvec, make_M

    rng = np.random.default_rng(4)
    for inv in (False, True):
        r1, t1 = rng.normal(0, 0.6, 3), rng.normal(0, 300, 3)
        r2, t2 = rng.normal(0, 0.6, 3), rng.normal(0, 300, 3)
        rv_ref, tv_ref = mct.applytransform(
            r1.reshape(3, 1), t1.reshape(3, 1),
            r2.reshape(3, 1), t2.reshape(3, 1), inv=inv)
        M1 = make_M(r1, t1)
        if inv:
            M1 = np.linalg.inv(M1)
        rv, tv = get_rtvec(M1 @ make_M(r2, t2))
        np.testing.assert_allclose(rv, rv_ref.ravel(), atol=1e-9)
        np.testing.assert_allclose(tv, tv_ref.ravel(), atol=1e-7)
