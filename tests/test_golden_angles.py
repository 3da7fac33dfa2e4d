"""Differential golden test: the REFERENCE's own anipose angle
machinery (/root/reference/src/third_party/anipose/compute_angles.py
``get_angles`` — flex / axis / cross-axis / Euler-chain decompositions)
against ``tools.angles.get_angles`` on identical 3D trajectories.
"""

import sys

import numpy as np

from macaque_tpu.tools.angles import get_angles

F = 200


def _import_reference_angles():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from tests.oracles import (
        install_cv2_omnidir_shim, install_numba_shim, install_toml_shim,
    )

    install_numba_shim()
    install_toml_shim()
    install_cv2_omnidir_shim()
    if "aniposelib" not in sys.modules:  # anipose/common.py absolute import
        from src.third_party import aniposelib as _al

        sys.modules["aniposelib"] = _al
    import src.third_party.anipose.compute_angles as ref_ca

    return ref_ca


def _vecs(seed=0):
    """Arm-like kinematic chain trajectories: smooth, never collinear."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 2 * np.pi, F)
    base = {
        "shoulder": np.stack([40 * np.cos(t), 40 * np.sin(t),
                              900 + 10 * np.sin(2 * t)], 1),
    }
    # each next joint hangs off the previous with a wandering offset
    offsets = {
        "elbow": np.stack([120 + 30 * np.sin(t), 60 * np.cos(1.3 * t),
                           -140 + 20 * np.sin(0.7 * t)], 1),
        "wrist": np.stack([90 * np.cos(0.9 * t), 110 + 25 * np.sin(2.1 * t),
                           -120 + 15 * np.cos(t)], 1),
        "finger": np.stack([50 + 10 * np.sin(3 * t), 40 * np.cos(0.5 * t),
                            -60 + 8 * np.sin(1.7 * t)], 1),
    }
    vecs = dict(base)
    prev = "shoulder"
    for k, off in offsets.items():
        vecs[k] = vecs[prev] + off + rng.normal(0, 1.0, (F, 3))
        prev = k
    return vecs


def test_golden_get_angles():
    ref_ca = _import_reference_angles()
    vecs = _vecs()
    spec = {
        "elbow_flex": ["flex", "shoulder", "elbow", "wrist"],
        "plain_triplet": ["shoulder", "elbow", "wrist"],
        "forearm_axis": ["axis", "shoulder", "elbow", "wrist"],
        "forearm_crossaxis": ["cross-axis", "shoulder", "elbow", "wrist"],
        "arm_chain": ["chain", "shoulder", "elbow/", "wrist", "finger"],
    }
    ref = ref_ca.get_angles(vecs, spec)
    got = get_angles(vecs, spec)
    assert set(ref.keys()) == set(got.keys())
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-8,
                                   err_msg=k)


def test_golden_chain_no_flip_marker():
    """Chain without the '/' sign flip, and a 3-joint minimal chain."""
    ref_ca = _import_reference_angles()
    vecs = _vecs(seed=3)
    for chain in (["chain", "shoulder", "elbow", "wrist", "finger"],
                  ["chain", "elbow", "wrist", "finger"]):
        ref = ref_ca.get_angles(vecs, {"c": chain})
        got = get_angles(vecs, {"c": chain})
        assert set(ref.keys()) == set(got.keys())
        for k in ref:
            np.testing.assert_allclose(got[k], ref[k], atol=1e-8,
                                       err_msg=k)
