"""End-to-end pipeline test on a synthetic 4-camera scene: steps 1-4 with
an oracle perception backend, checking 3D reconstruction + identity
accuracy against ground truth (the reference's north-star validation is
centroid precision/recall at 400mm — notebooks/validation_track3.ipynb)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from macaque_tpu.core.config import (
    PipelineConfig, CrossViewConfig, VALID_COLLAR_CLASSES,
)
from macaque_tpu.pipeline.step1 import run_step1
from macaque_tpu.pipeline.step2 import run_step2
from macaque_tpu.pipeline.step3 import run_step3
from macaque_tpu.pipeline.step4 import run_step4
from macaque_tpu.pipeline.artifacts import read_pickle, read_alldata
from macaque_tpu.tools.synthetic import (
    make_test_rig, simulate_scene, project_scene, render_stores,
    SyntheticPerception,
)

N_ANIMAL = 2
N_FRAME = 120


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    raw = str(root / "videos")
    results = str(root / "results")
    rig = make_test_rig(4)
    kp3d = simulate_scene(N_ANIMAL, N_FRAME, seed=1)
    proj = project_scene(rig, kp3d)
    render_stores(raw, "synth", rig, proj)
    return dict(raw=raw, results=results, rig=rig, kp3d=kp3d, proj=proj)


@pytest.fixture(scope="module")
def after_step1(scene):
    def factory(cam_name):
        idx = scene["rig"].camera_ids.index(cam_name)
        return SyntheticPerception(idx, scene["proj"], noise=1.0)

    run_step1("synth", scene["results"], scene["raw"], factory)
    return os.path.join(scene["results"], "synth")


def test_step1_outputs(scene, after_step1):
    rd = after_step1
    for cam_id in scene["rig"].camera_ids:
        data, fnums = read_alldata(os.path.join(rd, cam_id))
        assert len(data) == len(fnums) > 100
        # most frames should carry both animals
        counts = [len(fr) for fr in data]
        assert np.mean(np.asarray(counts) == N_ANIMAL) > 0.8
        det = data[10][0]
        assert len(det) == 8
        assert len(det[5]) == 17
        # collar ids get assigned with high confidence
        ids = {fr_det[6] for fr in data for fr_det in fr}
        assert ids <= set(VALID_COLLAR_CLASSES) | {-1}


@pytest.fixture(scope="module")
def after_step2(scene, after_step1):
    run_step2(after_step1, scene["rig"], CrossViewConfig())
    return after_step1


def test_step2_keyframes(scene, after_step2):
    mk = read_pickle(os.path.join(after_step2, "match_keyframe.pickle"))
    assert len(mk) > 5
    found = 0
    err_sum, err_n = 0.0, 0
    for kf in mk:
        f = kf["frame"]
        for p3d in kf["pose3d"]:
            # match against the nearest ground-truth animal
            gts = scene["kp3d"][:, f]  # (A, J, 3)
            d = [np.nanmean(np.linalg.norm(p3d - g, axis=1)) for g in gts]
            err = np.nanmin(d)
            err_sum += err
            err_n += 1
            found += 1
    assert found >= len(mk)  # at least ~1 animal/keyframe reconstructed
    assert err_sum / err_n < 25.0  # mm


@pytest.fixture(scope="module")
def after_step3(scene, after_step2):
    run_step3(after_step2, scene["rig"])
    return after_step2


def test_step3_tracks(scene, after_step3):
    kp2d = np.asarray(read_pickle(os.path.join(after_step3, "kp2d.pickle")))
    assert kp2d.shape[0] == 4 and kp2d.shape[2] == 4 and kp2d.shape[3] == 17
    # animals 0 and 1 (collar classes b, g) should have dense coverage
    coverage = (kp2d[..., 2] > 0).any(axis=(2, 3))  # (A, T)
    assert coverage[0].mean() > 0.5
    assert coverage[1].mean() > 0.5
    assert coverage[2].mean() < 0.1  # no third animal
    # identity correctness: per-animal 2D must match the right GT animal.
    # collar class VALID[a] was given to animal a in the synthetic scene.
    proj = scene["proj"]  # (C, A, T, J, 2)
    T3 = kp2d.shape[1]
    for a in range(N_ANIMAL):
        errs = []
        for t in range(0, T3, 7):
            for c in range(4):
                if kp2d[a, t, c, :, 2].max() <= 0:
                    continue
                d_same = np.nanmean(np.linalg.norm(
                    kp2d[a, t, c, :, :2] - proj[c, a, t], axis=1))
                errs.append(d_same)
        assert np.nanmedian(errs) < 8.0, f"animal {a} wrong 2D assignment"


@pytest.fixture(scope="module")
def after_step4(scene, after_step3):
    run_step4(after_step3, scene["rig"])
    return after_step3


def test_step4_kp3d(scene, after_step4):
    out = read_pickle(os.path.join(after_step4, "kp3d.pickle"))
    kp3d = np.asarray(out["kp3d"])
    gt = scene["kp3d"]
    T3 = min(kp3d.shape[1], gt.shape[1])
    errs = []
    for a in range(N_ANIMAL):
        e = np.linalg.norm(kp3d[a, :T3] - gt[a, :T3], axis=-1)
        errs.append(np.nanmedian(e))
    # regression pin: EVERY animal recovered to ~cm accuracy on CPU f64
    # (observed ~10-11 mm) — round-1 shipped an asymmetric 46 mm animal-0
    # outlier on TPU caused by default bf16 matmul passes in the geometry
    # path; the per-animal bound + symmetry check guard both failure modes
    assert max(errs) < 25.0, f"3D errors too large: {errs}"
    assert max(errs) < 2.5 * min(errs) + 5.0, (
        f"asymmetric per-animal errors (association/identity artifact): "
        f"{errs}")
    # scores/errors present
    assert out["kp3d_err"].shape == kp3d.shape[:3]
    assert out["kp3d_score"].shape == kp3d.shape[:3]


def test_visualize_renders(scene, after_step4):
    from macaque_tpu.tools.visualize import render_overlay

    path = render_overlay("synth", 0, after_step4, scene["raw"],
                          scene["rig"])
    assert path is not None and os.path.getsize(path) > 1000
