"""Stress variant of the end-to-end test: 3 animals, detection dropouts
and occasional missed cameras — exercises step3's trimming, stitching,
duplication cleanup and last-one assignment paths."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from macaque_tpu.pipeline.step1 import run_step1
from macaque_tpu.pipeline.step2 import run_step2
from macaque_tpu.pipeline.step3 import run_step3
from macaque_tpu.pipeline.step4 import run_step4
from macaque_tpu.pipeline.artifacts import read_pickle
from macaque_tpu.tools.synthetic import (
    make_test_rig, simulate_scene, project_scene, render_stores,
    SyntheticPerception,
)

N_ANIMAL = 3
N_FRAME = 100


@pytest.fixture(scope="module")
def stress_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("stress")
    raw = str(root / "videos")
    results = str(root / "results")
    rig = make_test_rig(4)
    kp3d = simulate_scene(N_ANIMAL, N_FRAME, seed=7)
    proj = project_scene(rig, kp3d)
    render_stores(raw, "synth", rig, proj)

    def factory(cam_name):
        idx = rig.camera_ids.index(cam_name)
        return SyntheticPerception(idx, proj, noise=1.5, seed=3,
                                   drop_prob=0.08)

    run_step1("synth", results, raw, factory)
    rd = os.path.join(results, "synth")
    run_step2(rd, rig)
    run_step3(rd, rig)
    run_step4(rd, rig)
    return dict(rd=rd, rig=rig, kp3d=kp3d)


def test_stress_3animals_with_dropouts(stress_run):
    out = read_pickle(os.path.join(stress_run["rd"], "kp3d.pickle"))
    kp3d = np.asarray(out["kp3d"])
    gt = stress_run["kp3d"]
    T3 = min(kp3d.shape[1], gt.shape[1])

    ok_animals = 0
    for a in range(N_ANIMAL):
        e = np.linalg.norm(kp3d[a, :T3] - gt[a, :T3], axis=-1)
        cov = np.isfinite(e).mean()
        med = np.nanmedian(e)
        if cov > 0.4 and med < 60.0:
            ok_animals += 1
    # under 8% dropouts all three animals should still be recovered
    assert ok_animals == N_ANIMAL, (
        [np.nanmedian(np.linalg.norm(kp3d[a, :T3] - gt[a, :T3], axis=-1))
         for a in range(N_ANIMAL)]
    )


def test_stress_with_device_tracker(tmp_path):
    """The same dropout scenario through the on-device tracker path."""
    raw = str(tmp_path / "videos")
    results = str(tmp_path / "results")
    rig = make_test_rig(4)
    kp3d = simulate_scene(2, 80, seed=17)
    proj = project_scene(rig, kp3d)
    render_stores(raw, "synth", rig, proj)

    def factory(cam_name):
        idx = rig.camera_ids.index(cam_name)
        return SyntheticPerception(idx, proj, noise=1.5, seed=9,
                                   drop_prob=0.08)

    run_step1("synth", results, raw, factory, use_device_tracker=True)
    rd = os.path.join(results, "synth")
    run_step2(rd, rig)
    run_step3(rd, rig)
    run_step4(rd, rig)
    out = read_pickle(os.path.join(rd, "kp3d.pickle"))
    kp = np.asarray(out["kp3d"])
    T3 = min(kp.shape[1], kp3d.shape[1])
    for a in range(2):
        e = np.linalg.norm(kp[a, :T3] - kp3d[a, :T3], axis=-1)
        assert np.nanmedian(e) < 60.0, np.nanmedian(e)
