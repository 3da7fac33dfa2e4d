"""Full 4-animal capacity through steps 2-4 (all collar classes used;
alldata injected directly for speed)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from macaque_tpu.pipeline.artifacts import write_alldata, read_pickle
from macaque_tpu.pipeline.step2 import run_step2
from macaque_tpu.pipeline.step3 import run_step3
from macaque_tpu.pipeline.step4 import run_step4
from macaque_tpu.tools.synthetic import make_test_rig, simulate_scene
from tests.test_eight_cameras import synth_alldata


@pytest.fixture(scope="module")
def four_animal_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("four")
    rig = make_test_rig(4, seed=2)
    kp3d = simulate_scene(4, 90, seed=13)
    alldata = synth_alldata(rig, kp3d, noise=1.0, seed=1)
    rd = str(root / "results" / "s")
    for c, cam_id in enumerate(rig.camera_ids):
        write_alldata(os.path.join(rd, cam_id), alldata[c],
                      np.arange(90, dtype=np.int32))
    run_step2(rd, rig)
    run_step3(rd, rig)
    run_step4(rd, rig)
    return dict(rd=rd, kp3d=kp3d)


def test_four_animals_recovered_with_identity(four_animal_run):
    out = read_pickle(os.path.join(four_animal_run["rd"], "kp3d.pickle"))
    kp3d = np.asarray(out["kp3d"])
    gt = four_animal_run["kp3d"]
    T3 = min(kp3d.shape[1], gt.shape[1])
    errs = []
    for a in range(4):
        e = np.linalg.norm(kp3d[a, :T3] - gt[a, :T3], axis=-1)
        errs.append(float(np.nanmedian(e)))
    # all four animals present under the correct identity
    assert all(np.isfinite(errs)), errs
    assert max(errs) < 30.0, errs
