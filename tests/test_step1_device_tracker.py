"""step1 with the fully on-device tracker vs the host tracker: same
synthetic scene, equivalent alldata outputs."""

import json
import os

import numpy as np

from macaque_tpu.pipeline.step1 import run_step1
from macaque_tpu.pipeline.artifacts import read_alldata
from macaque_tpu.tools.synthetic import (
    make_test_rig, simulate_scene, project_scene, render_stores,
    SyntheticPerception,
)


def test_device_tracker_step1_equivalent(tmp_path):
    raw = str(tmp_path / "videos")
    rig = make_test_rig(2)  # two cameras keep it quick
    kp3d = simulate_scene(2, 60, seed=21)
    proj = project_scene(rig, kp3d)
    render_stores(raw, "synth", rig, proj)

    def factory(cam_name):
        idx = rig.camera_ids.index(cam_name)
        return SyntheticPerception(idx, proj, noise=1.0, seed=5)

    res_host = str(tmp_path / "host")
    res_dev = str(tmp_path / "dev")
    run_step1("synth", res_host, raw, factory)
    run_step1("synth", res_dev, raw, factory, use_device_tracker=True)

    for cam in rig.camera_ids:
        dh, fh = read_alldata(os.path.join(res_host, "synth", cam))
        dd, fd = read_alldata(os.path.join(res_dev, "synth", cam))
        assert len(dh) == len(dd)
        np.testing.assert_array_equal(fh, fd)
        n_same = 0
        n_frames = 0
        for rh, rd in zip(dh, dd):
            n_frames += 1
            if len(rh) == len(rd):
                # same box geometry regardless of slot order
                bh = sorted(tuple(r[1:5]) for r in rh)
                bd = sorted(tuple(r[1:5]) for r in rd)
                close = all(
                    max(abs(a - b) for a, b in zip(x, y)) < 3.0
                    for x, y in zip(bh, bd)
                )
                n_same += close
        assert n_same / max(n_frames, 1) > 0.9, f"cam {cam}"
