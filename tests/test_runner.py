"""run_pipeline end-to-end: orchestration, run manifest, overlay render."""

import json
import os

import numpy as np
import pytest

from macaque_tpu.core.config import PipelineConfig
from macaque_tpu.pipeline.runner import run_pipeline
from macaque_tpu.tools.synthetic import (
    make_test_rig, simulate_scene, project_scene, render_stores,
    SyntheticPerception,
)


@pytest.mark.slow
def test_run_pipeline_manifest_and_render(tmp_path):
    raw = str(tmp_path / "videos")
    results = str(tmp_path / "results")
    rig = make_test_rig(4)
    kp3d = simulate_scene(2, 70, seed=31)
    proj = project_scene(rig, kp3d)
    render_stores(raw, "synth", rig, proj)

    def factory(cam_name):
        idx = rig.camera_ids.index(cam_name)
        return SyntheticPerception(idx, proj, noise=1.0)

    cfg = PipelineConfig(data_name="synth", results_dir=results,
                         raw_data_dir=raw)
    rd = run_pipeline(cfg, rig, factory, render=True, render_cams=[0])

    # all stage artifacts + manifest + overlay exist
    for f in ("match_keyframe.pickle", "kp2d.pickle", "kp3d.pickle",
              "config.toml", "calibration.toml", "run_manifest.json"):
        assert os.path.exists(os.path.join(rd, f)), f
    assert os.path.getsize(
        os.path.join(rd, f"overlay_{rig.camera_ids[0]}.mp4")) > 1000
    with open(os.path.join(rd, "run_manifest.json")) as f:
        manifest = json.load(f)
    assert set(manifest) >= {"step1_2d", "step2_crossview",
                             "step3_crossframe", "step4_3d", "render"}
    assert all(v["total_s"] >= 0 for v in manifest.values())


def test_demo_entry_signatures_match_reference():
    """run_demo.proc / run_demo_2.proc keep the reference-compatible
    signature (reference run_demo.py:21-39): callers of the original
    orchestrators can switch without edits."""
    import importlib.util
    import inspect
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    want = ["data_name", "fps", "results_dir_root", "device_str",
            "config_path", "raw_data_dir", "n_kp"]
    for name in ("run_demo", "run_demo_2"):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(root, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        params = list(inspect.signature(mod.proc).parameters)
        assert params[:len(want)] == want, (name, params)
