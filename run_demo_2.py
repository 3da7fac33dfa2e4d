#!/usr/bin/env python
"""Demo entry variant — API-compatible with the reference's run_demo_2.py
(same ``proc`` signature; renders a single camera with the richer v2
skeleton style instead of all cameras; reference run_demo_2.py:21-58).
"""

from __future__ import annotations

import os

from macaque_tpu.pipeline.weights import build_flax_perception


def proc(data_name, fps, results_dir_root, device_str, config_path,
         raw_data_dir, n_kp=17, render_cam=2):
    from macaque_tpu.cameras.rig import CameraRig
    from macaque_tpu.core.config import PipelineConfig
    from macaque_tpu.pipeline.runner import run_pipeline
    from macaque_tpu.tools.visualize import render_overlay

    cfg = PipelineConfig.from_yaml(
        config_path, data_name=data_name, fps=fps,
        results_dir=results_dir_root, raw_data_dir=raw_data_dir, n_kp=n_kp,
    )
    rig = CameraRig.from_h5(config_path)
    perception = build_flax_perception(
        os.environ.get("MACAQUE_TPU_WEIGHTS", "./model"))

    result_dir = run_pipeline(cfg, rig, perception, render=False)
    render_overlay(data_name, render_cam, result_dir, raw_data_dir, rig,
                   fps=fps, style="v2")
    return result_dir


if __name__ == "__main__":
    proc("example", 24, "./results3D", "tpu", "./calib/config.yaml",
         "./videos")
