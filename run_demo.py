#!/usr/bin/env python
"""Demo entry point — API-compatible with the reference's run_demo.py
(proc(data_name, fps, results_dir_root, device_str, config_path,
raw_data_dir, n_kp); reference run_demo.py:21-55).

Two modes:
  * real data: point --raw at imgstore directories + --config at a
    calib/config.yaml with cam_intrinsic.h5 / cam_extrinsic_optim.h5 and
    provide converted model weights (see macaque_tpu/nn/convert.py)
  * --synthetic: generate a synthetic 4-camera recording with
    ground-truth-driven perception (no weights needed) and run the full
    pipeline on it end-to-end; reports 3D error vs ground truth.
"""

from __future__ import annotations

import argparse
import os


def proc(data_name, fps, results_dir_root, device_str, config_path,
         raw_data_dir, n_kp=17, render=True):
    """Reference-compatible entry: run steps 1-4 + render for a recording
    using real calibration + converted weights."""
    from macaque_tpu.cameras.rig import CameraRig
    from macaque_tpu.core.config import PipelineConfig
    from macaque_tpu.pipeline.runner import run_pipeline
    from macaque_tpu.pipeline.perception import FlaxPerception

    cfg = PipelineConfig.from_yaml(
        config_path, data_name=data_name, fps=fps,
        results_dir=results_dir_root, raw_data_dir=raw_data_dir, n_kp=n_kp,
    )
    rig = CameraRig.from_h5(config_path)

    weights_dir = os.environ.get("MACAQUE_TPU_WEIGHTS", "./model")
    perception = build_flax_perception(weights_dir)
    return run_pipeline(cfg, rig, perception, render=render)


# Kept as a top-level alias for script users; the implementation lives in
# the package so package modules never import this script by name (a bare
# ``import run_demo`` is shadowed when the reference repo is on sys.path).
from macaque_tpu.pipeline.weights import build_flax_perception  # noqa: E402,F401


def run_synthetic(root: str, n_frame: int = 120, render: bool = True):
    import numpy as np

    from macaque_tpu.tools.synthetic import (
        make_test_rig, simulate_scene, project_scene, render_stores,
        SyntheticPerception,
    )
    from macaque_tpu.pipeline.step1 import run_step1
    from macaque_tpu.pipeline.step2 import run_step2
    from macaque_tpu.pipeline.step3 import run_step3
    from macaque_tpu.pipeline.step4 import run_step4
    from macaque_tpu.pipeline.artifacts import read_pickle
    from macaque_tpu.tools.visualize import render_overlay

    raw = os.path.join(root, "videos")
    results = os.path.join(root, "results3D")
    rig = make_test_rig(4)
    kp3d_gt = simulate_scene(2, n_frame, seed=1)
    proj = project_scene(rig, kp3d_gt)
    if not os.path.exists(os.path.join(raw, "synth.10000")):
        print("[demo] rendering synthetic 4-camera recording...")
        render_stores(raw, "synth", rig, proj)

    def factory(cam_name):
        idx = rig.camera_ids.index(cam_name)
        return SyntheticPerception(idx, proj, noise=1.0)

    run_step1("synth", results, raw, factory)
    rd = os.path.join(results, "synth")
    run_step2(rd, rig)
    run_step3(rd, rig)
    run_step4(rd, rig)
    if render:
        render_overlay("synth", 0, rd, raw, rig)

    out = read_pickle(os.path.join(rd, "kp3d.pickle"))
    kp3d = np.asarray(out["kp3d"])
    T = min(kp3d.shape[1], kp3d_gt.shape[1])
    for a in range(2):
        e = np.linalg.norm(kp3d[a, :T] - kp3d_gt[a, :T], axis=-1)
        print(f"[demo] animal {a}: median 3D error "
              f"{np.nanmedian(e):.2f} mm over {T} frames")
    print(f"[demo] results in {rd}")
    return rd


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true",
                    help="run the weight-free synthetic end-to-end demo")
    ap.add_argument("--root", default="./demo_out")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--no-render", action="store_true")
    ap.add_argument("--data", default="example")
    ap.add_argument("--fps", type=float, default=24.0)
    ap.add_argument("--results", default="./results3D")
    ap.add_argument("--config", default="./calib/config.yaml")
    ap.add_argument("--raw", default="./videos")
    args = ap.parse_args()

    if args.synthetic:
        run_synthetic(args.root, args.frames, render=not args.no_render)
    else:
        proc(args.data, args.fps, args.results, "tpu", args.config,
             args.raw, render=not args.no_render)
