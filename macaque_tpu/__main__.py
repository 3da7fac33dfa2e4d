"""Umbrella CLI: ``python -m macaque_tpu <command>``.

Anipose-style subcommand surface (the reference vendors a click CLI,
src/third_party/anipose/anipose.py:110-365) over this framework's stages
and tools.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="macaque_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_common(sp):
        sp.add_argument("--data", default="example")
        sp.add_argument("--results", default="./results3D")
        sp.add_argument("--raw", default="./videos")
        sp.add_argument("--config", default="./calib/config.yaml")
        sp.add_argument("--redo", action="store_true")

    for name in ("step1", "step2", "step3", "step4", "render", "pipeline"):
        sp = sub.add_parser(name)
        add_common(sp)
        if name == "step1":
            sp.add_argument("--weights", default="./model")
            sp.add_argument("--fps", type=float, default=24.0)
        if name == "render":
            sp.add_argument("--cam", type=int, default=0)
            sp.add_argument("--style", choices=("v1", "v2"), default="v1")
        if name == "pipeline":
            sp.add_argument("--weights", default="./model")
            sp.add_argument("--fps", type=float, default=24.0)

    sp = sub.add_parser("validate")
    sp.add_argument("kp3d_pickle")
    sp.add_argument("gt_pickle")
    sp.add_argument("--threshold", type=float, default=400.0)

    sp = sub.add_parser("angles")
    sp.add_argument("kp3d_pickle")
    sp.add_argument("--out", default="angles.npz")

    sp = sub.add_parser("plots")
    sp.add_argument("kp3d_pickle")
    sp.add_argument("--out", default="./plots")
    sp.add_argument("--fps", type=float, default=24.0)

    sp = sub.add_parser(
        "pose2d", help="2D-only detect+pose skeleton overlay on a plain "
        "video (reference run_2D notebook). NOTE: no tracking/ID — "
        "boxes are per-frame; use `step1` for the tracked 2D pipeline")
    sp.add_argument("video")
    sp.add_argument("--out", default="pose2d.mp4")
    sp.add_argument("--weights", default=None,
                    help="converted weights dir (default "
                    "$MACAQUE_TPU_WEIGHTS)")
    sp.add_argument("--det-thr", type=float, default=0.85)
    sp.add_argument("--max-frames", type=int, default=None)

    sp = sub.add_parser(
        "eval-coco", help="COCO-dataset detector/pose AP eval "
        "(det_pose_optim notebook flow)")
    sp.add_argument("--ann", required=True,
                    help="COCO annotation json")
    sp.add_argument("--images", required=True, help="images dir")
    sp.add_argument("--weights", default=None)
    sp.add_argument("--det-thr", type=float, default=0.85)
    sp.add_argument("--max-images", type=int, default=None)

    sp = sub.add_parser("convert-weights")
    sp.add_argument("--weights", default="./model",
                    help="dir with detection/pose/id .pth checkpoints")
    sp.add_argument("--cache", default="./model/cache")

    # anipose-style session workflows (project config.toml driven)
    for name in ("triangulate-session", "project-2d", "label-videos",
                 "session-angles", "tracking-errors", "label-3d",
                 "label-proj", "label-combined", "convert-videos",
                 "calibration-errors", "report", "filter-2d",
                 "filter-3d", "train-autoencoder",
                 "label-filter-compare", "calibrate-session"):
        sp = sub.add_parser(name)
        sp.add_argument("--config", default="config.toml",
                        help="anipose project config.toml")
        if name == "tracking-errors":
            sp.add_argument("--labeled", default="labeled-data")
        if name == "report":
            sp.add_argument("--out", default=None,
                            help="report output dir (default "
                            "<project>/report)")

    sp = sub.add_parser(
        "extract-frames", help="mine worst/best/random frames for "
        "relabeling (anipose extract_frames)")
    sp.add_argument("--config", default="config.toml")
    sp.add_argument("--mode", default="bad",
                    choices=("bad", "good", "random"))
    sp.add_argument("--num", type=int, default=250)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--spacing", type=int, default=10,
                    help="min frames between picks of one video")

    sp = sub.add_parser(
        "pose-videos", help="run the 2D pose stack over raw session "
        "videos missing pose-2d files (anipose pose_videos)")
    sp.add_argument("--config", default="config.toml")
    sp.add_argument("--weights", default=None)

    sp = sub.add_parser(
        "sweep", help="tracker hyperparameter sweep on the synthetic "
                      "scene (tracking_evaluation notebook harness)")
    sp.add_argument("--out", default="./results3D_sweep")
    sp.add_argument("--frames", type=int, default=96)
    sp.add_argument("--cams", type=int, default=4)

    sp = sub.add_parser("summarize")
    sp.add_argument("what", choices=("pose3d", "pose3d-filtered",
                                     "pose2d", "pose2d-filtered",
                                     "angles", "errors"))
    sp.add_argument("--config", default="config.toml")

    sp = sub.add_parser(
        "label-cage", help="interactively click cage keypoints per "
        "camera (needs a display; writes cagepoints_annotation.h5)")
    sp.add_argument("config", help="path to calib config.yaml")

    sp = sub.add_parser(
        "calibrate",
        help="calibrate the rig from recorded board/marker videos "
             "(multicam_toolbox workflow)")
    sp.add_argument("config", help="path to calib config.yaml")
    sp.add_argument("--step", default="all",
                    choices=("all", "chessboard", "intrinsic",
                             "cage-extrinsic", "marker", "cube",
                             "optimize", "optimize-full", "fix"))
    sp.add_argument("--marker-mode", default="cube",
                    choices=("cube", "marker"))
    sp.add_argument("--frame-intv", type=int, default=5)
    sp.add_argument("--fps", type=float, default=24.0)
    sp.add_argument("--ref", type=int, default=0,
                    help="reference camera for the 'fix' step")

    args = p.parse_args(argv)

    from macaque_tpu.cameras.rig import CameraRig
    from macaque_tpu.core.config import PipelineConfig

    def rig_and_cfg():
        cfg = PipelineConfig.from_yaml(
            args.config, data_name=args.data,
            results_dir=args.results, raw_data_dir=args.raw,
        )
        return CameraRig.from_h5(args.config), cfg

    result_dir = None
    if hasattr(args, "results"):
        result_dir = os.path.join(args.results, args.data)

    if args.cmd == "step1":
        from macaque_tpu.pipeline.weights import build_flax_perception
        from macaque_tpu.pipeline.step1 import run_step1

        run_step1(args.data, args.results, args.raw,
                  build_flax_perception(args.weights), fps=args.fps,
                  redo=args.redo)
    elif args.cmd == "step2":
        from macaque_tpu.pipeline.step2 import run_step2

        rig, cfg = rig_and_cfg()
        run_step2(result_dir, rig, cfg.cross_view, redo=args.redo)
    elif args.cmd == "step3":
        from macaque_tpu.pipeline.step3 import run_step3

        rig, cfg = rig_and_cfg()
        run_step3(result_dir, rig, cfg.cross_frame, redo=args.redo)
    elif args.cmd == "step4":
        from macaque_tpu.pipeline.step4 import run_step4

        rig, cfg = rig_and_cfg()
        run_step4(result_dir, rig, pipeline_cfg=cfg,
                  filter_cfg=cfg.filter, tri_cfg=cfg.triangulation,
                  redo=args.redo)
    elif args.cmd == "render":
        from macaque_tpu.tools.visualize import render_overlay

        rig, cfg = rig_and_cfg()
        render_overlay(args.data, args.cam, result_dir, args.raw, rig,
                       style=args.style)
    elif args.cmd == "pipeline":
        sys.path.insert(0, os.getcwd())
        from run_demo import proc

        proc(args.data, args.fps, args.results, "tpu", args.config,
             args.raw)
    elif args.cmd == "validate":
        from macaque_tpu.tools.validation import validate_kp3d_file

        r = validate_kp3d_file(args.kp3d_pickle, args.gt_pickle,
                               args.threshold)
        print(r)
    elif args.cmd == "angles":
        import numpy as np
        from macaque_tpu.pipeline.artifacts import read_pickle
        from macaque_tpu.tools.angles import compute_angles

        kp3d = np.asarray(read_pickle(args.kp3d_pickle)["kp3d"])
        np.savez(args.out, **compute_angles(kp3d))
        print(f"wrote {args.out}")
    elif args.cmd == "plots":
        from macaque_tpu.tools.plots import plot_all

        for p in plot_all(args.kp3d_pickle, args.out, args.fps):
            print(f"wrote {p}")
    elif args.cmd == "pose2d":
        import os

        from macaque_tpu.tools.run2d import render_2d_video

        weights = args.weights or os.environ.get("MACAQUE_TPU_WEIGHTS",
                                                 "./model")
        from macaque_tpu.pipeline.weights import build_flax_perception

        perception = build_flax_perception(weights)
        out = render_2d_video(args.video, args.out, perception,
                              det_thr=args.det_thr,
                              max_frames=args.max_frames)
        print(out)
    elif args.cmd == "sweep":
        from macaque_tpu.tools.sweep import rank_sweep, run_synthetic_sweep

        log = run_synthetic_sweep(args.out, n_frame=args.frames,
                                  n_cam=args.cams)
        print(f"wrote {log}")
        for row in rank_sweep(log):
            print(row)
    elif args.cmd in ("triangulate-session", "project-2d",
                      "label-videos", "session-angles",
                      "tracking-errors", "summarize", "label-3d",
                      "label-proj", "label-combined", "convert-videos",
                      "calibration-errors", "report", "extract-frames",
                      "pose-videos", "filter-2d", "filter-3d",
                      "train-autoencoder", "label-filter-compare",
                      "calibrate-session"):
        from macaque_tpu.tools import session as ses
        from macaque_tpu.tools import session_extras as sx

        config = ses.load_session_config(args.config)
        if args.cmd == "triangulate-session":
            out = ses.triangulate_all(config)
        elif args.cmd == "filter-2d":
            out = ses.filter_pose_2d_all(config)
        elif args.cmd == "filter-3d":
            out = ses.filter_pose_3d_all(config)
        elif args.cmd == "train-autoencoder":
            out = {(): [ses.train_autoencoder_project(config)]}
        elif args.cmd == "label-filter-compare":
            out = sx.label_filter_compare_all(config)
        elif args.cmd == "calibrate-session":
            out = {k: ([v] if v else [])
                   for k, v in ses.calibrate_all(config).items()}
        elif args.cmd == "project-2d":
            out = ses.project_2d_all(config)
        elif args.cmd == "label-videos":
            out = ses.label_videos_all(config)
        elif args.cmd == "session-angles":
            out = ses.angles_all(config)
        elif args.cmd == "label-3d":
            out = sx.label_videos_3d_all(config)
        elif args.cmd == "label-proj":
            out = sx.label_videos_proj_all(config)
        elif args.cmd == "label-combined":
            out = sx.label_combined_all(config)
        elif args.cmd == "convert-videos":
            out = sx.convert_videos_all(config)
        elif args.cmd == "calibration-errors":
            out = sx.calibration_errors_all(config)
        elif args.cmd == "extract-frames":
            out = {(): sx.extract_frames(config, mode=args.mode,
                                         num_frames_pick=args.num,
                                         seed=args.seed,
                                         spacing=args.spacing)}
        elif args.cmd == "pose-videos":
            from macaque_tpu.pipeline.weights import build_flax_perception

            weights = args.weights or os.environ.get(
                "MACAQUE_TPU_WEIGHTS", "./model")
            out = sx.pose_videos_all(config,
                                     build_flax_perception(weights))
        elif args.cmd == "report":
            from macaque_tpu.tools.report import generate_report

            out = {(): [generate_report(config, args.out)]}
        elif args.cmd == "tracking-errors":
            out = {(): [ses.get_tracking_errors(config,
                                                labeled_dir=args.labeled)]}
        else:
            fn = {
                "pose3d": ses.summarize_pose3d,
                "pose3d-filtered": ses.summarize_pose3d_filtered,
                "pose2d": ses.summarize_pose2d,
                "pose2d-filtered": ses.summarize_pose2d_filtered,
                "angles": ses.summarize_angles,
                "errors": ses.summarize_errors,
            }[args.what]
            out = {(): [fn(config)]}
        for files in out.values():
            for f in files or ():
                print(f"wrote {f}")
    elif args.cmd == "eval-coco":
        import json as _json

        from macaque_tpu.pipeline.weights import build_flax_perception
        from macaque_tpu.tools.coco_eval import run_coco_eval

        weights = args.weights or os.environ.get("MACAQUE_TPU_WEIGHTS",
                                                 "./model")
        res = run_coco_eval(build_flax_perception(weights), args.images,
                            args.ann, det_thr=args.det_thr,
                            max_images=args.max_images)
        print(_json.dumps(res))
    elif args.cmd == "label-cage":
        from macaque_tpu.calib.labeler import label_cage_keypoints

        print(label_cage_keypoints(args.config))
    elif args.cmd == "calibrate":
        from macaque_tpu.calib import workflow as wf

        if args.step == "all":
            wf.calibrate_from_videos(
                args.config, marker_mode=args.marker_mode,
                frame_intv=args.frame_intv, fps=args.fps)
        elif args.step == "chessboard":
            wf.analyze_chessboard_videos(args.config,
                                         frame_intv=args.frame_intv)
        elif args.step == "intrinsic":
            wf.calibrate_intrinsics_driver(args.config)
        elif args.step == "cage-extrinsic":
            wf.get_extrinsics_from_cage_keypoints(args.config)
        elif args.step == "marker":
            wf.analyze_aruco_marker_videos(args.config)
        elif args.step == "cube":
            wf.analyze_aruco_cube_videos(args.config,
                                         frame_intv=args.frame_intv,
                                         fps=args.fps)
        elif args.step == "optimize":
            wf.optimize_extrinsics_driver(args.config)
        elif args.step == "optimize-full":
            wf.optimize_all_camera_params_driver(args.config)
        elif args.step == "fix":
            wf.fix_extrinsic_optim(args.config, ref=args.ref)
    elif args.cmd == "convert-weights":
        from macaque_tpu.nn.checkpoint import convert_and_cache
        from macaque_tpu.nn.convert import (
            convert_swin_maskrcnn, convert_vitpose, convert_resnet,
        )

        jobs = [
            ("detection/detection.pth", convert_swin_maskrcnn),
            ("pose/pose.pth", convert_vitpose),
            ("id/id_finetuned.pth", convert_resnet),
            ("id/id_mff1y.pth", convert_resnet),
        ]
        for rel, conv in jobs:
            p = os.path.join(args.weights, rel)
            if os.path.exists(p):
                convert_and_cache(p, conv, args.cache)
                print(f"converted {rel}")
            else:
                print(f"missing {rel} (skipped)")


if __name__ == "__main__":
    main()
