"""Top-level pipeline orchestration (the run_demo.py equivalent).

``run_pipeline`` chains steps 1-4 + rendering with the same resumable
artifact protocol as the reference (run_demo.py:21-39).
"""

from __future__ import annotations

import os
from typing import Optional

from macaque_tpu.cameras.rig import CameraRig
from macaque_tpu.core.config import PipelineConfig


def run_pipeline(
    config: PipelineConfig,
    rig: CameraRig,
    perception,
    render: bool = True,
    render_cams: Optional[list[int]] = None,
    redo: bool = False,
    mesh=None,
) -> str:
    """Run detect/track/pose/ID -> cross-view -> cross-frame -> 3D ->
    render for one recording. Returns the result directory.

    ``mesh`` (a ``jax.sharding.Mesh``) runs every stage's device
    programs SPMD over the mesh: batch axes sharded across all devices,
    weights/camera parameters replicated (the TPU-native replacement for
    the reference's one-process-per-GPU scale-out,
    info_replication.md:14). A mesh-aware ``FlaxPerception`` should be
    constructed with the same mesh."""
    from macaque_tpu.core.trace import StageTimes
    from macaque_tpu.pipeline.step1 import run_step1
    from macaque_tpu.pipeline.step2 import run_step2
    from macaque_tpu.pipeline.step3 import run_step3
    from macaque_tpu.pipeline.step4 import run_step4

    result_dir = os.path.join(config.results_dir, config.data_name)
    timer = StageTimes()

    with timer.stage("step1_2d"):
        run_step1(
            config.data_name, config.results_dir, config.raw_data_dir,
            perception, fps=config.fps, cfg=config.step1, redo=redo,
        )
    with timer.stage("step2_crossview"):
        run_step2(result_dir, rig, config.cross_view, redo=redo,
                  mesh=mesh)
    with timer.stage("step3_crossframe"):
        run_step3(result_dir, rig, config.cross_frame, fps=config.fps,
                  redo=redo, mesh=mesh)
    with timer.stage("step4_3d"):
        run_step4(
            result_dir, rig, pipeline_cfg=config,
            filter_cfg=config.filter, tri_cfg=config.triangulation,
            redo=redo, mesh=mesh,
        )

    if render:
        from macaque_tpu.tools.visualize import render_overlay

        cams = list(render_cams if render_cams is not None
                    else range(rig.n_cam))
        with timer.stage("render"):
            # per-camera renders are independent and dominated by cv2
            # drawing + video encode (GIL-releasing C calls), so threads
            # overlap them; the reference renders cameras sequentially
            # (run_demo.py:37-39)
            from concurrent.futures import ThreadPoolExecutor

            import os as _os

            # 1 worker per core: render threads are host-bound (decode +
            # draw + encode); oversubscribing a small VM slows them down
            with ThreadPoolExecutor(max_workers=max(1, min(
                    4, len(cams), _os.cpu_count() or 1))) as ex:
                list(ex.map(
                    lambda i_cam: render_overlay(
                        config.data_name, i_cam, result_dir,
                        config.raw_data_dir, rig, fps=config.fps,
                    ),
                    cams,
                ))

    timer.dump(os.path.join(result_dir, "run_manifest.json"))
    return result_dir
