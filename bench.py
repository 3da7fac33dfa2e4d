#!/usr/bin/env python
"""Benchmark: end-to-end per-camera 2D perception + 3D triangulation
throughput on one TPU chip, in camera-frames/sec.

Measures the flagship compute path at real model sizes (random weights —
throughput is weight-independent): Swin-S Mask R-CNN detection (800x608)
+ ViTPose-huge top-down pose (4 crops/frame, flip test) + ResNet-152
collar-ID classification + multi-view DLT triangulation.

Measurement method: this environment executes device programs through a
remote tunnel where ``block_until_ready`` is a no-op and every host fetch
costs tens of seconds of fixed latency. Each stage therefore runs its
iterations *inside* one device program (``lax.fori_loop`` whose carry
perturbs the next iteration's input, preventing dedup/caching), with a
dynamic trip count; per-iteration time is the difference between a long
and a short trip count, which cancels the fixed upload/fetch overhead.

Baseline (BASELINE.md): the reference runs ~6.4 camera-frames/s aggregate
(8 cams) on one Quadro RTX 8000 (info_replication.md:44-45) —
``vs_baseline`` is camera-frames/s/chip divided by 6.4.

Prints ONE json line on stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import time


_T0 = time.time()


def log(*a):
    print(f"[t+{time.time() - _T0:6.1f}s]", *a, file=sys.stderr,
          flush=True)


def emit(obj):
    """Print one JSON result line. Called incrementally (kernel-only
    line first, full line after the pipeline bench): the driver keeps
    the LAST stdout line, so a mid-run kill still leaves the best
    already-measured artifact parseable — BENCH_r04 lost everything to
    a timeout because the single line printed only at the very end."""
    print(json.dumps(obj), flush=True)


def main():
    import jax

    # persistent compilation cache: compiles through the remote tunnel
    # take 1-6 min per stage. The cache lives IN-REPO, pre-warmed on the
    # TPU backend and committed (.jax_bench_cache/), so a driver run
    # starts executing immediately — /tmp never survives into one.
    from macaque_tpu.core.compile_cache import setup_compile_cache

    # BENCH_CPU=1 forces the CPU backend (the axon TPU plugin ignores
    # the JAX_PLATFORMS env var, so this must happen in-process);
    # BENCH_TINY=1 shrinks every model so the full bench flow — stage
    # order, tier gating, incremental emission — smoke-tests in minutes
    # without a TPU (tests/test_bench_flow.py). Neither is ever set in
    # a driver run; tiny output is labeled and never comparable.
    cpu = os.environ.get("BENCH_CPU", "0") == "1"
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    tiny = os.environ.get("BENCH_TINY", "0") == "1"

    # tiny/CPU smoke runs cache into the gitignored test cache so they
    # never clutter the committed TPU-warmed bench cache
    cache_dir = setup_compile_cache(
        ".jax_test_cache" if (tiny or cpu) else ".jax_bench_cache")
    log(f"compile cache: {cache_dir or 'unavailable'}")

    import jax.numpy as jnp
    import numpy as np

    from macaque_tpu.nn import (
        ViTPose, VitPoseConfig, SwinMaskRCNN, DetectorConfig,
        ResNetClassifier, ResNetConfig,
    )
    from macaque_tpu.nn.swin import SwinConfig
    from macaque_tpu.nn.detector import detect_frames
    from macaque_tpu.nn.heatmap import udp_decode, flip_heatmaps
    from macaque_tpu.nn.preprocess import (
        normalize_rgb, udp_crop, bbox_to_center_scale, id_crops,
        crop_coords_to_image,
    )
    from macaque_tpu.cameras.omnidir import OmnidirCamera, omnidir_undistort
    from macaque_tpu.geometry.triangulate import triangulate_dlt

    n_cam = int(os.environ.get("BENCH_CAMS", 4))
    frames_per_cam = int(os.environ.get("BENCH_FRAMES", 4))
    n_det = int(os.environ.get("BENCH_DETS", 4))
    n_short = int(os.environ.get("BENCH_N_SHORT", 1))
    n_long = int(os.environ.get("BENCH_N_LONG", 9))
    B = n_cam * frames_per_cam
    H, W = (256, 192) if tiny else (800, 608)
    if tiny:
        log("TINY smoke mode: shrunken models, output not comparable")

    log(f"devices: {jax.devices()}  B={B} dets/frame={n_det}")
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    def make_vars(model, example):
        shapes = jax.eval_shape(model.init, rng, example)
        return jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype),
                            shapes)

    npr = np.random.default_rng(0)
    frames = jnp.asarray(npr.integers(0, 255, (B, H, W, 3), dtype=np.uint8))
    boxes = jnp.asarray(
        np.tile(np.array([100.0, 100, 400, 500]), (B, n_det, 1))
        + npr.uniform(0, 50, (B, n_det, 4))
    )

    def measure(name, loop_fn, *args):
        """loop_fn(n, *args) -> scalar; dynamic trip count n."""
        fn = jax.jit(loop_fn)
        t0 = time.time()
        float(fn(jnp.int32(n_short), *args))  # compile + first fetch
        t_compile = time.time() - t0
        t0 = time.time()
        float(fn(jnp.int32(n_short + 1), *args))
        t_short = time.time() - t0
        t0 = time.time()
        float(fn(jnp.int32(n_long + 1), *args))
        t_long = time.time() - t0
        per_iter = max(t_long - t_short, 1e-9) / (n_long - n_short)
        log(f"{name}: compile+first {t_compile:.1f}s, "
            f"short({n_short+1}) {t_short:.1f}s, long({n_long+1}) "
            f"{t_long:.1f}s -> {per_iter*1000:.1f} ms/chunk")
        return per_iter

    results = {}

    # ------------------------------------------------------- detection
    swin_pallas = os.environ.get("BENCH_SWIN_PALLAS", "0") == "1"
    tiny_swin = (dict(embed_dim=32, depths=(1, 1, 1, 1),
                      num_heads=(1, 2, 4, 8)) if tiny else {})
    tiny_pose = (dict(embed_dim=128, depth=2, num_heads=4)
                 if tiny else {})
    # tiny images hold fewer anchors than the production RPN/RoI
    # budgets; shrink the fixed-capacity tables below the anchor count
    tiny_det = (dict(rpn_nms_pre=128, rpn_max=128, rcnn_roi_topk=64,
                     rcnn_roi_chunk=32) if tiny else {})
    log("build: det model/vars")
    det_kw = dict(tiny_det)
    if not tiny:
        det_kw["rpn_nms_pre"] = int(os.environ.get("BENCH_NMS_PRE", 1000))
    det_model = SwinMaskRCNN(DetectorConfig(
        swin=SwinConfig(compute_dtype=dtype,
                        use_pallas_attention=swin_pallas, **tiny_swin),
        compute_dtype=dtype,
        **det_kw,
    ))
    det_vars = make_vars(det_model, jnp.zeros((1, H, W, 3)))

    def make_det_loop(model):
        # sequential backbone (fills the chip per image) + batched
        # proposal/RoI/box-head tail with top-K proposal pruning; the
        # carry perturbs each iteration's input so nothing dedups
        def det_loop(n, det_vars, frames):
            def body(i, carry):
                f = frames + carry.astype(jnp.uint8)
                imgs = normalize_rgb(f.astype(jnp.float32))
                b, s, v = detect_frames(model, det_vars, imgs)
                return jnp.sum(s).astype(jnp.int32) % 3 + i * 0

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        return det_loop

    results["det"] = measure("detect", make_det_loop(det_model),
                             det_vars, frames)

    # ------------------------------------------------------------ pose
    # stage order is survivability-ordered (BENCH_r04 died to a driver
    # timeout; committed warm caches can go stale when the tunnel
    # backend changes keys): parity det -> parity pose -> PARTIAL emit
    # -> id/tri -> parity-kernel emit -> serving tier -> emit -> fast
    # tier -> emit -> pipeline -> final. A kill at any point leaves the
    # most valuable artifact already printed.
    # packed-qkv pallas attention (consumes the qkv Dense output layout
    # directly, no HBM transposes): 128.3 vs 140.1 ms per 64-crop
    # ViT-huge apply vs XLA — default on
    use_pallas = (os.environ.get("BENCH_PALLAS_ATTN", "1") == "1"
                  and jax.default_backend() == "tpu")
    log("build: pose model/vars")
    pose_model = ViTPose(VitPoseConfig(compute_dtype=dtype,
                                       use_pallas_attention=use_pallas,
                                       **tiny_pose))
    pose_vars = make_vars(pose_model, jnp.zeros((1, 256, 192, 3)))
    n_params = sum(x.size for x in jax.tree.leaves(pose_vars["params"]))
    log(f"vitpose params: {n_params/1e6:.0f}M; "
        f"{B*n_det} crops/chunk, flip test")

    def crops_from(frames, boxes):
        imgs = normalize_rgb(frames.astype(jnp.float32))
        flat_boxes = boxes.reshape(-1, 4)
        centers, scales = bbox_to_center_scale(flat_boxes)
        fidx = jnp.repeat(jnp.arange(B), n_det)
        crops = jax.vmap(
            lambda fi, c, s: udp_crop(imgs[fi], c[None], s[None])[0]
        )(fidx, centers, scales)
        return crops, centers, scales

    def make_pose_loop(model, flip):
        # flip test as two applies (measured faster than one doubled
        # batch on v5e: 280 vs 314 ms per 64-crop chunk)
        def pose_loop(n, pose_vars, frames, boxes):
            def body(i, carry):
                f = frames + carry.astype(jnp.uint8)
                crops, centers, scales = crops_from(f, boxes)
                hm = model.apply(pose_vars, crops).astype(jnp.float32)
                if flip:
                    hm_f = model.apply(
                        pose_vars, crops[:, :, ::-1, :]
                    ).astype(jnp.float32)
                    hm = 0.5 * (hm + flip_heatmaps(hm_f))
                kp, ks = udp_decode(hm)
                kp = crop_coords_to_image(kp, centers, scales)
                return jnp.sum(kp).astype(jnp.int32) % 3 + i * 0

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        return pose_loop

    results["pose"] = measure("pose", make_pose_loop(pose_model, True),
                              pose_vars, frames, boxes)

    # earliest survivable partial: det+pose are ~96% of the parity
    # kernel time. If the driver kills the run here (cold cache or a
    # crawling tunnel), the artifact still carries the two dominant
    # stage measurements — clearly labeled as excluding id/tri/pipeline.
    part = results["det"] + results["pose"]
    emit({
        "metric": "e2e_camera_frames_per_sec_per_chip",
        "value": round(B / part, 2),
        "unit": "camera-frames/s",
        "vs_baseline": round(B / part / 6.4, 2),
        "detail": {
            "kernel_ms_per_chunk": {k: round(v * 1000, 1)
                                    for k, v in results.items()},
            "tier_note": "PARTIAL: det+pose only; value excludes "
                         "~13 ms/chunk id+tri and the pipeline rest",
        },
    })

    # -------------------------------------------------------------- id
    log("build: id model/vars")
    id_model = ResNetClassifier(ResNetConfig(
        depth=50 if tiny else 152, compute_dtype=dtype))
    id_vars = make_vars(id_model, jnp.zeros((1, 224, 224, 3)))

    def id_loop(n, id_vars, frames, boxes):
        def body(i, carry):
            f = frames + carry.astype(jnp.uint8)
            imgs = normalize_rgb(f.astype(jnp.float32))
            flat_boxes = boxes.reshape(-1, 4)
            fidx = jnp.repeat(jnp.arange(B), n_det)
            crops = jax.vmap(
                lambda fi, b: id_crops(imgs[fi], b[None])[0]
            )(fidx, flat_boxes)
            logits = id_model.apply(id_vars, crops)
            return jnp.sum(logits).astype(jnp.int32) % 3 + i * 0

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    results["id"] = measure("id", id_loop, id_vars, frames, boxes)
    del id_vars

    # ---------------------------------------------------- triangulation
    cam = OmnidirCamera(
        K=jnp.asarray(np.tile(np.array([[800.0, 0, 304], [0, 800, 400],
                                        [0, 0, 1]]), (n_cam, 1, 1))),
        xi=jnp.asarray(np.full(n_cam, 1.0)),
        D=jnp.asarray(np.zeros((n_cam, 4))),
        rvec=jnp.asarray(npr.normal(0, 0.1, (n_cam, 3))),
        tvec=jnp.asarray(np.concatenate(
            [npr.normal(0, 10, (n_cam, 2)), np.full((n_cam, 1), 2500.0)], 1)),
    )
    kp_fake = jnp.asarray(
        npr.uniform(100, 700, (n_cam, frames_per_cam * n_det * 17, 2))
    )

    def tri_loop(n, kp):
        def body(i, carry):
            k = kp + carry
            und = omnidir_undistort(cam, k)
            undT = jnp.swapaxes(und, 0, 1)
            mask = jnp.ones(undT.shape[:2], bool)
            p3d = triangulate_dlt(jnp.nan_to_num(undT), cam.pmat, mask)
            return jnp.nansum(p3d) * 1e-9 + i * 0.0

        return jax.lax.fori_loop(0, n, body, jnp.float64(0.0)
                                 if False else jnp.float32(0.0))

    results["tri"] = measure("triangulate", tri_loop, kp_fake)

    total = sum(results.values())
    kernel_cf_s = B / total
    log(f"kernel total {total*1000:.0f} ms per {B} camera-frames "
        f"({ {k: round(v*1000, 1) for k, v in results.items()} } ms) "
        f"-> {kernel_cf_s:.1f} cf/s")
    detail = {"kernel_cf_s": round(kernel_cf_s, 2),
              "kernel_ms_per_chunk": {k: round(v * 1000, 1)
                                      for k, v in results.items()}}
    # parity kernel suite complete — emit before the tier stages
    emit({
        "metric": "e2e_camera_frames_per_sec_per_chip",
        "value": round(kernel_cf_s, 2),
        "unit": "camera-frames/s",
        "vs_baseline": round(kernel_cf_s / 6.4, 2),
        "detail": dict(detail, tier_note="parity kernel-only "
                       "(serving/fast tiers + pipeline still running)"),
    })

    # ----------------------------------------------------- serving tier
    # serving preset: smaller RPN/RoI candidate budgets
    # (DetectorConfig.serving: 512 proposals / 128 RoIs). The default
    # config is exact-mmdet (nms_pre 1000, no RoI truncation);
    # production scenes hold <= 4 animals, so the preset keeps the same
    # detections at the 0.85 pipeline threshold while cutting the
    # head's NMS + RoI work. Reported separately, never folded into the
    # parity numbers.
    det_fast_ms = None
    det_640_ms = None
    pose_int8_ms = None
    pose_noflip_ms = None
    q_vars = None
    if os.environ.get("BENCH_DET_FAST", "1") == "1":
        # BENCH_DET_INT8=1 additionally serves the Swin trunk's block
        # Dense layers in int8 (nn/quant.quantize_swin_params scheme)
        det_int8 = os.environ.get("BENCH_DET_INT8", "0") == "1"
        log("build: serving det model/vars")
        fast_model = SwinMaskRCNN(DetectorConfig.serving(
            swin=SwinConfig(compute_dtype=dtype,
                            use_pallas_attention=swin_pallas,
                            quantize="int8" if det_int8 else None,
                            **tiny_swin),
            compute_dtype=dtype,
            **tiny_det,
        ))
        fast_vars = (make_vars(fast_model, jnp.zeros((1, H, W, 3)))
                     if det_int8 else det_vars)
        det_fast_ms = measure("detect_fast", make_det_loop(fast_model),
                              fast_vars, frames) * 1000
        del fast_vars
        detail["det_fast_ms"] = round(det_fast_ms, 1)
    del det_vars

    # int8 serving pose (nn/quant.py): weight + dynamic-activation int8
    # on the transformer Dense layers. Reported separately — the
    # headline keeps the exact bf16 parity path; int8 is the production
    # serving knob (quantization accuracy is bounded by
    # tests/test_quant.py but unvalidated against real checkpoints in
    # this environment).
    if os.environ.get("BENCH_POSE_INT8", "1") == "1":
        from macaque_tpu.nn.quant import quantize_vitpose_params

        q_model = ViTPose(VitPoseConfig(compute_dtype=dtype,
                                        use_pallas_attention=use_pallas,
                                        quantize="int8", **tiny_pose))
        log("build: quantize pose vars (device)")
        q_vars = quantize_vitpose_params(pose_vars)
        jax.block_until_ready(q_vars)
        log("build: quantize done")
        pose_int8_ms = measure("pose_int8", make_pose_loop(q_model, True),
                               q_vars, frames, boxes) * 1000
        detail["pose_int8_ms"] = round(pose_int8_ms, 1)
        total_q = total - results["pose"] + pose_int8_ms / 1000
        detail["kernel_cf_s_int8"] = round(B / total_q, 2)
    del pose_vars
    if pose_int8_ms is not None and det_fast_ms is not None:
        total_s = (total - results["pose"] - results["det"]
                   + pose_int8_ms / 1000 + det_fast_ms / 1000)
        detail["kernel_cf_s_serving"] = round(B / total_s, 2)
        emit({
            "metric": "e2e_camera_frames_per_sec_per_chip",
            "value": round(kernel_cf_s, 2),
            "unit": "camera-frames/s",
            "vs_baseline": round(kernel_cf_s / 6.4, 2),
            "detail": dict(detail, tier_note="parity kernel-only "
                           "(fast tier + pipeline still running)"),
        })

    # -------------------------------------------------------- fast tier
    # 640x480 serving detector (2048x1536 source keep-ratio-resized to
    # target 640 instead of mmdet's 800; the trunk is layout-bound so
    # compute scales ~with pixel count) + single-pass int8 pose
    # (mmpose's own flip_test=False mode). Both are documented accuracy
    # trade-offs the reference never makes — own tier, never folded
    # into the parity or serving numbers (ARCHITECTURE.md "Roofline").
    if os.environ.get("BENCH_FAST", "1") == "1":
        log("build: 640 det model/vars")
        H6, W6 = (224, 160) if tiny else (640, 480)
        frames640 = jnp.asarray(
            npr.integers(0, 255, (B, H6, W6, 3), dtype=np.uint8))
        fast_model = SwinMaskRCNN(DetectorConfig.serving(
            swin=SwinConfig(compute_dtype=dtype,
                            use_pallas_attention=swin_pallas,
                            **tiny_swin),
            compute_dtype=dtype,
            **tiny_det,
        ))
        fast_vars = make_vars(fast_model, jnp.zeros((1, H6, W6, 3)))
        det_640_ms = measure("detect_640", make_det_loop(fast_model),
                             fast_vars, frames640) * 1000
        del fast_vars, frames640
        detail["det_640_ms"] = round(det_640_ms, 1)
        if q_vars is not None:
            pose_noflip_ms = measure("pose_noflip_int8",
                                     make_pose_loop(q_model, False),
                                     q_vars, frames, boxes) * 1000
            detail["pose_noflip_int8_ms"] = round(pose_noflip_ms, 1)
    del q_vars
    if det_640_ms is not None and pose_noflip_ms is not None:
        total_f = (total - results["pose"] - results["det"]
                   + pose_noflip_ms / 1000 + det_640_ms / 1000)
        detail["kernel_cf_s_fast"] = round(B / total_f, 2)

    # ------------------------------------------- full-pipeline wall clock
    # The reference's ~30-min baseline covers steps 1-4 + render
    # (info_replication.md:44-45), not just the NN forward passes. Measure
    # the rest of the pipeline (host step1, cross-view, cross-frame,
    # 3D refinement, render) on the synthetic scene and fold it in:
    # e2e = n_cf / (n_cf * kernel_time_per_cf + rest_wall_clock).
    cf_per_s = kernel_cf_s
    # all kernel tiers measured — make them survivable before the
    # (long) pipeline subprocess starts
    emit({
        "metric": "e2e_camera_frames_per_sec_per_chip",
        "value": round(kernel_cf_s, 2),
        "unit": "camera-frames/s",
        "vs_baseline": round(kernel_cf_s / 6.4, 2),
        "detail": dict(detail, tier_note="parity kernel-only "
                       "(pipeline bench still running)"),
    })
    if os.environ.get("BENCH_PIPELINE", "1") == "1":
        import subprocess

        try:
            out = subprocess.run(
                [sys.executable, "-m", "macaque_tpu.tools.pipeline_bench"],
                capture_output=True, text=True, timeout=2700, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
            )
            pipe = json.loads(out.stdout.strip().splitlines()[-1])
            n_cf = pipe["camera_frames"]
            t_kernel = n_cf * total / B
            t_e2e = t_kernel + pipe["pipeline_rest_s"]
            cf_per_s = n_cf / t_e2e
            headline = "parity-semantics additive e2e"
            detail["pipeline"] = pipe
            # additive e2e per tier (kernel time scaled to n_cf + the
            # measured non-kernel wall clock)
            def additive(chunk_s):
                return round(
                    n_cf / (n_cf * chunk_s / B + pipe["pipeline_rest_s"]),
                    2)
            for tier_key, out_key in (
                    ("kernel_cf_s_serving", "e2e_additive_serving_cf_s"),
                    ("kernel_cf_s_fast", "e2e_additive_fast_cf_s")):
                if tier_key in detail:
                    detail[out_key] = additive(B / detail[tier_key])
            log(f"pipeline rest {pipe['pipeline_rest_s']:.1f}s for {n_cf} "
                f"camera-frames (stages {pipe['stages_s']}); combined "
                f"e2e (additive model, parity bf16 kernels) "
                f"{cf_per_s:.1f} cf/s")
            if "e2e_measured_cf_s" in pipe:
                # measured end-to-end: real full-size serving models in
                # step 1 with decode overlapped under device time, plus
                # the host stages + render. Supersedes the additive
                # kernel+rest model ONLY on a locally-attached device:
                # through a remote tunnel every one of step 1's
                # per-chunk host<->device round trips costs a fixed
                # ~0.3-0.5 s (measured device_round_trip_s), which
                # swamps the compute at this scale and says nothing
                # about a production host.
                rt = pipe.get("device_round_trip_s")
                local_device = rt is not None and rt < 0.005
                if local_device:
                    if "e2e_parity_cf_s" in pipe:
                        # parity semantics measured end-to-end — the
                        # honest headline on a local device
                        cf_per_s = pipe["e2e_parity_cf_s"]
                        headline = ("measured PARITY e2e (exact-mmdet "
                                    "step1, locally-attached device)")
                    else:
                        cf_per_s = pipe["e2e_measured_cf_s"]
                        headline = ("measured e2e (serving-preset step1, "
                                    "locally-attached device)")
                log(f"measured e2e (serving preset, decode-ahead): "
                    f"step1 {pipe['step1_real_s']:.1f}s -> "
                    f"{pipe['e2e_measured_cf_s']:.1f} cf/s"
                    + ("" if local_device else
                       f" [tunnel-dominated ({rt}s/round-trip); "
                       f"headline keeps the additive model]"))
                if "e2e_parity_cf_s" in pipe:
                    log(f"measured e2e (parity tier, exact-mmdet step1): "
                        f"step1 {pipe['step1_parity_s']:.1f}s -> "
                        f"{pipe['e2e_parity_cf_s']:.1f} cf/s"
                        + ("" if local_device else
                           " [tunnel-dominated; see additive model]"))
            if "e2e_fast_cf_s" in pipe:
                # reported in detail only — the headline value keeps
                # the serving tier's reference-parity semantics
                log(f"measured e2e (fast tier, documented accuracy "
                    f"trade-offs): {pipe['e2e_fast_cf_s']:.1f} cf/s")
        except Exception as e:  # noqa: BLE001 — report kernel-only number
            log(f"pipeline bench failed ({e}); reporting kernel-only")
            detail["pipeline_error"] = str(e)
            headline = "parity kernel-only (pipeline bench failed)"
    else:
        headline = "parity kernel-only (BENCH_PIPELINE=0)"

    baseline = 6.4
    # round-2 comparability: the r02 "det 160 ms / 43.3 cf/s" numbers
    # were measured at the then-default rcnn_roi_topk=256 truncation —
    # today's serving family. The parity default is now exact-mmdet
    # (1000 RoIs, chunked RoIAlign), which costs more and is reported
    # honestly as its own tier.
    detail["tier_note"] = (f"value = {headline}; serving/fast tiers in "
                           "detail (see ARCHITECTURE.md 3b)")
    emit({
        "metric": "e2e_camera_frames_per_sec_per_chip",
        "value": round(cf_per_s, 2),
        "unit": "camera-frames/s",
        "vs_baseline": round(cf_per_s / baseline, 2),
        "detail": detail,
    })


if __name__ == "__main__":
    main()
