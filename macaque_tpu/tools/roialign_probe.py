"""On-chip probe: adaptive-window RoIAlign on the serving detector.

Round 4's adaptive per-RoI window buckets (nn/pallas_roialign.py) only
engage on the chunked R > rcnn_roi_chunk path, so the serving preset
(128 RoIs <= 256 chunk) has been pinned at the fixed worst-case 48 px
window. This probe measures the serving detect program with the RoIs
bucket-sorted and chunked at Rc in {128 (status quo single fixed-window
call), 64, 32} to see whether the per-chunk ``lax.switch`` window
selection pays for itself at serving scale (the switch costs ~6 ms of
conditional overhead per call on v5e — detector.py head comments).

Run: ``python -m macaque_tpu.tools.roialign_probe [chunks...]``
Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR",
                                         "/tmp/macaque_roi_probe_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from macaque_tpu.nn import SwinMaskRCNN, DetectorConfig
    from macaque_tpu.nn.swin import SwinConfig
    from macaque_tpu.nn.detector import detect_frames
    from macaque_tpu.nn.preprocess import normalize_rgb

    tier = os.environ.get("ROI_PROBE_TIER", "serving")
    chunks = [int(a) for a in sys.argv[1:]] or [128, 64, 32]
    B, H, W = 16, 800, 608
    n_short, n_long = 1, 9
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    npr = np.random.default_rng(0)
    frames = jnp.asarray(npr.integers(0, 255, (B, H, W, 3), dtype=np.uint8))

    log(f"devices: {jax.devices()}  B={B}")
    det_vars = None
    for rc in chunks:
        cfg_cls = (DetectorConfig if tier == "parity"
                   else DetectorConfig.serving)
        model = SwinMaskRCNN(cfg_cls(
            swin=SwinConfig(compute_dtype=dtype),
            compute_dtype=dtype, rcnn_roi_chunk=rc,
        ))
        if det_vars is None:
            shapes = jax.eval_shape(model.init, rng,
                                    jnp.zeros((1, H, W, 3)))
            det_vars = jax.tree.map(
                lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

        def det_loop(n, det_vars, frames, model=model):
            def body(i, carry):
                f = frames + carry.astype(jnp.uint8)
                imgs = normalize_rgb(f.astype(jnp.float32))
                b, s, v = detect_frames(model, det_vars, imgs)
                return jnp.sum(s).astype(jnp.int32) % 3 + i * 0

            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        fn = jax.jit(det_loop)
        t0 = time.time()
        float(fn(jnp.int32(n_short), det_vars, frames))
        t_compile = time.time() - t0
        t0 = time.time()
        float(fn(jnp.int32(n_short + 1), det_vars, frames))
        t_short = time.time() - t0
        t0 = time.time()
        float(fn(jnp.int32(n_long + 1), det_vars, frames))
        t_long = time.time() - t0
        per = max(t_long - t_short, 1e-9) / (n_long - n_short)
        log(f"{tier} rc={rc}: compile {t_compile:.1f}s -> "
            f"{per * 1000:.1f} ms/chunk")
        print(json.dumps({"tier": tier, "rcnn_roi_chunk": rc,
                          "ms_per_chunk": round(per * 1000, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
