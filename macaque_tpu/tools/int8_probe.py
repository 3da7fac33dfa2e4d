"""On-chip probe: fused dynamic-quant int8 matmul vs the XLA chain.

Measures the four ViT-huge block Dense shapes (qkv/proj/fc1/fc2 at the
64-crop pose chunk's M = 64*192 = 12288 rows) under three schemes:

  * ``xla``    — nn/quant.int8_matmul (dynamic quantize chain + dot,
                 XLA-fused; the shipped round-4 path)
  * ``pallas`` — nn/pallas_int8.quant_int8_matmul (quantize fused into
                 the matmul kernel; activation read from HBM once)
  * ``static`` — dot on pre-quantized int8 activations (no quantize
                 cost at all; the roofline for the dynamic schemes)

plus the full int8 flip-test pose chunk with Int8Dense switched
between the xla and pallas paths.

Run: ``python -m macaque_tpu.tools.int8_probe [micro|model|all]``
Prints one JSON line per measurement to stdout; diagnostics to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR",
                                         "/tmp/macaque_int8_probe_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from macaque_tpu.nn.quant import int8_matmul
    from macaque_tpu.nn.pallas_int8 import (
        quant_int8_matmul, quant_int8_matmul_split,
    )

    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    n_short, n_long = 1, 9
    npr = np.random.default_rng(0)
    log(f"devices: {jax.devices()}")

    def measure(name, loop_fn, *args, iters=50):
        fn = jax.jit(loop_fn, static_argnums=())
        t0 = time.time()
        float(fn(jnp.int32(n_short), *args))
        t_compile = time.time() - t0
        t0 = time.time()
        float(fn(jnp.int32(n_short + 1), *args))
        t_short = time.time() - t0
        t0 = time.time()
        float(fn(jnp.int32(n_long + 1), *args))
        t_long = time.time() - t0
        per = max(t_long - t_short, 1e-9) / (n_long - n_short) / iters
        log(f"{name}: compile {t_compile:.1f}s -> {per*1e3:.3f} ms/call")
        return per

    if what in ("micro", "all"):
        M = 12288
        shapes = {"qkv": (1280, 3840), "proj": (1280, 1280),
                  "fc1": (1280, 5120), "fc2": (5120, 1280)}
        for sname, (K, N) in shapes.items():
            x = jnp.asarray(npr.normal(0, 1, (M, K)).astype(np.float32)
                            ).astype(jnp.bfloat16)
            kq = jnp.asarray(npr.integers(-127, 128, (K, N), dtype=np.int8))
            ws = jnp.asarray(
                npr.uniform(0.001, 0.01, N).astype(np.float32))
            flops = 2.0 * M * K * N

            def mk(call):
                def loop(n, x, kq, ws):
                    def body(i, carry):
                        y = call(x + carry.astype(x.dtype), kq, ws)
                        return jnp.max(y).astype(jnp.float32) * 1e-6

                    return jax.lax.fori_loop(
                        0, n * 50, body, jnp.float32(0.0))

                return loop

            def static_call(xq, kq, ws):
                acc = jax.lax.dot_general(
                    xq, kq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return (acc.astype(jnp.float32) * ws).astype(jnp.bfloat16)

            variants = {
                "xla": (mk(int8_matmul), (x, kq, ws)),
                "pallas": (mk(partial(quant_int8_matmul, tm=256, tn=512)),
                           (x, kq, ws)),
                "split": (mk(quant_int8_matmul_split), (x, kq, ws)),
                "static": (mk(static_call),
                           (jnp.clip(jnp.round(x.astype(jnp.float32)),
                                     -127, 127).astype(jnp.int8), kq, ws)),
            }
            for vname, (loop, args) in variants.items():
                per = measure(f"{sname}/{vname}", loop, *args)
                print(json.dumps({
                    "probe": "int8_micro", "shape": sname,
                    "variant": vname, "ms": round(per * 1e3, 4),
                    "tflops": round(flops / per / 1e12, 1)}), flush=True)

    if what in ("model", "all"):
        from macaque_tpu.nn import ViTPose, VitPoseConfig
        from macaque_tpu.nn.quant import quantize_vitpose_params
        from macaque_tpu.nn.heatmap import flip_heatmaps, udp_decode

        B = 64
        crops = jnp.asarray(
            npr.normal(0, 1, (B, 256, 192, 3)).astype(np.float32))
        base = ViTPose(VitPoseConfig(compute_dtype=jnp.bfloat16))
        shapes = jax.eval_shape(base.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 256, 192, 3)))
        pose_vars = jax.tree.map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
        q_vars = quantize_vitpose_params(pose_vars)

        for impl in ("xla", "pallas"):
            model = ViTPose(VitPoseConfig(
                compute_dtype=jnp.bfloat16, use_pallas_attention=True,
                quantize="int8", int8_impl=impl))

            def loop(n, q_vars, crops):
                def body(i, carry):
                    c = crops + carry
                    hm = model.apply(q_vars, c).astype(jnp.float32)
                    hm_f = model.apply(
                        q_vars, c[:, :, ::-1, :]).astype(jnp.float32)
                    hm = 0.5 * (hm + flip_heatmaps(hm_f))
                    kp, ks = udp_decode(hm)
                    return jnp.sum(kp) * 1e-9

                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            per = measure(f"pose_int8/{impl}", loop, q_vars, crops,
                          iters=1)
            print(json.dumps({
                "probe": "int8_pose_chunk", "variant": impl,
                "ms_per_chunk": round(per * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
