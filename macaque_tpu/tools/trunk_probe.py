"""On-chip probe: Swin trunk scheduling/layout variants.

ARCHITECTURE.md §3b pins the detector trunk as layout-bound (Pallas
block fusion +5%, int8 slower, pure-matmul probe 3.5x) and names one
unexplored lever: a stage-granular remat/layout search. This probe
measures the candidates that survive analysis, on the real chip, with
the same long/short ``lax.fori_loop`` protocol as bench.py (the remote
tunnel makes naive timing meaningless):

- ``map1``  — production baseline: ``lax.map`` over images, trunk B=1.
- ``mapN``  — ``lax.map`` over sub-batches of N images (N=2,4,8): the
  49-token window matmuls at stage 1/2 (C=96/192) underfill the MXU at
  B=1; batching multiplies their effective rows without re-reading
  weights. Round-2 only measured the endpoints (B=1: 6.4 ms/img,
  B=16: 9.2 — VMEM pressure), never the middle.
- ``remat`` — per-stage ``jax.checkpoint`` on the B=16 trunk: if the
  endpoint blowup is scheduling pressure from 18 stage-2 blocks of
  liveness, remat bounds it (inference has no backward, but XLA's
  scheduler still trades buffer liveness for rematerialization).

Run: ``python -m macaque_tpu.tools.trunk_probe [variants...]``
Prints one JSON line per variant; diagnostics on stderr.
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
                                         "/tmp/macaque_trunk_probe_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from macaque_tpu.nn.swin import SwinBackbone, SwinConfig

    variants = sys.argv[1:] or ["map1", "map2", "map4", "map8"]
    B, H, W = 16, 800, 608
    n_short, n_long = 1, 9

    cfg = SwinConfig(compute_dtype=jnp.bfloat16)
    model = SwinBackbone(cfg)
    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(model.init, rng, jnp.zeros((1, H, W, 3)))
    variables = jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
    npr = np.random.default_rng(0)
    frames = jnp.asarray(
        npr.normal(0, 1, (B, H, W, 3)).astype(np.float32))

    def apply_trunk(v, x):
        return model.apply(v, x)

    def make_loop(sub_batch: int, remat: bool):
        fn = apply_trunk
        if remat:
            fn = jax.checkpoint(apply_trunk)

        def loop(n, variables, frames):
            def body(i, carry):
                f = frames + carry
                if sub_batch == B:
                    outs = fn(variables, f)
                else:
                    fs = f.reshape(B // sub_batch, sub_batch, H, W, 3)
                    outs = jax.lax.map(
                        lambda sub: fn(variables, sub), fs)
                s = sum(jnp.sum(o).astype(jnp.float32) for o in outs)
                return s * 1e-12 + i * 0.0

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return loop

    def measure(name, loop_fn, *args):
        fn = jax.jit(loop_fn)
        t0 = time.time()
        float(fn(jnp.int32(n_short), *args))
        t_compile = time.time() - t0
        t0 = time.time()
        float(fn(jnp.int32(n_short + 1), *args))
        t_short = time.time() - t0
        t0 = time.time()
        float(fn(jnp.int32(n_long + 1), *args))
        t_long = time.time() - t0
        per_iter = max(t_long - t_short, 1e-9) / (n_long - n_short)
        log(f"{name}: compile {t_compile:.1f}s -> "
            f"{per_iter * 1000:.1f} ms/chunk "
            f"({per_iter * 1000 / B:.2f} ms/img)")
        return per_iter

    log(f"devices: {jax.devices()}  chunk B={B} {H}x{W}")
    for v in variants:
        if v == "remat":
            loop = make_loop(B, remat=True)
        elif v.startswith("map"):
            loop = make_loop(int(v[3:]), remat=False)
        else:
            log(f"unknown variant {v}")
            continue
        per = measure(v, loop, variables, frames)
        print(json.dumps({"variant": v, "ms_per_chunk":
                          round(per * 1000, 2),
                          "ms_per_img": round(per * 1000 / B, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
