"""Matrix-free Levenberg-Marquardt with conjugate-gradient inner solves.

Shared nonlinear least-squares engine for the constrained 3D refinement
(geometry/refine3d.py) and the calibration bundle adjustments
(calib/bundle.py) — the TPU-native replacement for the reference's scipy
sparse TRF solvers (aniposelib/cameras.py:926,1166; multicam_toolbox.py:
611,776). ``J v`` via jvp, ``J^T u`` via vjp, damped normal equations by
CG; everything jit-compatible with static iteration bounds.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMConfig(NamedTuple):
    lm_iters: int = 30
    cg_iters: int = 60
    ftol: float = 1e-3
    init_lambda: float = 1e-3
    # truncated-CG forcing tolerance: stop the inner solve once
    # |r| < cg_rtol * |g|. LM only needs an inexact Newton direction
    # (the improved/lambda guard absorbs truncation error); most steps
    # converge in far fewer than cg_iters sweeps, and each CG sweep is
    # two full residual linearizations (jvp+vjp) — the dominant cost of
    # the whole solve (profiled: step4 refinement was the largest
    # pipeline-rest stage at fixed 60-iteration CG).
    cg_rtol: float = 1e-2


def lm_solve(resid_fn: Callable, x0: jnp.ndarray, cfg: LMConfig = LMConfig()):
    """Minimize ``0.5 * |resid_fn(x)|^2`` from ``x0``. Returns x.

    The whole solve traces under float32 matmul precision: CG directions
    come from ``vdot``s and jvp/vjp products whose default bf16 TPU
    lowering corrupts mm-scale solutions (observed: 40+ mm 3D error on a
    clean synthetic scene from this alone).
    """
    with jax.default_matmul_precision("float32"):
        return _lm_solve_impl(resid_fn, x0, cfg)


def _lm_solve_impl(resid_fn: Callable, x0: jnp.ndarray, cfg: LMConfig):
    def jtj_vec(x, v, lam):
        _, jv = jax.jvp(resid_fn, (x,), (v,))
        _, vjp = jax.vjp(resid_fn, x)
        (jtjv,) = vjp(jv)
        return jtjv + lam * v

    def cg(x, g, lam):
        stop2 = (cfg.cg_rtol ** 2) * jnp.vdot(g, g)

        def body(state):
            p, r, d, k = state
            Ad = jtj_vec(x, d, lam)
            alpha = jnp.vdot(r, r) / jnp.maximum(jnp.vdot(d, Ad), 1e-30)
            p2 = p + alpha * d
            r2 = r - alpha * Ad
            beta = jnp.vdot(r2, r2) / jnp.maximum(jnp.vdot(r, r), 1e-30)
            d2 = r2 + beta * d
            return (p2, r2, d2, k + 1)

        def cond(state):
            _, r, _, k = state
            return (k < cfg.cg_iters) & (jnp.vdot(r, r) > stop2)

        p0 = jnp.zeros_like(g)
        p, _, _, _ = jax.lax.while_loop(
            cond, body, (p0, -g, -g, jnp.asarray(0))
        )
        return p

    def lm_step(state):
        x, lam, f_prev, it, done = state
        r = resid_fn(x)
        f = 0.5 * jnp.vdot(r, r)
        _, vjp = jax.vjp(resid_fn, x)
        (g,) = vjp(r)
        step = cg(x, g, lam)
        x_new = x + step
        r_new = resid_fn(x_new)
        f_new = 0.5 * jnp.vdot(r_new, r_new)
        improved = f_new < f
        x = jnp.where(improved, x_new, x)
        lam = jnp.clip(
            jnp.where(improved, lam * 0.5, lam * 4.0), 1e-10, 1e10
        )
        rel = jnp.abs(f - f_new) / jnp.maximum(f, 1e-30)
        done = improved & (rel < cfg.ftol)
        return (x, lam, jnp.where(improved, f_new, f), it + 1, done)

    def cond(state):
        _, _, _, it, done = state
        return (it < cfg.lm_iters) & (~done)

    state = (
        x0,
        jnp.asarray(cfg.init_lambda, x0.dtype),
        jnp.asarray(jnp.inf, x0.dtype),
        jnp.asarray(0),
        jnp.asarray(False),
    )
    x, _, _, _, _ = jax.lax.while_loop(cond, lm_step, state)
    return x
