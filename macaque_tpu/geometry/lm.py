"""Matrix-free Levenberg-Marquardt with CGLS inner solves.

Shared nonlinear least-squares engine for the constrained 3D refinement
(geometry/refine3d.py) and the calibration bundle adjustments
(calib/bundle.py) — the TPU-native replacement for the reference's scipy
sparse TRF solvers (aniposelib/cameras.py:926,1166; multicam_toolbox.py:
611,776). ``J v`` via jvp, ``J^T u`` via vjp; everything jit-compatible
with static iteration bounds.

Robustness notes — all of these were required to match scipy TRF on the
step4 refinement problem, whose initial cost sits ~6 orders of magnitude
above the optimum with diag(J^T J) entries spanning ~6 orders:

* **CGLS, not CG on the normal equations.** The damped step solves
  ``min_p |J p + r|^2 + lam |D^1/2 p|^2`` by conjugate gradients on the
  *least-squares* form: the recurrences track the residual in the
  19k-dim residual space and re-derive the normal-equation residual
  ``s = J^T u - lam D p`` from it each sweep. Algebraically identical
  to CG on ``(J^T J + lam D)``, but in float32 the normal-equation
  recurrence accumulates rounding at kappa(J)^2 while CGLS degrades at
  kappa(J) — the observed difference on the step4 problem is "stalls
  four orders above the optimum" vs "converges". Same cost per sweep
  (one jvp + one vjp). This mirrors scipy TRF's use of LSMR on J
  rather than CG on J^T J.
* **Marquardt scaling** — damping is ``lam * D`` with
  ``D ~ diag(J^T J)`` (estimated matrix-free by Hutchinson probes), not
  ``lam * I``: one absolute lambda cannot fit parameters whose
  curvature differs by orders of magnitude (3D coordinates seen by 8
  cameras vs. occluded points pinned only by the smoothness term vs.
  joint-length variables). The same diagonal preconditions the inner
  solve by the variable change ``p = D^-1/2 y`` (unit-diagonal scaled
  Gram matrix).
* **Gain-ratio lambda update** (Nielsen/Madsen) — predicted reduction
  from one extra jvp per step; accepted steps shrink lambda by the
  standard ``max(1/3, 1-(2*rho-1)^3)`` factor, rejections escalate
  geometrically, which recovers from a bad initial lambda in a few
  iterations instead of ~log_4 of the mismatch.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMConfig(NamedTuple):
    lm_iters: int = 50
    cg_iters: int = 100
    ftol: float = 1e-3
    init_lambda: float = 1e-3
    # inner forcing tolerance: stop the CGLS sweep once the
    # normal-equation residual satisfies |s| < cg_rtol * |g|. LM only
    # needs an inexact Newton direction (the gain-ratio guard absorbs
    # truncation error); most steps converge in far fewer than cg_iters
    # sweeps, and each sweep is two full residual linearizations
    # (jvp+vjp) — the dominant cost of the whole solve.
    cg_rtol: float = 1e-3
    # Rademacher probes for the Hutchinson diag(J^T J) estimate used by
    # the Marquardt scaling + CGLS column scaling. The estimate only
    # steers scaling (per-entry noise is absorbed by the lambda guard),
    # so a handful of probes suffices.
    diag_probes: int = 8


def lm_solve(resid_fn: Callable, x0: jnp.ndarray, cfg: LMConfig = LMConfig(),
             return_info: bool = False):
    """Minimize ``0.5 * |resid_fn(x)|^2`` from ``x0``. Returns x, or
    ``(x, info)`` with ``return_info`` — info carries ``lm_iters`` /
    ``cg_iters`` actually executed, initial/final cost, and whether the
    ftol early exit fired (the budget-tuning diagnostic: production
    iteration caps are set from these counters, not guessed).

    The whole solve traces under float32 matmul precision: CGLS
    directions come from ``vdot``s and jvp/vjp products whose default
    bf16 TPU lowering corrupts mm-scale solutions (observed: 40+ mm 3D
    error on a clean synthetic scene from this alone).
    """
    with jax.default_matmul_precision("float32"):
        x, info = _lm_solve_impl(resid_fn, x0, cfg)
    return (x, info) if return_info else x


def _lm_solve_impl(resid_fn: Callable, x0: jnp.ndarray, cfg: LMConfig):
    n = x0.shape[0]

    def cgls(j_vec, jt_vec, r, g, lam, d):
        """Solve ``min_p |J p + r|^2 + lam * p^T D p`` by CGLS in the
        scaled variable ``y = D^1/2 p`` (so the damping is ``lam I``
        and the Gram matrix has unit diagonal). Returns p.

        State: y (solution), u = -(r + J p) (LS-space residual),
        s = scaled gradient residual ``A^T u - lam y`` where
        ``A = J D^-1/2``, dd (search direction in y-space).
        """
        dinv = jax.lax.rsqrt(d)
        stop2 = (cfg.cg_rtol ** 2) * jnp.vdot(dinv * g, dinv * g)

        def body(state):
            y, u, s, dd, gamma, k = state
            # lane freeze (same reason as lm_step's): under vmap the
            # loop runs until every lane's cond fails, so a converged
            # lane must keep its iterate verbatim or its result depends
            # on sibling lanes' trip counts
            active = gamma > stop2
            q = j_vec(dinv * dd)
            alpha = gamma / jnp.maximum(
                jnp.vdot(q, q) + lam * jnp.vdot(dd, dd), 1e-30)
            y2 = jnp.where(active, y + alpha * dd, y)
            u2 = jnp.where(active, u - alpha * q, u)
            s2 = jnp.where(active, dinv * jt_vec(u2) - lam * y2, s)
            gamma2 = jnp.where(active, jnp.vdot(s2, s2), gamma)
            beta = gamma2 / jnp.maximum(gamma, 1e-30)
            dd2 = jnp.where(active, s2 + beta * dd, dd)
            return (y2, u2, s2, dd2, gamma2,
                    k + active.astype(k.dtype))

        def cond(state):
            _, _, _, _, gamma, k = state
            return (k < cfg.cg_iters) & (gamma > stop2)

        u0 = -r
        s0 = dinv * (-g)          # A^T u0 - lam * y0 with y0 = 0
        g0 = jnp.vdot(s0, s0)
        y, _, _, _, _, k = jax.lax.while_loop(
            cond, body, (jnp.zeros_like(g), u0, s0, s0, g0, jnp.asarray(0))
        )
        return dinv * y, k

    def lm_step(state):
        x, lam, nu, f_prev, it, done, cg_total, f0 = state
        r, pullback = jax.vjp(resid_fn, x)
        f = 0.5 * jnp.vdot(r, r)
        (g,) = pullback(r)

        def j_vec(v):
            return jax.jvp(resid_fn, (x,), (v,))[1]

        def jt_vec(u):
            return pullback(u)[0]

        # Hutchinson: E[v * (J^T J v)] = diag(J^T J) for Rademacher v.
        # Deterministic fixed-key stream (fold_in by iteration) keeps
        # the trace pure. Floor at a small fraction of the max so a
        # noisy near-zero estimate cannot blow up the scaling.
        key = jax.random.fold_in(jax.random.PRNGKey(7), it)
        probes = jax.random.rademacher(
            key, (cfg.diag_probes, n), dtype=x.dtype)
        d = jnp.mean(
            jax.vmap(lambda v: v * jt_vec(j_vec(v)))(probes), axis=0)
        d = jnp.maximum(d, 1e-6 * jnp.max(jnp.abs(d)) + 1e-30)

        step, cg_k = cgls(j_vec, jt_vec, r, g, lam, d)
        x_new = x + step
        r_new = resid_fn(x_new)
        f_new = 0.5 * jnp.vdot(r_new, r_new)

        # gain ratio: actual / predicted reduction of the GN model
        # (one extra jvp for J*step)
        jstep = j_vec(step)
        pred = -jnp.vdot(g, step) - 0.5 * jnp.vdot(jstep, jstep)
        actual = f - f_new
        rho = actual / jnp.maximum(pred, 1e-30)
        accepted = (actual > 0) & (pred > 0)

        # Lane freeze: under vmap the while_loop runs until ALL lanes
        # finish, and the body keeps executing on lanes whose own exit
        # already fired — without a latch a finished lane would keep
        # stepping, making its result depend on how long SIBLING lanes
        # iterate (batch padding then changes numerics: the sharded
        # batch solve diverged up to ~12 mm from the single-device one,
        # tests/test_multichip.py). `done` lanes keep their state
        # verbatim; `degenerate` lanes (NaN cost from an all-masked
        # trajectory, or exactly-zero cost) can never take an accepted
        # step, so they latch done immediately instead of burning the
        # full lm_iters x cg_iters budget (the empty-animal-slot cost
        # in BENCH_r03's step4_3d regression).
        degenerate = jnp.isnan(f) | (f <= 0.0)
        frozen = done | degenerate
        x = jnp.where(frozen, x, jnp.where(accepted, x_new, x))
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_next = jnp.clip(
            jnp.where(accepted, lam * shrink, lam * nu), 1e-12, 1e12)
        lam = jnp.where(frozen, lam, lam_next)
        nu = jnp.where(frozen, nu, jnp.where(accepted, 2.0, nu * 2.0))
        # scipy-TRF-style ftol: stop after an ACCEPTED, model-accurate
        # step whose cost reduction is relatively tiny (least_squares
        # ftol semantics: dF < ftol * F and ratio > 0.25; the reference
        # passes ftol=1e-3, aniposelib cameras.py:1170). The rho guard
        # keeps a truncated inner solve from stopping the outer loop.
        done_now = accepted & (actual < cfg.ftol * f) & (rho > 0.25)
        f_out = jnp.where(
            done, f_prev,
            jnp.where(degenerate, f, jnp.where(accepted, f_new, f)))
        return (x, lam, nu, f_out, it + 1, frozen | done_now,
                jnp.where(frozen, cg_total, cg_total + cg_k),
                jnp.where(it == 0, f, f0))

    def cond(state):
        it, done = state[4], state[5]
        return (it < cfg.lm_iters) & (~done)

    state = (
        x0,
        jnp.asarray(cfg.init_lambda, x0.dtype),
        jnp.asarray(2.0, x0.dtype),
        jnp.asarray(jnp.inf, x0.dtype),
        jnp.asarray(0),
        jnp.asarray(False),
        jnp.asarray(0),
        jnp.asarray(jnp.inf, x0.dtype),
    )
    x, _, _, f_final, it, done, cg_total, f0 = jax.lax.while_loop(
        cond, lm_step, state)
    info = {"lm_iters": it, "cg_iters": cg_total, "ftol_stop": done,
            "cost0": f0, "cost": f_final}
    return x, info
