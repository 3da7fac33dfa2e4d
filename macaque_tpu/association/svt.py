"""Singular-value-thresholding (SVT) assignment matching, batched.

The reference solves cross-view detection association per keyframe with an
ADMM-style iteration of SVD shrinkage + block constraints
(``matchSVT``, src/pipeline/step2_crossviewmatching.py:130-216), looping
keyframes in Python. Here one jitted ``lax.while_loop`` handles a whole
*batch* of keyframes (vmap over the SVD), with the per-camera block masks
precomputed — the dominant cost (M x M SVDs) runs as one batched kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def project_simplex(y: jnp.ndarray) -> jnp.ndarray:
    """Euclidean projection of each trailing-axis vector onto
    ``{x >= 0, sum x <= 1}`` — the reference's ``proj2pav``
    (step2:79-94: pass-through when the positive part already sums < 1,
    else the sorted cumulative-sum threshold rule)."""
    y = jnp.maximum(y, 0.0)
    n = y.shape[-1]
    u = jnp.sort(y, axis=-1)[..., ::-1]
    sv = jnp.cumsum(u, axis=-1)
    k = jnp.arange(1, n + 1)
    cond = u > (sv - 1.0) / k
    rho = jnp.sum(cond, axis=-1) - 1  # last true index
    rho = jnp.maximum(rho, 0)
    sv_rho = jnp.take_along_axis(sv, rho[..., None], axis=-1)[..., 0]
    theta = jnp.maximum(0.0, (sv_rho - 1.0) / (rho + 1.0))
    proj = jnp.maximum(y - theta[..., None], 0.0)
    needs = jnp.sum(y, axis=-1) >= 1.0
    return jnp.where(needs[..., None], proj, y)


@partial(jax.jit, static_argnames=("max_iter", "pselect", "dual_stochastic"))
def match_svt(
    S: jnp.ndarray,
    same_block: jnp.ndarray,
    alpha: float = 0.5,
    _lambda: float = 50.0,
    mu0: float = 64.0,
    tol: float = 5e-4,
    max_iter: int = 500,
    pselect: int = 1,
    dual_stochastic: bool = False,
    valid: jnp.ndarray | None = None,
):
    """Solve batched SVT matching.

    S: (..., N, N) affinity matrices (a batch axis is optional).
    same_block: (N, N) bool — True inside per-camera diagonal blocks (these
      entries are forced to zero each iteration, reference step2:169-171).
    valid: optional (..., N) detection mask for padded problems. Invalid
      rows/cols are held at exactly zero (incl. their diagonal), which
      keeps the padded iteration *identical* to the unpadded one: a
      block-diagonal [[A, 0], [0, 0]] matrix's SVD shrinkage acts blockwise
      and zero blocks contribute nothing to residual norms (which are
      normalized by the valid count, as the reference normalizes by N).

    Returns binary match matrices (..., N, N) uint8 (threshold 0.5).
    Semantics follow reference step2:130-216 with ``dual_stochastic=False``
    (the configuration the pipeline runs: step2:30, step2:589-595).
    """
    N = S.shape[-1]
    eye = jnp.eye(N, dtype=bool)

    if valid is None:
        diag_mask = eye
        n_eff = jnp.asarray(float(N))
        pair_valid = jnp.ones(S.shape[-2:], bool)
    else:
        pair_valid = valid[..., :, None] & valid[..., None, :]
        diag_mask = eye & pair_valid
        n_eff = jnp.maximum(jnp.sum(valid, axis=-1).astype(S.dtype), 1.0)

    S = jnp.where(eye, 0.0, S)
    S = jnp.where(pair_valid, S, 0.0)
    S = (S + jnp.swapaxes(S, -1, -2)) / 2
    X0_init = S
    Y0 = jnp.zeros_like(S)
    W = alpha - S

    def body(state):
        X, Y, mu, it, done = state
        Xprev = X
        muM = mu[..., None, None]
        U, s, Vh = jnp.linalg.svd(Y / muM + X, full_matrices=False)
        s_th = jnp.maximum(s - _lambda / mu[..., None], 0.0)
        Q = jnp.einsum("...ik,...k,...kj->...ij", U, s_th, Vh,
                       precision=jax.lax.Precision.HIGHEST)
        X = Q - (W + Y) / muM
        X = jnp.where(same_block, 0.0, X)
        if pselect == 1:
            X = jnp.where(diag_mask, 1.0, X)
        X = jnp.where(pair_valid, X, 0.0)
        X = jnp.clip(X, 0.0, 1.0)
        if dual_stochastic:
            # row/column simplex projection within cross-camera blocks is
            # approximated by full-matrix alternating projection (the
            # pipeline runs with dual_stochastic_SVT=False; this branch is
            # provided for API completeness)
            X = project_simplex(X)
            X = jnp.swapaxes(project_simplex(jnp.swapaxes(X, -1, -2)), -1, -2)
        X = (X + jnp.swapaxes(X, -1, -2)) / 2
        Y = Y + muM * (X - Q)

        dQ = jnp.where(pair_valid, X - Q, 0.0)
        pRes = jnp.linalg.norm(
            dQ.reshape(*X.shape[:-2], -1), axis=-1
        ) / n_eff
        dRes = mu * jnp.linalg.norm(
            (X - Xprev).reshape(*X.shape[:-2], -1), axis=-1
        ) / n_eff
        conv = (pRes < tol) & (dRes < tol)
        done = jnp.all(conv)

        mu = jnp.where(pRes > 10 * dRes, mu * 2, mu)
        mu = jnp.where(dRes > 10 * pRes, mu / 2, mu)
        return X, Y, mu, it + 1, done

    def cond(state):
        _, _, _, it, done = state
        return (it < max_iter) & (~done)

    mu_init = jnp.full(S.shape[:-2], mu0, S.dtype)
    state = (X0_init, Y0, mu_init, jnp.asarray(0), jnp.asarray(False))
    X, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    X = (X + jnp.swapaxes(X, -1, -2)) / 2
    return (X > 0.5).astype(jnp.uint8)
