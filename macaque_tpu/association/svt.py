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


def proj_2dpam(Y: jnp.ndarray, tol: float = 1e-2, iters: int = 10,
               denom: jnp.ndarray | None = None) -> jnp.ndarray:
    """Alternating row/column simplex projection toward a doubly-
    stochastic matrix — the reference's ``myproj2dpam`` (step2:110-126),
    batched over leading axes. Mirrors the reference exactly, including
    the early-break-returns-PREVIOUS-iterate quirk: when
    ``|X2 - X| / size < tol`` the pre-update ``X`` is kept.

    ``denom`` overrides the convergence normalizer (the number of REAL
    entries per matrix) for zero-padded blocks; zero padding is exactly
    neutral for the projection itself (appended zeros never change a
    simplex projection), only the tolerance normalization sees it.
    """
    R, C = Y.shape[-2], Y.shape[-1]
    if denom is None:
        denom = jnp.asarray(float(R * C))

    def colproj(M):
        return jnp.swapaxes(
            project_simplex(jnp.swapaxes(M, -1, -2)), -1, -2)

    def body(_, state):
        X, I2, done = state
        X1 = project_simplex(X + I2)
        I1 = X1 - (X + I2)
        X2 = colproj(X + I1)
        I2n = X2 - (X + I1)
        conv = jnp.abs(X2 - X).sum(axis=(-1, -2)) / \
            jnp.maximum(denom, 1.0) < tol
        keep = (done | conv)[..., None, None]
        Xn = jnp.where(keep, X, X2)
        I2n = jnp.where(done[..., None, None], I2, I2n)
        return Xn, I2n, done | conv

    done0 = jnp.zeros(Y.shape[:-2], bool)
    X, _, _ = jax.lax.fori_loop(
        0, iters, body, (Y, jnp.zeros_like(Y), done0))
    return X


@partial(jax.jit, static_argnames=("max_iter", "pselect", "dual_stochastic",
                                   "block_size"))
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
    block_size: int | None = None,
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
            # the reference projects every (cam_i, cam_j) block toward
            # doubly-stochastic via myproj2dpam (step2:180-186); in the
            # padded camera-major layout all blocks are (block_size,
            # block_size), so the block sweep is one reshape + a batched
            # proj_2dpam. Zero padding is projection-neutral; the
            # convergence normalizer uses REAL per-camera counts.
            if block_size is None:
                raise ValueError(
                    "dual_stochastic=True needs block_size (detections "
                    "per camera in the padded slot layout)")
            nc = N // block_size
            lead = X.shape[:-2]
            Xb = X.reshape(*lead, nc, block_size, nc, block_size)
            Xb = jnp.moveaxis(Xb, -3, -2)  # (..., nc, nc, bs, bs)
            if valid is None:
                denom = jnp.asarray(float(block_size * block_size))
            else:
                counts = valid.reshape(*lead, nc, block_size) \
                    .sum(axis=-1).astype(X.dtype)
                denom = counts[..., :, None] * counts[..., None, :]
            Xb = proj_2dpam(Xb, tol=1e-2, denom=denom)
            Xb = jnp.moveaxis(Xb, -2, -3)
            X = Xb.reshape(*lead, N, N)
            X = jnp.where(same_block, 0.0, X)
            if pselect == 1:
                X = jnp.where(diag_mask, 1.0, X)
            X = jnp.where(pair_valid, X, 0.0)
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
