"""Autoencoder keypoint-score filter.

Reimplements anipose's autoencoder filter family
(reference: src/third_party/anipose/filter_pose.py:263-330 +
train_autoencoder.py): a small MLP autoencoder is trained on the
*pattern of visible keypoints* from confident frames; at filtering time
each frame's visibility pattern is reconstructed and keypoints whose
reconstructed visibility falls below threshold get their scores replaced
by the reconstruction (down-weighting keypoints that are implausible
given the visible context, e.g. a hallucinated left wrist when the whole
left arm is occluded).

Training runs on-device with optax in a few seconds (the reference shells
out to scikit-learn's MLPRegressor on host).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class AEParams(NamedTuple):
    w1: jnp.ndarray
    b1: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray


def _forward(params: AEParams, x: jnp.ndarray) -> jnp.ndarray:
    h = jnp.tanh(x @ params.w1 + params.b1)
    return jax.nn.sigmoid(h @ params.w2 + params.b2)


def train_autoencoder(
    scores: np.ndarray,
    score_threshold: float = 0.5,
    hidden: int = 16,
    epochs: int = 300,
    lr: float = 1e-2,
    seed: int = 0,
) -> AEParams:
    """scores: (N_frames, J) keypoint confidences. Trains visibility
    pattern reconstruction on binarized scores."""
    import optax

    x = (np.nan_to_num(scores) > score_threshold).astype(np.float32)
    x = jnp.asarray(x)
    J = x.shape[1]

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    params = AEParams(
        w1=jax.random.normal(k1, (J, hidden)) * 0.3,
        b1=jnp.zeros(hidden),
        w2=jax.random.normal(k2, (hidden, J)) * 0.3,
        b2=jnp.zeros(J),
    )
    opt = optax.adam(lr)
    state = opt.init(params)

    def loss_fn(p, batch):
        pred = _forward(p, batch)
        eps = 1e-7
        return -jnp.mean(
            batch * jnp.log(pred + eps) + (1 - batch) * jnp.log(1 - pred + eps)
        )

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p, x)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    for _ in range(epochs):
        params, state, loss = step(params, state)
    return params


def save_autoencoder(params: AEParams, fname: str) -> str:
    """Persist trained filter weights (the reference pickles an sklearn
    MLP to config['filter']['autoencoder_path']; this is the npz
    equivalent for the session filter driver)."""
    np.savez(fname, **{k: np.asarray(v)
                       for k, v in params._asdict().items()})
    return fname


def load_autoencoder(fname: str) -> AEParams:
    with np.load(fname) as d:
        return AEParams(**{k: jnp.asarray(d[k]) for k in AEParams._fields})


def filter_scores_autoencoder(
    params: AEParams,
    scores: np.ndarray,
    score_threshold: float = 0.5,
) -> np.ndarray:
    """Replace each keypoint's score with min(score, reconstructed
    visibility) — implausible keypoints are suppressed (semantics of
    anipose filter_pose_autoencoder_scores)."""
    x = (np.nan_to_num(scores) > score_threshold).astype(np.float32)
    recon = np.asarray(_forward(params, jnp.asarray(x)))
    return np.minimum(np.nan_to_num(scores), recon)
