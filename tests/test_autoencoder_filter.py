import numpy as np

from macaque_tpu.filters.autoencoder import (
    train_autoencoder, filter_scores_autoencoder,
)


def test_autoencoder_suppresses_implausible_keypoints():
    """Train on data where joints 0-7 and 8-16 are visible as coherent
    groups; a lone joint from an otherwise-hidden group should be
    down-weighted."""
    rng = np.random.default_rng(0)
    N, J = 400, 17
    scores = np.zeros((N, J), np.float32)
    for i in range(N):
        if rng.uniform() < 0.5:
            scores[i, :8] = rng.uniform(0.7, 1.0, 8)
            scores[i, 8:] = rng.uniform(0.0, 0.2, 9)
        else:
            scores[i, 8:] = rng.uniform(0.7, 1.0, 9)
            scores[i, :8] = rng.uniform(0.0, 0.2, 8)

    params = train_autoencoder(scores, epochs=400)

    # plausible frame: group A visible
    frame_good = np.zeros((1, J), np.float32)
    frame_good[0, :8] = 0.9
    out_good = filter_scores_autoencoder(params, frame_good)
    assert out_good[0, :8].mean() > 0.5

    # implausible: single joint of group B claims visibility among group A
    frame_bad = frame_good.copy()
    frame_bad[0, 12] = 0.9
    out_bad = filter_scores_autoencoder(params, frame_bad)
    assert out_bad[0, 12] < 0.5, out_bad[0, 12]
    # group A keypoints keep their support
    assert out_bad[0, :8].mean() > 0.5
