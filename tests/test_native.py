import numpy as np
import pytest

import jax.numpy as jnp

from macaque_tpu.native import load_native, native_available
from macaque_tpu.association.pictorial import (
    infer_pictorial_3d,
    closure_to_clusters,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++/OpenMP not available"
)


def test_pictorial_native_matches_jax():
    rng = np.random.default_rng(0)
    nat = load_native()
    for trial in range(5):
        C = 5
        unary = rng.uniform(0, 1, (13, C))
        cands = rng.uniform(-500, 500, (13, C, 3))
        mean = rng.uniform(80, 150, 13)
        std = rng.uniform(5, 30, 13)
        want = nat.pictorial_infer(unary, cands, mean, std)
        got = np.asarray(infer_pictorial_3d(
            jnp.asarray(unary), jnp.asarray(cands),
            jnp.asarray(mean), jnp.asarray(std),
        ))
        np.testing.assert_array_equal(got, want)


def test_closure_native_matches_python():
    rng = np.random.default_rng(1)
    nat = load_native()
    for trial in range(5):
        N = 12
        X = (rng.uniform(size=(N, N)) < 0.15).astype(np.uint8)
        X = ((X + X.T) > 0).astype(np.uint8)
        np.fill_diagonal(X, 0)
        want = nat.transform_closure(X)
        got = closure_to_clusters(X)
        np.testing.assert_array_equal(got, want)
