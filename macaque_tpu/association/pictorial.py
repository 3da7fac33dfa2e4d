"""Pictorial-structure inference and transitive closure, TPU-style.

The reference ships these as its only in-repo native kernels
(Cython + OpenMP: src/m_lib/pictorial.pyx — ``inferPict3D_MaxProd``
:109-150, ``transform_closure`` :152-185, skeleton ``getskel`` :22-51).
They are max-product belief propagation over a 13-joint tree and an O(N^3)
boolean transitive closure.

Here the per-candidate loops become (C x C) tensor ops (the DP over the
tree is a short static Python loop over 12 edges — XLA unrolls it), and the
closure is log2(N) boolean matmuls. A C++/OpenMP parity implementation
lives in macaque_tpu/native for CPU-oracle testing, mirroring the
reference's native layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 13-joint mvpose skeleton: Nose, L/R shoulder, L/R elbow, L/R wrist,
# L/R hip, L/R knee, L/R ankle. parent[j] = parent joint of j (root -1).
PICTORIAL_PARENT = np.array([-1, 0, 0, 1, 2, 3, 4, 0, 0, 7, 8, 9, 10])

PICTORIAL_NAMES = [
    "Nose", "LSho", "RSho", "LElb", "RElb", "LWri", "RWri",
    "LHip", "RHip", "LKne", "RKne", "LAnk", "RAnk",
]

# map from the 17-keypoint COCO/macaque layout to the 13-joint tree
COCO17_TO_PICTORIAL = np.array([0, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16])


def macaque_skeleton_tree() -> dict:
    """Skeleton tree in the reference's dict format (pictorial.pyx:22-51)."""
    children: list[list[int]] = [[] for _ in range(13)]
    for j, p in enumerate(PICTORIAL_PARENT):
        if p >= 0:
            children[p].append(j)
    return {
        "tree": [
            {"name": PICTORIAL_NAMES[j], "children": children[j]}
            for j in range(13)
        ]
    }


def infer_pictorial_3d(
    unary: jnp.ndarray,
    candidates: jnp.ndarray,
    bone_mean: jnp.ndarray,
    bone_std: jnp.ndarray,
) -> jnp.ndarray:
    """Max-product assignment of one 3D candidate per joint.

    unary:      (13, C) log/score potentials per joint candidate
    candidates: (13, C, 3) candidate 3D positions
    bone_mean/bone_std: (13,) Gaussian bone-length prior per joint
      (indexed by child joint; entry 0 — the root — is unused)

    Returns (13,) int32 candidate index per joint. Pairwise potential is
    ``exp(-(d - mean)^2 / (2 std^2)) / std`` (pictorial.pyx:136).
    """
    C = unary.shape[1]

    def pair_prior(j):
        p = PICTORIAL_PARENT[j]
        d = jnp.linalg.norm(
            candidates[j][:, None, :] - candidates[p][None, :, :], axis=-1
        )  # (C_child, C_parent)
        return jnp.exp(-((d - bone_mean[j]) ** 2) / (2 * bone_std[j] ** 2)) / bone_std[j]

    # Upward pass: children (higher index) before parents, like the
    # reference's reverse loop. messages[j] added into parent's unary.
    msgs = {}
    unary_acc = [unary[j] for j in range(13)]
    for j in range(12, 0, -1):
        p = PICTORIAL_PARENT[j]
        prior = pair_prior(j)  # (C, C_parent)
        scores = prior + unary_acc[j][:, None]
        msg = jnp.max(scores, axis=0)       # (C_parent,)
        msgs[j] = scores                     # kept for backtracking
        unary_acc[p] = unary_acc[p] + msg

    picks = [None] * 13
    picks[0] = jnp.argmax(unary_acc[0])
    for j in range(1, 13):
        p = PICTORIAL_PARENT[j]
        # reference backtrack (pictorial.pyx:146-150) recomputes
        # prior + accumulated unary of the child given the parent pick
        prior = pair_prior(j)
        scores = prior + unary_acc[j][:, None]
        picks[j] = jnp.argmax(scores[:, picks[p]])
    return jnp.stack([p.astype(jnp.int32) for p in picks])


def transitive_closure(X: jnp.ndarray) -> jnp.ndarray:
    """Boolean transitive closure of (..., N, N) via iterated squaring
    (log2 N boolean matmuls instead of the reference's O(N^3) triple loop,
    pictorial.pyx:152-170)."""
    X = X.astype(bool)
    eye = jnp.eye(X.shape[-1], dtype=bool)
    R = X | eye
    n = X.shape[-1]
    steps = max(1, int(np.ceil(np.log2(max(n, 2)))))
    for _ in range(steps):
        R = R | jnp.einsum("...ik,...kj->...ij", R, R)
    return R & ~eye | X


def closure_to_clusters(X_bin: np.ndarray) -> np.ndarray:
    """Convert a binary relation matrix to a cluster/permutation matrix
    (semantics of ``transform_closure``'s second half, pictorial.pyx:171-185):
    scan representatives in index order; each unvisited row claims every
    node reachable from it."""
    X = np.asarray(transitive_closure(jnp.asarray(X_bin)))
    N = X.shape[0]
    reach = X | np.eye(N, dtype=bool)
    vis = np.zeros(N, dtype=bool)
    out = np.zeros_like(X_bin)
    for i in range(N):
        if vis[i]:
            continue
        members = np.where(reach[i])[0]
        vis[members] = True
        out[members, i] = 1
    return out
