"""Cross-view and cross-frame association.

TPU-native rebuilds of the reference's mvpose-style matching stack:
ray-distance affinity (step2:373-432), SVT spectral matching
(step2:130-216), per-person camera-combo refinement (step2:610-658),
pictorial-structure inference + transitive closure (m_lib/pictorial.pyx).

A key structural finding used here: the reference computes a temporal
continuity matrix (``cont_mat``, step2:563-575) but never adds it to the
affinity, so keyframes are mutually independent — this implementation
therefore batches *all* keyframes' affinity + SVT solves into one device
program instead of looping frame by frame.
"""

from macaque_tpu.association.affinity import (
    build_rays,
    line_distance_matrix,
    geometry_affinity,
    combined_affinity,
)
from macaque_tpu.association.svt import match_svt, project_simplex
from macaque_tpu.association.pictorial import (
    macaque_skeleton_tree,
    infer_pictorial_3d,
    transitive_closure,
)

__all__ = [
    "build_rays",
    "line_distance_matrix",
    "geometry_affinity",
    "combined_affinity",
    "match_svt",
    "project_simplex",
    "macaque_skeleton_tree",
    "infer_pictorial_3d",
    "transitive_closure",
]
