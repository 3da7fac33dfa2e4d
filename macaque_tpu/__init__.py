"""macaque_tpu — TPU-native multi-view, multi-animal markerless 3D pose estimation.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
sidd-bme/macaque-3d-pose-estimation (see /root/repo/SURVEY.md):
synchronized multi-camera video -> detection -> tracking -> 2D pose -> ID ->
cross-view matching -> cross-frame tracking -> robust 3D reconstruction.

Unlike the reference (PyTorch/CUDA + OpenCV + SciPy + Cython), every numeric
hot path here is expressed as batched, statically-shaped JAX so it compiles to
the TPU MXU/VPU, and multi-camera / multi-frame work is sharded over a
``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
