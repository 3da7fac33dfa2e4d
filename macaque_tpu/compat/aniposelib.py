"""aniposelib-compatible ``CameraGroup`` facade over the JAX geometry.

Provides the API surface anipose-style workflows use
(reference: src/third_party/aniposelib/cameras.py:558-2013 —
``CameraGroup.load / subset_cameras_names / triangulate /
triangulate_ransac / reprojection_error / optim_points /
optim_points_jointlenfix / project``) with the batched device kernels
underneath, so downstream code written against aniposelib runs unchanged
on this framework.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from macaque_tpu.cameras.rig import CameraRig


class CameraGroup:
    def __init__(self, rig: CameraRig):
        self.rig = rig

    # ------------------------------------------------------------- loading

    @staticmethod
    def load(calibration_toml: str) -> "CameraGroup":
        return CameraGroup(CameraRig.from_calibration_toml(calibration_toml))

    def get_names(self):
        return list(self.rig.camera_ids)

    def subset_cameras_names(self, names: Sequence[str]) -> "CameraGroup":
        return CameraGroup(self.rig.subset_by_names(list(names)))

    def subset_cameras(self, indices) -> "CameraGroup":
        return CameraGroup(self.rig.subset(indices))

    # ------------------------------------------------------------ geometry

    def project(self, points: np.ndarray) -> np.ndarray:
        """(N, 3) -> (C, N, 2)."""
        import jax.numpy as jnp
        from macaque_tpu.cameras.omnidir import omnidir_project

        return np.asarray(
            omnidir_project(self.rig.omni(), jnp.asarray(
                np.asarray(points).reshape(-1, 3)))
        )

    def triangulate(self, points: np.ndarray, undistort: bool = True,
                    progress: bool = False) -> np.ndarray:
        """(C, N, 2) raw pixels -> (N, 3); NaN where <2 cameras."""
        import jax.numpy as jnp
        from macaque_tpu.cameras.omnidir import omnidir_undistort
        from macaque_tpu.geometry.triangulate import triangulate_dlt

        points = np.asarray(points, float)
        one_point = points.ndim == 2
        if one_point:
            points = points.reshape(-1, 1, 2)
        cam = self.rig.omni()
        p = jnp.asarray(points)
        und = omnidir_undistort(cam, p) if undistort else p
        undT = jnp.swapaxes(und, 0, 1)
        mask = ~jnp.isnan(undT[..., 0])
        out = np.asarray(
            triangulate_dlt(jnp.nan_to_num(undT), cam.pmat, mask)
        )
        return out[0] if one_point else out

    def triangulate_ransac(self, points: np.ndarray, undistort: bool = True,
                           min_cams: int = 2, progress: bool = False):
        import jax.numpy as jnp
        from macaque_tpu.geometry.ransac import triangulate_ransac

        p3d, picked, p2d, errs = triangulate_ransac(
            self.rig.omni(), jnp.asarray(np.asarray(points, float)),
            min_cams=min_cams,
        )
        picked3 = np.asarray(picked)[:, :, None]  # (C, N, 1) like reference
        return (np.asarray(p3d), picked3, np.asarray(p2d), np.asarray(errs))

    def reprojection_error(self, p3ds: np.ndarray, p2ds: np.ndarray,
                           mean: bool = False):
        import jax.numpy as jnp
        from macaque_tpu.geometry.triangulate import (
            reprojection_error, reprojection_error_mean,
        )

        p3ds = np.asarray(p3ds, float)
        p2ds = np.asarray(p2ds, float)
        one_point = p3ds.ndim == 1
        if one_point:
            p3ds = p3ds.reshape(1, 3)
            p2ds = p2ds.reshape(-1, 1, 2)
        cam = self.rig.omni()
        if mean:
            out = np.asarray(
                reprojection_error_mean(cam, jnp.asarray(p3ds),
                                        jnp.asarray(p2ds)))
            return float(out[0]) if one_point else out
        out = np.asarray(
            reprojection_error(cam, jnp.asarray(p3ds), jnp.asarray(p2ds)))
        return out.reshape(-1, 2) if one_point else out

    # -------------------------------------------------------- optimization

    def optim_points(self, points: np.ndarray, p3ds: np.ndarray,
                     constraints=(), constraints_weak=(),
                     scale_smooth=4, scale_length=2, scale_length_weak=0.5,
                     reproj_error_threshold=15, reproj_loss="soft_l1",
                     n_deriv_smooth=1, scores=None, verbose=False):
        """(C, F, J, 2) + (F, J, 3) -> refined (F, J, 3), joint lengths."""
        import jax.numpy as jnp
        from macaque_tpu.geometry.refine3d import (
            refine_points_3d, RefineConfig,
        )

        cfg = RefineConfig(
            scale_smooth=scale_smooth, scale_length=scale_length,
            scale_length_weak=scale_length_weak,
            reproj_error_threshold=reproj_error_threshold,
            reproj_loss=reproj_loss, n_deriv_smooth=n_deriv_smooth,
        )
        p3, jl = refine_points_3d(
            self.rig.omni(), jnp.asarray(np.asarray(points, float)),
            jnp.asarray(np.asarray(p3ds, float)),
            constraints=list(constraints),
            constraints_weak=list(constraints_weak), cfg=cfg,
            scores=None if scores is None else jnp.asarray(scores),
        )
        return np.asarray(p3), np.asarray(jl)

    def optim_points_jointlenfix(self, points, p3ds, joint_len, **kwargs):
        import jax.numpy as jnp
        from macaque_tpu.geometry.refine3d import (
            refine_points_3d, RefineConfig,
        )

        cfg = RefineConfig(
            scale_smooth=kwargs.get("scale_smooth", 4),
            scale_length=kwargs.get("scale_length", 2),
            scale_length_weak=kwargs.get("scale_length_weak", 0.5),
            reproj_error_threshold=kwargs.get("reproj_error_threshold", 15),
            reproj_loss=kwargs.get("reproj_loss", "soft_l1"),
            n_deriv_smooth=kwargs.get("n_deriv_smooth", 1),
        )
        p3, jl = refine_points_3d(
            self.rig.omni(), jnp.asarray(np.asarray(points, float)),
            jnp.asarray(np.asarray(p3ds, float)),
            constraints=list(kwargs.get("constraints", ())),
            constraints_weak=list(kwargs.get("constraints_weak", ())),
            cfg=cfg, joint_lengths=jnp.asarray(joint_len),
        )
        return np.asarray(p3), np.asarray(jl)

    def triangulate_optim(self, points: np.ndarray, init_ransac=False,
                          init_progress=False, **kwargs):
        """(C, F, J, 2) -> refined (F, J, 3) (reference cameras.py:1516)."""
        C, F, J, _ = points.shape
        flat = points.reshape(C, F * J, 2)
        if init_ransac:
            p3d, _, _, _ = self.triangulate_ransac(flat)
        else:
            p3d = self.triangulate(flat)
        p3d = p3d.reshape(F, J, 3)
        if np.isfinite(p3d[..., 0]).sum() < 20:
            return p3d
        return self.optim_points(points, p3d, **kwargs)
