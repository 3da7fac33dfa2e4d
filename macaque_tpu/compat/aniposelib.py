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

    @staticmethod
    def from_names(names: Sequence[str],
                   img_size=(2048, 1536)) -> "CameraGroup":
        """Uncalibrated group (reference cameras.py CameraGroup.from_names)
        — a starting point for :meth:`calibrate_videos`."""
        C = len(names)
        K = np.tile(np.array([
            [float(img_size[0]), 0.0, img_size[0] / 2.0],
            [0.0, float(img_size[0]), img_size[1] / 2.0],
            [0.0, 0.0, 1.0]]), (C, 1, 1))
        rig = CameraRig(
            camera_ids=[str(n) for n in names], K=K,
            xi=np.zeros(C), D=np.zeros((C, 4)),
            rvec=np.zeros((C, 3)), tvec=np.zeros((C, 3)),
            size=(int(img_size[0]), int(img_size[1])),
        )
        return CameraGroup(rig)

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

    # -------------------------------------------------------- calibration

    def calibrate_rows(self, all_rows, board, init_intrinsics=True,
                       init_extrinsics=True, verbose=True, **kwargs):
        """Calibrate the whole group from per-camera board-detection rows
        (reference cameras.py:1891-1926): per-camera intrinsic init from
        planar views, PnP board poses, spanning-tree extrinsic init, then
        a full bundle adjustment (JAX LM-CG) over all shared views.
        Returns the final reprojection rms in px."""
        import cv2

        from macaque_tpu.calib.bundle import bundle_adjust_full
        from macaque_tpu.calib.graph_init import (
            initial_extrinsics_from_board_poses,
        )
        from macaque_tpu.calib.videos import (
            estimate_pose_rows, extract_points, merge_rows,
        )

        rig = self.rig
        names = self.get_names()
        assert len(all_rows) == rig.n_cam
        size = rig.size or (2048, 1536)

        K = np.array(rig.K, float)
        if init_intrinsics:
            objp_full = board.object_points()
            for i, rows in enumerate(all_rows):
                obj_v, img_v = [], []
                for r in rows:
                    filled = np.asarray(r["filled"], float).reshape(-1, 2)
                    good = ~np.isnan(filled[:, 0])
                    if good.sum() >= 7:
                        obj_v.append(objp_full[good].reshape(-1, 1, 3)
                                     .astype(np.float32))
                        img_v.append(filled[good].reshape(-1, 1, 2)
                                     .astype(np.float32))
                if not obj_v:
                    raise ValueError(
                        f"camera {names[i]}: no usable board views")
                K[i] = cv2.initCameraMatrix2D(obj_v, img_v, tuple(size))

        for i, rows in enumerate(all_rows):
            estimate_pose_rows(rows, board, K[i], np.zeros(5))

        merged = merge_rows(all_rows, cam_names=names)
        imgp, extra = extract_points(merged, board, cam_names=names,
                                     min_cameras=2)
        if verbose:
            print(f"calibrate_rows: {imgp.shape[1]} shared points over "
                  f"{len(merged)} merged views")

        if init_extrinsics:
            board_poses = [
                [
                    (row[n]["rvec"], row[n]["tvec"])
                    if n in row and row[n].get("rvec") is not None
                    else None
                    for row in merged
                ]
                for n in names
            ]
            rvecs, tvecs = initial_extrinsics_from_board_poses(board_poses)
        else:
            rvecs = np.array(rig.rvec, float)
            tvecs = np.array(rig.tvec, float)

        xi = np.array(rig.xi, float)
        D = np.array(rig.D, float)

        # structure init: DLT-triangulate the shared points with the
        # initial calibration
        init_rig = CameraRig(camera_ids=names, K=K, xi=xi, D=D,
                             rvec=rvecs, tvec=tvecs, size=size)
        p3d0 = CameraGroup(init_rig).triangulate(imgp)
        seen = np.isfinite(p3d0[:, 0])
        obs = imgp[:, seen]
        K2, xi2, D2, rv, tv, _, rms = bundle_adjust_full(
            K, xi, D, rvecs, tvecs, obs, np.nan_to_num(p3d0[seen]),
            **kwargs)
        if verbose:
            print(f"calibrate_rows: bundle rms {rms:.3f} px")

        self.rig = CameraRig(camera_ids=names, K=K2, xi=xi2, D=D2,
                             rvec=rv, tvec=tv, mtx=rig.mtx,
                             dist=rig.dist, size=size,
                             metadata=dict(rig.metadata))
        return rms

    def calibrate_videos(self, videos, board, init_intrinsics=True,
                         init_extrinsics=True, verbose=True, **kwargs):
        """Calibrate from recorded board videos: ``videos`` is a list (one
        per camera) of lists of filenames (reference cameras.py:1950-1964).
        Returns (rms, all_rows)."""
        from macaque_tpu.calib.videos import detect_board_video

        all_rows = []
        for cam_videos in videos:
            rows_cam = []
            for vnum, vidname in enumerate(cam_videos):
                if verbose:
                    print(vidname)
                rows = detect_board_video(vidname, board, prefix=vnum)
                if verbose:
                    print(f"{len(rows)} boards detected")
                rows_cam.extend(rows)
            all_rows.append(rows_cam)

        rms = self.calibrate_rows(all_rows, board,
                                  init_intrinsics=init_intrinsics,
                                  init_extrinsics=init_extrinsics,
                                  verbose=verbose, **kwargs)
        return rms, all_rows

    def optim_points_possible(self, points: np.ndarray, p3ds: np.ndarray,
                              constraints=(), constraints_weak=(),
                              scale_smooth=4, scale_length=2,
                              scale_length_weak=0.5,
                              reproj_error_threshold=15,
                              reproj_loss="soft_l1", n_deriv_smooth=1,
                              scores=None, verbose=False):
        """Multi-hypothesis refinement: (C, F, J, P, 2) candidate points
        + (F, J, 3) init -> (refined (F, J, 3), soft-argmax weights
        (C, F, J, P)) (reference cameras.py:1417-1513)."""
        import jax.numpy as jnp
        from macaque_tpu.geometry.refine3d import (
            refine_points_3d_possible, RefineConfig,
        )

        cfg = RefineConfig(
            scale_smooth=scale_smooth, scale_length=scale_length,
            scale_length_weak=scale_length_weak,
            reproj_error_threshold=reproj_error_threshold,
            reproj_loss=reproj_loss, n_deriv_smooth=n_deriv_smooth,
        )
        p3, alphas = refine_points_3d_possible(
            self.rig.omni(), jnp.asarray(np.asarray(points, float)),
            jnp.asarray(np.asarray(p3ds, float)),
            constraints=list(constraints),
            constraints_weak=list(constraints_weak), cfg=cfg,
            scores=None if scores is None else jnp.asarray(scores),
        )
        return np.asarray(p3), np.asarray(alphas)

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
