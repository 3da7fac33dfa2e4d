"""CameraRig I/O: the reference's h5 calibration pair + YAML config
(the real-data entry path of run_demo.proc)."""

import os

import numpy as np
import pytest

from macaque_tpu.cameras.rig import CameraRig
from macaque_tpu.tools.synthetic import make_test_rig

h5py = pytest.importorskip("h5py")
yaml = pytest.importorskip("yaml")


def write_reference_calib(tmp_path, rig):
    """Write cam_intrinsic.h5 / cam_extrinsic_optim.h5 / config.yaml in
    the reference layout (mct:80-116,615-621; calib/config.yaml)."""
    cfg = {
        "camera_id": [int(c) for c in rig.camera_ids],
        "img_size": [rig.size[0], rig.size[1]],
    }
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    with h5py.File(str(tmp_path / "cam_intrinsic.h5"), "w") as f:
        for i, cid in enumerate(rig.camera_ids):
            f.create_dataset(f"/{cid}/K", data=rig.K[i])
            f.create_dataset(f"/{cid}/xi", data=np.array([[rig.xi[i]]]))
            f.create_dataset(f"/{cid}/D", data=rig.D[i].reshape(1, 4))
            f.create_dataset(f"/{cid}/mtx", data=rig.mtx[i])
            f.create_dataset(f"/{cid}/dist", data=rig.dist[i].reshape(1, -1))
    with h5py.File(str(tmp_path / "cam_extrinsic_optim.h5"), "w") as f:
        for i, cid in enumerate(rig.camera_ids):
            f.create_dataset(f"/{cid}/rvec", data=rig.rvec[i].reshape(3, 1))
            f.create_dataset(f"/{cid}/tvec", data=rig.tvec[i].reshape(3, 1))
    return cfg_path


def test_from_h5_roundtrip(tmp_path):
    rig = make_test_rig(4, seed=7)
    cfg_path = write_reference_calib(tmp_path, rig)
    loaded = CameraRig.from_h5(cfg_path)
    assert loaded.camera_ids == rig.camera_ids
    np.testing.assert_allclose(loaded.K, rig.K)
    np.testing.assert_allclose(loaded.xi, rig.xi)
    np.testing.assert_allclose(loaded.D, rig.D)
    np.testing.assert_allclose(loaded.rvec, rig.rvec)
    np.testing.assert_allclose(loaded.tvec, rig.tvec)
    np.testing.assert_allclose(loaded.mtx, rig.mtx)
    assert loaded.size == rig.size

    # pmat agrees with the pytree's differentiable extrinsics
    import jax.numpy as jnp

    np.testing.assert_allclose(
        loaded.pmat(), np.asarray(loaded.omni().pmat), atol=1e-10
    )

    # PipelineConfig.from_yaml picks up camera ids and image size
    from macaque_tpu.core.config import PipelineConfig

    pc = PipelineConfig.from_yaml(cfg_path)
    assert pc.camera_ids == tuple(rig.camera_ids)
    assert pc.img_size == rig.size
