import numpy as np
import jax.numpy as jnp

from macaque_tpu.tools.validation import (
    check_performance, centroids_from_kp3d, ValidationResult,
)
from macaque_tpu.tools.analysis import (
    trajectories, pairwise_proximity, joint_length_stats, speed,
)
from macaque_tpu.compat import CameraGroup
from macaque_tpu.core.trace import StageTimes
from tests.test_triangulate import make_rig
from tests.test_cameras import world_points
from macaque_tpu.cameras import omnidir_project
from macaque_tpu.cameras.rig import CameraRig


class TestValidation:
    def test_perfect_match(self):
        rng = np.random.default_rng(0)
        gt = rng.uniform(-500, 500, (3, 50, 3))
        pred = gt + rng.normal(0, 50, gt.shape)  # well under 400mm
        r = check_performance(pred, gt, exit_point=None)
        assert r.precision == 1.0 and r.recall == 1.0

    def test_false_positives_and_negatives(self):
        gt = np.zeros((2, 10, 3))
        gt[1] += 2000
        pred = np.full((3, 10, 3), np.nan)
        pred[0] = gt[0] + 10  # one matched
        pred[2] = 9000        # far away -> FP, and gt[1] unmatched -> FN
        r = check_performance(pred, gt, exit_point=None)
        assert r.tp == 10 and r.fp == 10 and r.fn == 10
        assert abs(r.precision - 0.5) < 1e-9

    def test_exit_zone_exclusion(self):
        gt = np.tile(np.array([5000.0, 0.0, 800.0]), (1, 10, 1)).reshape(1, 10, 3)
        pred = np.full((1, 10, 3), np.nan)
        r = check_performance(pred, gt)  # all GT excluded at exit point
        assert r.fn == 0

    def test_centroids(self):
        kp3d = np.zeros((1, 5, 17, 3))
        kp3d[0, :, 5] = [100, 0, 0]
        kp3d[0, :, 6] = [200, 0, 0]
        c = centroids_from_kp3d(kp3d)
        np.testing.assert_allclose(c[0, 0], [150, 0, 0])


class TestAnalysis:
    def test_shapes(self):
        kp3d = np.random.default_rng(1).normal(0, 100, (2, 30, 17, 3))
        assert trajectories(kp3d).shape == (2, 30, 3)
        assert pairwise_proximity(kp3d).shape == (2, 2, 30)
        assert speed(kp3d).shape == (2, 29)
        stats = joint_length_stats(kp3d, [(5, 6), (11, 12)])
        assert set(stats) == {(5, 6), (11, 12)}


class TestCameraGroupCompat:
    def test_roundtrip_triangulate(self, tmp_path):
        rig_cam = make_rig(4)
        rig = CameraRig(
            camera_ids=[f"c{i}" for i in range(4)],
            K=np.asarray(rig_cam.K), xi=np.asarray(rig_cam.xi),
            D=np.asarray(rig_cam.D), rvec=np.asarray(rig_cam.rvec),
            tvec=np.asarray(rig_cam.tvec),
            mtx=np.asarray(rig_cam.K), dist=np.zeros((4, 5)),
            size=(2048, 1536),
        )
        # TOML round-trip (CameraGroup.load path)
        path = str(tmp_path / "calibration.toml")
        rig.to_calibration_toml(path)
        cg = CameraGroup.load(path)
        assert cg.get_names() == rig.camera_ids
        cg = cg.subset_cameras_names(rig.camera_ids)

        pts = world_points(3, 10) * 0.3
        pix = cg.project(pts)
        assert pix.shape == (4, 10, 2)
        p3d = cg.triangulate(pix)
        np.testing.assert_allclose(p3d, pts, atol=1e-4)
        err = cg.reprojection_error(p3d, pix, mean=True)
        assert np.nanmax(err) < 1e-3

    def test_timer(self, tmp_path):
        t = StageTimes()
        with t.stage("x"):
            pass
        assert "x" in t.summary()
        t.dump(str(tmp_path / "t.json"))


class TestConfigToml:
    def test_anipose_config_roundtrip(self, tmp_path):
        import tomllib
        from macaque_tpu.core.config import PipelineConfig

        cfg = PipelineConfig(data_name="x")
        path = str(tmp_path / "config.toml")
        cfg.to_anipose_config_toml(path)
        with open(path, "rb") as f:
            doc = tomllib.load(f)
        tri = doc["triangulation"]
        assert tri["optim"] is True and tri["ransac"] is False
        assert tri["scale_smooth"] == 3.0
        assert tri["n_deriv_smooth"] == 2
        assert len(tri["constraints"]) == 20
        assert len(tri["constraints_weak"]) == 11
        assert doc["filter"]["type"] == "viterbi"


def test_class_weights_and_training_log(tmp_path):
    """id_eval notebook surfaces: class weights + mmengine log parsing."""
    import json

    from macaque_tpu.tools.analysis import (
        class_weights_from_counts, moving_average, parse_training_log,
    )

    w = class_weights_from_counts([176, 50, 121, 165, 1340, 52])
    assert abs(w[0] - sum([176, 50, 121, 165, 1340, 52]) / (6 * 176)) < 1e-9
    assert w[4] == min(w)  # most frequent class gets least weight

    log = tmp_path / "vis.json"
    with open(log, "w") as f:
        for ep in range(1, 4):
            for it in range(3):
                f.write(json.dumps({"epoch": ep, "iter": it,
                                    "loss": 1.0 / ep + it * 0.01}) + "\n")
            f.write(json.dumps({"step": ep,
                                "accuracy/top1": 50.0 + ep * 10}) + "\n")
    d = parse_training_log(str(log))
    assert list(d["train_epochs"]) == [1, 2, 3]
    assert d["avg_loss"][0] > d["avg_loss"][2]
    assert d["best_step"] == 3 and d["best_acc"] == 80.0

    m = moving_average([1.0, 1, 1, 5, 1, 1, 1], window=3)
    assert m.shape == (7,) and abs(m[3] - 7 / 3) < 1e-9


def test_joint_length_summary_and_h5_inspect(tmp_path):
    import h5py

    from macaque_tpu.tools.analysis import (
        inspect_calibration_h5, joint_length_summary,
    )

    jl = np.abs(np.random.default_rng(0).normal(100, 5, (4, 16)))
    s = joint_length_summary(jl)
    assert s["mean"].shape == (16,) and len(s["labels"]) == 16
    np.testing.assert_allclose(s["mean"], jl.mean(axis=0))

    p = tmp_path / "cam_intrinsic.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("/123/mtx", data=np.diag([800.0, 900, 1]))
        f.create_dataset("/123/dist", data=np.zeros((1, 5)))
    info = inspect_calibration_h5(str(p))
    assert info["123"]["fx"] == 800.0 and info["123"]["fy"] == 900.0
    assert info["123"]["dist"] == (1, 5)
