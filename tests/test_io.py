"""Tests for trajectory IO, dataset loaders, and the native decoder."""
import os

import numpy as np
import pytest

from orb_slam2_tpu.utils import trajectory, datasets


def rand_pose(rng):
    import jax.numpy as jnp
    from orb_slam2_tpu.geometry import se3
    return np.asarray(se3.exp(jnp.asarray(rng.normal(0, 0.3, 6).astype(np.float32))))


class TestTrajectoryIO:
    def test_tum_roundtrip(self, rng, tmp_path):
        traj = [(float(i) * 0.1, rand_pose(rng)) for i in range(10)]
        p = str(tmp_path / "traj.txt")
        trajectory.save_tum(p, traj)
        loaded = trajectory.load_tum(p)
        assert len(loaded) == 10
        for (t0, T0), (t1, T1) in zip(traj, loaded):
            assert abs(t0 - t1) < 1e-6
            np.testing.assert_allclose(T0, T1, atol=1e-5)

    def test_kitti_format(self, rng, tmp_path):
        traj = [(0.0, rand_pose(rng))]
        p = str(tmp_path / "traj_kitti.txt")
        trajectory.save_kitti(p, traj)
        vals = [float(x) for x in open(p).read().split()]
        assert len(vals) == 12
        np.testing.assert_allclose(np.array(vals).reshape(3, 4),
                                   traj[0][1][:3, :4], rtol=1e-6)

    def test_ate_zero_for_identical(self, rng):
        traj = [(float(i), rand_pose(rng)) for i in range(8)]
        assert trajectory.ate_rmse(traj, traj) < 1e-6

    def test_ate_invariant_to_rigid_offset(self, rng):
        traj = [(float(i), rand_pose(rng)) for i in range(8)]
        off = rand_pose(rng)
        shifted = [(t, off @ T) for t, T in traj]
        assert trajectory.ate_rmse(shifted, traj) < 1e-5

    def test_rpe(self, rng):
        traj = [(float(i), rand_pose(rng)) for i in range(8)]
        st = trajectory.rpe_stats(traj, traj)
        assert st["rmse"] < 1e-6


def _write_png(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(path)


class TestNativeLoader:
    def test_decode_8bit_gray_png(self, rng, tmp_path):
        img = rng.integers(0, 255, size=(48, 64), dtype=np.uint8)
        p = str(tmp_path / "a.png")
        _write_png(p, img)
        s = datasets.ImageStream([p])
        out = next(iter(s))
        assert out.shape == (48, 64)
        np.testing.assert_allclose(out, img.astype(np.float32), atol=0.5)

    def test_decode_16bit_depth_png(self, rng, tmp_path):
        depth = rng.integers(0, 50000, size=(32, 40), dtype=np.uint16)
        p = str(tmp_path / "d.png")
        _write_png(p, depth)
        s = datasets.ImageStream([p], gray=False)
        out = next(iter(s))
        np.testing.assert_array_equal(out, depth)

    def test_decode_rgb_png(self, rng, tmp_path):
        img = rng.integers(0, 255, size=(20, 30, 3), dtype=np.uint8)
        p = str(tmp_path / "c.png")
        _write_png(p, img)
        s = datasets.ImageStream([p])
        out = next(iter(s))
        expected = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2])
        np.testing.assert_allclose(out, expected, atol=1.0)

    def test_stream_order_and_prefetch(self, rng, tmp_path):
        paths = []
        for i in range(12):
            img = np.full((8, 8), i, dtype=np.uint8)
            p = str(tmp_path / f"{i:03d}.png")
            _write_png(p, img)
            paths.append(p)
        s = datasets.ImageStream(paths, window=4, threads=3)
        for i, img in enumerate(s):
            assert img[0, 0] == i
        assert i == 11

    def test_native_lib_is_used(self):
        lib = datasets._load_native()
        assert lib is not None, "native loader failed to build/load"


class TestTumDataset:
    def test_rgbd_association(self, rng, tmp_path):
        seq = tmp_path / "seq"
        (seq / "rgb").mkdir(parents=True)
        (seq / "depth").mkdir(parents=True)
        rgb_lines = ["# comment"]
        depth_lines = ["# comment"]
        for i in range(5):
            img = rng.integers(0, 255, size=(16, 16), dtype=np.uint8)
            d = rng.integers(0, 5000, size=(16, 16), dtype=np.uint16)
            _write_png(str(seq / "rgb" / f"{i}.png"), img)
            _write_png(str(seq / "depth" / f"{i}.png"), d)
            rgb_lines.append(f"{i * 0.1:.6f} rgb/{i}.png")
            depth_lines.append(f"{i * 0.1 + 0.005:.6f} depth/{i}.png")
        (seq / "rgb.txt").write_text("\n".join(rgb_lines))
        (seq / "depth.txt").write_text("\n".join(depth_lines))
        ds = datasets.TumRGBD(str(seq))
        frames = list(ds)
        assert len(frames) == 5
        ts, img, depth = frames[2]
        assert abs(ts - 0.2) < 1e-6
        assert img.shape == (16, 16) and depth.shape == (16, 16)


class TestKittiDataset:
    def test_stereo_and_mono(self, rng, tmp_path):
        seq = tmp_path / "00"
        (seq / "image_0").mkdir(parents=True)
        (seq / "image_1").mkdir(parents=True)
        for i in range(4):
            _write_png(str(seq / "image_0" / f"{i:06d}.png"),
                       rng.integers(0, 255, size=(12, 20), dtype=np.uint8))
            _write_png(str(seq / "image_1" / f"{i:06d}.png"),
                       rng.integers(0, 255, size=(12, 20), dtype=np.uint8))
        (seq / "times.txt").write_text("\n".join(f"{i*0.1:.6f}" for i in range(4)))
        st = list(datasets.KittiStereo(str(seq)))
        assert len(st) == 4
        ts, l, r = st[1]
        assert abs(ts - 0.1) < 1e-9 and l.shape == (12, 20) and r.shape == (12, 20)
        mono = list(datasets.KittiMonocular(str(seq)))
        assert len(mono) == 4 and mono[0][1].shape == (12, 20)


class TestEurocDataset:
    def _make_seq(self, rng, tmp_path, n=4):
        for cam in ("cam0", "cam1"):
            d = tmp_path / "mav0" / cam / "data"
            d.mkdir(parents=True)
            lines = ["#timestamp [ns],filename"]
            for i in range(n):
                ts_ns = 1403630000000000000 + i * 50_000_000
                fname = f"{ts_ns}.png"
                _write_png(str(d / fname),
                           rng.integers(0, 255, size=(10, 14), dtype=np.uint8))
                lines.append(f"{ts_ns},{fname}")
            (tmp_path / "mav0" / cam / "data.csv").write_text("\n".join(lines))
        return str(tmp_path)

    def test_stereo_pairs(self, rng, tmp_path):
        seq = self._make_seq(rng, tmp_path)
        ds = list(datasets.EurocStereo(seq))
        assert len(ds) == 4
        ts, l, r = ds[0]
        assert l.shape == (10, 14) and r.shape == (10, 14)

    def test_mono_cam0(self, rng, tmp_path):
        seq = self._make_seq(rng, tmp_path)
        ds = list(datasets.EurocMonocular(seq))
        assert len(ds) == 4
        assert ds[1][0] - ds[0][0] == pytest.approx(0.05, abs=1e-6)

    def test_stereo_with_rectifier(self, rng, tmp_path):
        from orb_slam2_tpu.geometry.rectify import (
            StereoRectifier, init_undistort_rectify_map)
        seq = self._make_seq(rng, tmp_path)
        K = np.array([[20.0, 0, 7.0], [0, 20.0, 5.0], [0, 0, 1]])
        maps = init_undistort_rectify_map(K, np.zeros(5), np.eye(3), K, 14, 10)
        rect = StereoRectifier(maps, maps)
        ds = list(datasets.EurocStereo(seq, rectifier=rect))
        assert len(ds) == 4
        # identity rectification: images unchanged
        raw = list(datasets.EurocStereo(seq))
        np.testing.assert_allclose(ds[0][1], raw[0][1], atol=1e-3)
