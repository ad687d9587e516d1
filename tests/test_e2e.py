"""End-to-end pipeline tests on the synthetic plane world (small configs to
keep CPU compile times down)."""
import numpy as np
import pytest

from orb_slam2_tpu.utils.config import (SlamConfig, SENSOR_MONOCULAR,
                                        SENSOR_STEREO, SENSOR_RGBD)
from orb_slam2_tpu.utils.synthetic import PlaneWorld, lateral_trajectory, ate_rmse
from orb_slam2_tpu.pipeline.system import SlamSystem


def small_cfg(sensor, **kw):
    fx = 300.0
    base = dict(
        fx=fx, fy=fx, cx=160.0, cy=120.0, width=320, height=240,
        n_features=400, fps=10.0, th_depth=60.0, sensor=sensor,
        bf=fx * 0.1 if sensor != SENSOR_MONOCULAR else 0.0,
        max_keyframes=32, max_map_points=1 << 13,
        ba_local_cams=8, ba_fixed_cams=8, ba_max_points=1 << 10, ba_max_obs=6,
        max_local_keyframes=16, max_local_points=1 << 11,
    )
    base.update(kw)
    return SlamConfig(**base)


@pytest.mark.slow
class TestEndToEnd:
    def test_rgbd_tracks_and_low_ate(self):
        cfg = small_cfg(SENSOR_RGBD)
        world = PlaneWorld(cfg.fx, cfg.fy, cfg.cx, cfg.cy, 320, 240, z0=4.0)
        gt = lateral_trajectory(16, step=0.04, yaw_rate=0.004)
        s = SlamSystem(cfg)
        for i, T in enumerate(gt):
            img, depth = world.render_with_depth(T)
            s.track_rgbd(img, depth, i * 0.1)
        traj = s.get_trajectory()
        assert len(traj) == len(gt)
        est = [T for _, T in traj]
        rmse = ate_rmse(est, gt[: len(est)])
        assert rmse < 0.05, rmse
        assert int(s.m.n_points) > 200

    def test_relocalization_after_kidnap(self):
        """Tracking::Relocalization e2e (src/Tracking.cc:2039-2262): build a
        map, kidnap the tracker (force LOST), feed a frame rendered at an
        already-mapped pose, and require the PnP + rescue-round pipeline to
        recover it with a correct pose."""
        from orb_slam2_tpu.pipeline import system as system_mod

        cfg = small_cfg(SENSOR_RGBD)
        world = PlaneWorld(cfg.fx, cfg.fy, cfg.cx, cfg.cy, 320, 240, z0=4.0)
        gt = lateral_trajectory(14, step=0.04, yaw_rate=0.004)
        s = SlamSystem(cfg)
        for i, T in enumerate(gt):
            img, depth = world.render_with_depth(T)
            s.track_rgbd(img, depth, i * 0.1)
        assert s.voc is not None, "vocabulary should have self-trained"

        s.state = system_mod.LOST          # kidnap
        revisit = 4
        img, depth = world.render_with_depth(gt[revisit])
        Tcw = s.track_rgbd(img, depth, 99.0)
        assert Tcw is not None, "relocalization failed"
        assert s.get_tracking_state() == system_mod.OK
        t_err = np.linalg.norm(np.linalg.inv(Tcw)[:3, 3] - gt[revisit][:3, 3])
        assert t_err < 0.05, t_err

    def test_stereo_tracks_and_low_ate(self):
        """True-scale stereo pipeline (the reference's stereo_kitti path):
        L/R rendering with a horizontal baseline, row-banded SAD matching,
        depth-seeded map points."""
        # wider baseline than the rgbd default: at z=4 the SAD disparity is
        # bf/z px, and depth noise grows as z^2/(b*fx) — 0.1 gives only
        # 7.5 px disparity and ~8 cm ATE from subpixel noise alone
        cfg = small_cfg(SENSOR_STEREO, bf=300.0 * 0.25)
        world = PlaneWorld(cfg.fx, cfg.fy, cfg.cx, cfg.cy, 320, 240, z0=4.0)
        gt = lateral_trajectory(12, step=0.04, yaw_rate=0.004)
        s = SlamSystem(cfg)
        b = cfg.baseline
        for i, T in enumerate(gt):
            img_l = world.render(T)
            T_r = T.copy()
            T_r[:3, 3] = T[:3, 3] + T[:3, :3] @ np.array([b, 0.0, 0.0])
            img_r = world.render(T_r)
            s.track_stereo(img_l, img_r, i * 0.1)
        traj = s.get_trajectory()
        assert len(traj) == len(gt)
        est = [T for _, T in traj]
        rmse = ate_rmse(est, gt[: len(est)])
        assert rmse < 0.05, rmse

    def test_mono_initializes_and_tracks(self):
        cfg = small_cfg(SENSOR_MONOCULAR, n_features=1000)
        world = PlaneWorld(cfg.fx, cfg.fy, cfg.cx, cfg.cy, 320, 240, z0=4.0)
        gt = lateral_trajectory(12, step=0.05, yaw_rate=0.0)
        s = SlamSystem(cfg)
        for i, T in enumerate(gt):
            s.track_monocular(world.render(T), i * 0.1)
        traj = s.get_trajectory()
        assert len(traj) >= len(gt) - 3     # init consumes a couple of frames
        est = [T for _, T in traj]
        gtp = gt[len(gt) - len(est):]
        rmse = ate_rmse(est, gtp, with_scale=True)
        assert rmse < 0.12, rmse
