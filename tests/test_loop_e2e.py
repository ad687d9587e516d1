"""End-to-end loop closing on a synthetic revisit sequence.

The full LoopClosing pipeline (detect -> Sim3 -> correct -> essential graph
-> GBA, `src/LoopClosing.cc:71-110`) exercised through the System on a
circular survey over the PlateWorld relief scene: the camera returns to its
starting view after a full lap (only reachable through BoW retrieval — the
mid-loop views see disjoint terrain) and several revisit keyframes drive the
consistency gate.
"""
import numpy as np
import pytest

from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD
from orb_slam2_tpu.utils.synthetic import PlateWorld, loop_trajectory, ate_rmse
from orb_slam2_tpu.pipeline.system import SlamSystem


@pytest.mark.slow
def test_loop_detected_and_closed():
    fx = 300.0
    cfg = SlamConfig(
        fx=fx, fy=fx, cx=160.0, cy=120.0, width=320, height=240,
        n_features=500, bf=fx * 0.25, sensor=SENSOR_RGBD, fps=10.0,
        th_depth=40.0, max_keyframes=128, max_map_points=1 << 14,
        ba_local_cams=16, ba_fixed_cams=16, ba_max_points=1 << 11,
        ba_max_obs=8, max_local_keyframes=32, max_local_points=1 << 12)
    world = PlateWorld(fx, fx, 160.0, 120.0, 320, 240, z0=5.0)
    gt = loop_trajectory(130, radius=3.0)

    s = SlamSystem(cfg)
    for i, T in enumerate(gt):
        img, depth = world.render_with_depth(T)
        s.track_rgbd(img, depth, i * 0.1)

    traj = s.get_trajectory()
    assert len(traj) >= 0.95 * len(gt), "tracking lost"
    assert s.n_loops_closed >= 1, "no loop closed on the revisit sequence"

    est = [T for _, T in traj]
    gtp = [gt[int(round(ts * 10))] for ts, _ in traj]
    rmse = ate_rmse(est, gtp)
    # the loop spans ~25 world units; drift must stay bounded after closure
    assert rmse < 0.35, f"ATE {rmse*100:.1f} cm too high after loop closure"
