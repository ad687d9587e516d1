"""Two-chip tracking/mapping pipeline split (SURVEY P1/P7, VERDICT r3 #9).

`SlamSystem(pipeline_depth>0, mapping_device=dev1)` dispatches every
keyframe's mapping pass (cull/triangulate/fuse/local BA/KF-cull) to a second
device and adopts the result at the next retire, while the tracking stream
keeps running on the pre-keyframe snapshot — the reference's
tracking-thread / mapping-thread concurrency (`src/LocalMapping.cc:71-159`)
expressed as a dataflow edge between chips. The pure MapState -> MapState
mapping pass makes the split correct by construction: no shared mutable
state, just a one-event adoption delay.

Runs on the 8-virtual-device CPU mesh from conftest; on hardware the same
code targets two TPU chips with the map snapshot riding ICI.
"""
import dataclasses

import jax
import numpy as np
import pytest

from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD
from orb_slam2_tpu.utils.synthetic import (PlateWorld, lateral_trajectory,
                                           ate_rmse)
from orb_slam2_tpu.pipeline.system import SlamSystem

FX = 260.0


def _cfg():
    return SlamConfig(fx=FX, fy=FX, cx=160.0, cy=120.0, width=320, height=240,
                      n_features=500, bf=FX * 0.25, sensor=SENSOR_RGBD,
                      fps=10.0, th_depth=40.0, max_keyframes=64,
                      max_map_points=1 << 14, ba_local_cams=16,
                      ba_fixed_cams=16, ba_max_points=1 << 11, ba_max_obs=8,
                      max_local_keyframes=32, max_local_points=1 << 12)


def _run(cfg, frames, mapping_device=None):
    s = SlamSystem(cfg, enable_loop_closing=False, pipeline_depth=2,
                   mapping_device=mapping_device)
    for i, (img, d) in enumerate(frames):
        s.track_rgbd(img, d, i / cfg.fps)
    s.flush()
    return s


@pytest.mark.slow
def test_split_matches_single_device():
    assert len(jax.devices()) >= 2, "conftest provides 8 virtual devices"
    cfg = _cfg()
    world = PlateWorld(FX, FX, 160.0, 120.0, 320, 240, z0=5.0)
    gt = lateral_trajectory(40, step=0.05)
    frames = [world.render_with_depth(T) for T in gt]

    def ate_of(s):
        traj = s.get_trajectory()
        assert len(traj) >= 0.95 * len(gt), f"tracked {len(traj)}/{len(gt)}"
        est = [T for _, T in traj]
        gtp = [gt[int(round(ts * cfg.fps))] for ts, _ in traj]
        return ate_rmse(est, gtp)

    s_one = _run(cfg, frames)
    rmse_one = ate_of(s_one)

    s_two = _run(cfg, frames, mapping_device=jax.devices()[1])
    rmse_two = ate_of(s_two)

    # the split's only semantic difference is the one-event adoption delay:
    # accuracy must stay in the single-device stream's band
    assert rmse_two < max(3.0 * rmse_one, 0.03), \
        f"split ATE {rmse_two*100:.1f} cm vs single {rmse_one*100:.1f} cm"
    # mapping genuinely ran remotely and was adopted (event accounting)
    assert s_two.stage_ms.get("mapping_adopt_wall") is not None
    # a comparable map was built (keyframes within the stream-policy band)
    assert abs(int(s_two.m.n_keyframes) - int(s_one.m.n_keyframes)) <= 3
    # the adopted map lives on the tracking device
    dev = list(s_two.m.kf_pose.devices())[0]
    assert dev == jax.devices()[0]


@pytest.mark.slow
def test_split_survives_pose_correction():
    """The corrected branch of the split adoption (loop closure / periodic
    GBA / amortized GBA chunk) drains the in-flight queue; the retire that
    adopted the pass must then return the keyframe pose instead of popping
    an empty deque (advisor r4 high: IndexError at the first correction in
    any mapping_device run with loop closing on)."""
    assert len(jax.devices()) >= 2
    cfg = dataclasses.replace(_cfg(), gba_every_n_kf=2,
                              gba_total_iters=4)
    world = PlateWorld(FX, FX, 160.0, 120.0, 320, 240, z0=5.0)
    gt = lateral_trajectory(40, step=0.05)
    frames = [world.render_with_depth(T) for T in gt]
    s = SlamSystem(cfg, enable_loop_closing=True, pipeline_depth=2,
                   mapping_device=jax.devices()[1])
    for i, (img, d) in enumerate(frames):
        s.track_rgbd(img, d, i / cfg.fps)
    s.flush()
    traj = s.get_trajectory()
    assert len(traj) >= 0.9 * len(gt), f"tracked {len(traj)}/{len(gt)}"
    # the corrected branch genuinely fired (periodic GBA every 2 KFs)
    assert int(s.m.n_keyframes) >= 3
