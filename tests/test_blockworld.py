"""BlockWorld street-canyon regression (VERDICT r4 #3).

The forward-facing KITTI-regime world must stay tracked end-to-end at the
reference scale. Round-5 root cause of the r4 'CPU/TPU divergence': there
was none — the TPU evals ran 640x480/1000 features and tracked 100%, the
CPU smoke runs ran 320x240/600 and starved (half the image is sky in this
world; at quarter resolution the per-cell texture budget leaves too few
stable features, the map attrits through found/visible culling, and the
urgent-KF condition churns a keyframe every frame until tracking dies).
Same code, both backends: full scale passes on CPU too (measured 100%
tracked, ATE 5.5 cm over 44.9 m / 300 frames). This test pins the regime
at full scale on a shortened circuit segment (straight + entry into the
first corner — exactly where the small-scale runs collapsed).
"""
import numpy as np
import pytest

from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_STEREO
from orb_slam2_tpu.utils.synthetic import (BlockWorld, ImperfectCamera,
                                           city_block_trajectory, ate_rmse)
from orb_slam2_tpu.pipeline.system import SlamSystem


@pytest.mark.slow
def test_block_stereo_full_scale_segment():
    W, H, fx, nf = 640, 480, 517.3, 1000
    cfg = SlamConfig(fx=fx, fy=fx, cx=W / 2, cy=H / 2, width=W, height=H,
                     bf=fx * 0.5, sensor=SENSOR_STEREO, fps=30.0,
                     th_depth=40.0, n_features=nf, max_keyframes=128,
                     max_map_points=1 << 14)
    world = BlockWorld(fx, fx, W / 2, H / 2, W, H)
    gt = city_block_trajectory(300, corner_radius=6.0, speed=0.15,
                               overshoot=0.12)[:130]   # straight + corner
    cam = ImperfectCamera(world, noise_sigma=3.0, exposure_amp=0.15)
    s = SlamSystem(cfg, enable_loop_closing=False)
    for i, T in enumerate(gt):
        left, right, _ = cam.render_stereo(T, cfg.baseline, i)
        s.track_stereo(left, right, i / cfg.fps)
    s.flush()
    traj = s.get_trajectory()
    assert len(traj) >= 0.9 * len(gt), f"tracked {len(traj)}/{len(gt)}"
    est = [T for _, T in traj]
    gtp = [gt[int(round(ts * cfg.fps))] for ts, _ in traj]
    rmse = ate_rmse(est, gtp)
    path = sum(np.linalg.norm(gt[i + 1][:3, 3] - gt[i][:3, 3])
               for i in range(len(gt) - 1))
    assert rmse < 0.01 * path, f"ATE {rmse*100:.1f} cm over {path:.1f} m"
    # no urgent-keyframe churn: the healthy full-scale run inserts ~1 KF
    # per 10-15 frames, the starved small-scale runs inserted one per frame
    assert s._kf_seq_host <= 0.25 * len(gt), f"KF churn: {s._kf_seq_host}"
