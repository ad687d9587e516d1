"""AR demo: SLAM + dominant-plane detection + virtual cube overlay.

The headless analogue of the reference's ROS AR demo
(`Examples/ROS/ORB_SLAM2/src/AR/ViewerAR.cc`, launched by `ros_mono_ar`):
runs the pipeline on the synthetic world (or a TUM RGB-D sequence with
--dataset), fits a plane to the tracked map points once tracking is stable,
and writes frames with the virtual cube drawn on the plane.

Usage:
  python examples/ar_demo.py [--frames 25] [--out /tmp/ar] [--cpu]
  python examples/ar_demo.py --dataset <tum_seq_dir> --settings <TUM1.yaml>
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--out", default="/tmp/ar_demo")
    ap.add_argument("--cube", type=float, default=0.4)
    ap.add_argument("--dataset", default=None, help="TUM RGB-D sequence dir")
    ap.add_argument("--settings", default=None, help="settings YAML (with --dataset)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    from orb_slam2_tpu import ar
    from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD
    from orb_slam2_tpu.utils.synthetic import PlaneWorld, lateral_trajectory
    from orb_slam2_tpu.pipeline.system import SlamSystem

    os.makedirs(args.out, exist_ok=True)

    if args.dataset:
        from orb_slam2_tpu.utils.datasets import TumRGBD
        cfg = SlamConfig.from_yaml(args.settings, sensor=SENSOR_RGBD)
        frames = ((ts, img, d / cfg.depth_map_factor)
                  for ts, img, d in TumRGBD(args.dataset))
    else:
        fx = fy = 300.0
        cfg = SlamConfig(fx=fx, fy=fy, cx=160.0, cy=120.0, width=320,
                         height=240, n_features=500, bf=fx * 0.1,
                         sensor=SENSOR_RGBD, fps=10.0, th_depth=40.0,
                         max_keyframes=64, max_map_points=1 << 14,
                         ba_local_cams=16, ba_fixed_cams=16,
                         ba_max_points=1 << 11, ba_max_obs=8,
                         max_local_keyframes=32, max_local_points=1 << 12)
        world = PlaneWorld(fx, fy, 160.0, 120.0, 320, 240, z0=5.0)
        gt = lateral_trajectory(args.frames, step=0.03, yaw_rate=0.004)
        frames = ((i * 0.1, *world.render_with_depth(T))
                  for i, T in enumerate(gt))

    s = SlamSystem(cfg)
    plane = None
    n_drawn = 0
    for i, (ts, img, depth) in enumerate(frames):
        Tcw = s.track_rgbd(img, depth, ts)
        if Tcw is None:
            continue
        matched = s.get_tracked_map_points()
        if plane is None and i >= 5 and matched is not None:
            ids = matched[matched >= 0]
            pts = np.asarray(s.m.pt_pos)[ids]
            plane = ar.detect_plane(pts, Tcw, iterations=50)
            if plane is not None:
                print(f"frame {i}: plane detected, normal={plane.normal}, "
                      f"{int(plane.inliers.sum())}/{len(pts)} inliers")
        if plane is not None:
            over = ar.draw_cube(np.asarray(img), plane, Tcw, args.cube,
                                cfg.fx, cfg.fy, cfg.cx, cfg.cy)
            from PIL import Image
            Image.fromarray(np.clip(over, 0, 255).astype(np.uint8)).save(
                os.path.join(args.out, f"ar_{i:04d}.png"))
            n_drawn += 1
        if args.frames and i + 1 >= args.frames:
            break
    print(f"wrote {n_drawn} AR frames to {args.out}")


if __name__ == "__main__":
    main()
