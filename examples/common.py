"""Shared driver scaffolding: the run loop with per-frame timing statistics
(median/mean report like `Examples/Monocular/mono_tum.cc:113-122`) and
trajectory export."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_sequence(sys_, frames, track_fn, save_prefix=None, realtime_fps=None):
    """frames: iterable of per-frame tuples; track_fn(sys_, frame) -> Tcw."""
    times = []
    n_lost = 0
    for i, frame in enumerate(frames):
        t0 = time.time()
        Tcw = track_fn(sys_, frame)
        dt = time.time() - t0
        times.append(dt)
        if Tcw is None and i > 2:
            n_lost += 1
        if i % 50 == 0:
            m = sys_.metrics[-1] if sys_.metrics else {}
            print(f"frame {i:5d}  {dt*1000:7.1f} ms  inliers={m.get('inliers','-')} "
                  f"kf={m.get('n_kf','-')} pts={m.get('n_pts','-')}")
        if realtime_fps:
            budget = 1.0 / realtime_fps
            if dt < budget:
                pass  # no sleep: we report achievable throughput instead

    times_sorted = sorted(times[3:]) or times
    print("-" * 60)
    print(f"frames: {len(times)}   lost: {n_lost}")
    print(f"median tracking time: {np.median(times_sorted)*1000:.2f} ms")
    print(f"mean tracking time:   {np.mean(times_sorted)*1000:.2f} ms")

    from orb_slam2_tpu.utils import trajectory as traj_io
    if save_prefix:
        traj = sys_.get_trajectory()
        traj_io.save_tum(save_prefix + "_FrameTrajectory_TUM.txt", traj)
        traj_io.save_kitti(save_prefix + "_CameraTrajectory_KITTI.txt", traj)
        kf = sys_.keyframe_trajectory()
        traj_io.save_tum(save_prefix + "_KeyFrameTrajectory_TUM.txt", kf)
        print(f"trajectories saved with prefix {save_prefix}")
    return times
