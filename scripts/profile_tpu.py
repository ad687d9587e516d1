"""Profile the real per-frame SLAM hot path on the TPU.

Builds a genuinely populated map (PlateWorld RGBD survey with a forced
keyframe cadence -> ~30 KFs / several-k points at the DEFAULT capacities
K=512, P=65536), then times each stage of the per-frame path steady-state:

  make_frame        frame construction (extraction pyramid/FAST/BRIEF/stereo)
  tracking_step     the fused full_tracking_step + the host scalar read
  frame+track       both, i.e. the per-frame system latency (no KF)
  mapping_pass      the fused per-KF mapping dispatch

Run with the DEFAULT env (axon TPU):
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u scripts/profile_tpu.py > /root/profile_tpu.log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print("devices:", jax.devices(), flush=True)

    from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD
    from orb_slam2_tpu.utils.synthetic import PlateWorld, loop_trajectory
    from orb_slam2_tpu.pipeline.system import SlamSystem
    from orb_slam2_tpu.pipeline import frame as frame_mod
    from orb_slam2_tpu.pipeline import tracking_step, mapping_ops

    smoke = os.environ.get("PROFILE_SMOKE") == "1"   # tiny CPU sanity run
    fx = fy = 517.3
    W, H = (320, 240) if smoke else (640, 480)
    cx, cy = W / 2, H / 2
    baseline = 0.25
    fx = fy = fx / 2 if smoke else fx
    kw = dict(max_keyframes=64, max_map_points=1 << 14,
              n_features=500) if smoke else dict(n_features=1000)
    cfg = SlamConfig(fx=fx, fy=fy, cx=cx, cy=cy, width=W, height=H,
                     bf=fx * baseline, sensor=SENSOR_RGBD,
                     fps=30.0, th_depth=40.0, use_pallas=not smoke, **kw)
    print("capacities:", cfg.max_keyframes, cfg.max_map_points,
          cfg.max_keypoints, flush=True)

    world = PlateWorld(fx, fy, cx, cy, W, H, z0=5.0)
    n_build = 9 if smoke else 90
    gt = loop_trajectory(n_build + 30, radius=3.0)

    dev = jax.devices()[0]
    print("rendering + uploading frames...", flush=True)
    frames = []
    for T in gt:
        img, depth = world.render_with_depth(T)
        frames.append((jax.device_put(jnp.asarray(img), dev),
                       jax.device_put(jnp.asarray(depth), dev)))

    # ---- build a populated map: forced KF every 3rd frame ----
    sys_ = SlamSystem(cfg, enable_loop_closing=False)
    orig_need = sys_._need_kf_from_scalars
    sys_._force_kf = False
    sys_._need_kf_from_scalars = lambda sc: sys_._force_kf or orig_need(sc)

    t0 = time.time()
    for i in range(n_build + 1):
        sys_._force_kf = (i % 3 == 0) and i < n_build
        ti = time.time()
        Tcw = sys_.track_rgbd(*frames[i], i / cfg.fps)
        if i % 10 == 0 or Tcw is None:
            print(f"build frame {i}: {time.time()-ti:.2f}s tracked={Tcw is not None} "
                  f"kf={int(sys_.m.n_keyframes)} pts={int(sys_.m.n_points)}",
                  flush=True)
        if Tcw is None:
            print("TRACKING LOST during build — aborting")
            return
    print(f"map built in {time.time()-t0:.1f}s: kf={int(sys_.m.n_keyframes)} "
          f"pts={int(sys_.m.n_points)}", flush=True)

    # ---- steady-state stage timings over the remaining frames ----
    m = sys_.m
    eval_frames = frames[n_build + 1:]

    def timeit(label, fn, reps=3):
        best = []
        for _ in range(reps):
            t0 = time.time()
            n = fn()
            best.append((time.time() - t0) / max(n, 1))
        print(f"{label:16s} {min(best)*1000:8.2f} ms", flush=True)
        return min(best)

    # 1. make_frame
    def run_frames():
        for img, depth in eval_frames:
            f = frame_mod.make_frame_rgbd(img, depth, cfg)
            jax.block_until_ready(f.desc)
        return len(eval_frames)
    run_frames()  # compile
    t_frame = timeit("make_frame", run_frames)

    # 2. fused tracking step (fresh state per frame, like the system's loop)
    fs = [frame_mod.make_frame_rgbd(img, d, cfg) for img, d in eval_frames]
    jax.block_until_ready(fs[-1].desc)

    def run_track():
        last = sys_.last_frame
        last_Tcw = jnp.asarray(sys_.last_Tcw)
        last_pts = sys_.last_pts
        last_valid = sys_.last_pts_valid
        last_matched = sys_.last_matched_pt
        vel = jnp.eye(4)
        mm = jax.tree.map(jnp.copy, m)  # the step donates its map input
        n = 0
        for f in fs:
            res = tracking_step.full_tracking_step(
                cfg, mm, f, last, last_pts, last_valid, last_matched,
                last_Tcw, vel, jnp.asarray(True), jnp.asarray(sys_.ref_kf))
            sc, Tcw, T_rel = jax.device_get((res.scalars, res.Tcw, res.T_rel))
            mm = res.m
            last, last_Tcw = f, jnp.asarray(Tcw)
            last_pts, last_valid = res.next_pts, res.next_pts_valid
            last_matched = res.matched_pt
            n += 1
        jax.block_until_ready(mm.pt_visible)
        return n
    run_track()
    t_track = timeit("tracking_step", run_track)

    # 3. frame + track combined (= the system's per-frame latency, no KF)
    def run_combined():
        last = sys_.last_frame
        last_Tcw = jnp.asarray(sys_.last_Tcw)
        last_pts, last_valid = sys_.last_pts, sys_.last_pts_valid
        last_matched = sys_.last_matched_pt
        vel = jnp.eye(4)
        mm = jax.tree.map(jnp.copy, m)  # the step donates its map input
        n = 0
        for img, depth in eval_frames:
            f = frame_mod.make_frame_rgbd(img, depth, cfg)
            res = tracking_step.full_tracking_step(
                cfg, mm, f, last, last_pts, last_valid, last_matched,
                last_Tcw, vel, jnp.asarray(True), jnp.asarray(sys_.ref_kf))
            sc, Tcw, T_rel = jax.device_get((res.scalars, res.Tcw, res.T_rel))
            mm = res.m
            last, last_Tcw = f, jnp.asarray(Tcw)
            last_pts, last_valid = res.next_pts, res.next_pts_valid
            last_matched = res.matched_pt
            n += 1
        return n
    run_combined()
    t_comb = timeit("frame+track", run_combined)

    # 4. mapping pass (per KF) — re-run on copies of the built map
    def run_mapping():
        mm = jax.tree.map(jnp.copy, m)  # mapping_pass donates its input
        mm, culled = mapping_ops.mapping_pass(cfg, mm, jnp.asarray(sys_.ref_kf))
        jax.block_until_ready(culled)
        return 1
    run_mapping()
    t_map = timeit("mapping_pass", run_mapping, reps=5)

    print(f"\nfps (frame+track): {1.0/t_comb:.1f}")
    print(f"fps with 1-in-3 KF cadence: {1.0/(t_comb + t_map/3):.1f}")


if __name__ == "__main__":
    main()
