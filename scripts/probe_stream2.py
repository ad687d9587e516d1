"""Clean device/stream timing probe (run after the round-3 stream rework).

Measures, on a real populated map with fresh (non-replayed) frames:
  a. per-dispatch enqueue wall time of the fused tracking step;
  b. single dispatch -> immediate packed get (sync latency);
  c. N chained dispatches + ONE final get (device throughput per step);
  d. keyframe_pass event cost (dispatch + one summary get).

Default env (axon):
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u scripts/probe_stream2.py > /root/probe_stream2.log 2>&1 &
"""
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD
    from orb_slam2_tpu.utils.synthetic import PlateWorld, loop_trajectory
    from orb_slam2_tpu.pipeline.system import SlamSystem
    from orb_slam2_tpu.pipeline import tracking_step

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    fx, W, H, nf = 517.3, 640, 480, 1000
    cfg = SlamConfig(fx=fx, fy=fx, cx=W / 2, cy=H / 2, width=W, height=H,
                     bf=fx * 0.25, sensor=SENSOR_RGBD, fps=30.0,
                     th_depth=40.0, n_features=nf, use_pallas=True)
    world = PlateWorld(fx, fx, W / 2, H / 2, W, H, z0=5.0)
    n_frames = 120
    gt = loop_trajectory(n_frames, radius=3.0 * n_frames / 150.0)
    t0 = time.time()
    frames = [(jax.device_put(jnp.asarray(i), dev),
               jax.device_put(jnp.asarray(d), dev))
              for i, d in (world.render_with_depth(T) for T in gt)]
    print(f"rendered+uploaded {n_frames} frames in {time.time()-t0:.0f}s",
          flush=True)

    s = SlamSystem(cfg, enable_loop_closing=False)
    t0 = time.time()
    for i in range(30):
        Tcw = s.track_rgbd(*frames[i], i / cfg.fps)
        assert Tcw is not None, f"lost at {i}"
    print(f"build 30 frames in {time.time()-t0:.0f}s "
          f"kf={int(s.m.n_keyframes)} pts={int(s.m.n_points)}", flush=True)

    # --- a+b: sync-mode per-frame, split into enqueue vs get ---
    enq, get = [], []
    for i in range(30, 45):
        ch_Tcw = jnp.asarray(np.asarray(s.last_Tcw, dtype=np.float32))
        vel = jnp.asarray(np.asarray(
            s.velocity if s.velocity is not None else np.eye(4),
            dtype=np.float32))
        t0 = time.time()
        res = tracking_step.full_tracking_step_from_images(
            cfg, s.m, frames[i], s.last_frame, s.last_pts, s.last_pts_valid,
            jnp.asarray(s.last_matched_pt), ch_Tcw, vel,
            jnp.asarray(s.velocity is not None),
            jnp.asarray(s.ref_kf, dtype=jnp.int32), 30, "rgbd")
        t1 = time.time()
        pk = jax.device_get(res.packed)
        t2 = time.time()
        enq.append(t1 - t0)
        get.append(t2 - t1)
        # advance host state like the system would
        s.m = res.m
        sc = pk[:10]
        Tcw = pk[10:26].reshape(4, 4)
        if s.last_Tcw is not None:
            s.velocity = Tcw @ np.linalg.inv(s.last_Tcw)
        s.last_Tcw = Tcw
        s.last_frame = res.frame
        s.last_pts = res.next_pts
        s.last_pts_valid = res.next_pts_valid
        s.last_matched_pt = res.matched_pt
    print(f"a. enqueue: median {np.median(enq)*1e3:.1f} ms "
          f"(min {min(enq)*1e3:.1f}); b. packed get after enqueue: "
          f"median {np.median(get)*1e3:.1f} ms", flush=True)

    # --- c: chained dispatches, one get at the end ---
    for n in (8, 16):
        t0 = time.time()
        reslist = []
        for i in range(45, 45 + n):
            vel = jnp.asarray(np.eye(4, dtype=np.float32))
            res = tracking_step.full_tracking_step_from_images(
                cfg, s.m, frames[i], s.last_frame, s.last_pts,
                s.last_pts_valid, jnp.asarray(s.last_matched_pt),
                jnp.asarray(np.asarray(s.last_Tcw, dtype=np.float32)), vel,
                jnp.asarray(False), jnp.asarray(s.ref_kf, dtype=jnp.int32),
                30, "rgbd")
            s.m = res.m
            s.last_frame = res.frame
            s.last_pts = res.next_pts
            s.last_pts_valid = res.next_pts_valid
            s.last_matched_pt = res.matched_pt
            reslist.append(res)
        t1 = time.time()
        pk = jax.device_get(reslist[-1].packed)
        t2 = time.time()
        s.last_Tcw = pk[10:26].reshape(4, 4)
        print(f"c. {n} chained dispatches: enqueue total {t1-t0:.2f}s "
              f"({(t1-t0)/n*1e3:.1f} ms/frame), final drain {t2-t1:.2f}s "
              f"-> throughput {(t2-t0)/n*1e3:.1f} ms/frame", flush=True)

    # --- d: keyframe event ---
    from orb_slam2_tpu.pipeline import mapping_ops
    ts = []
    for r in range(3):
        t0 = time.time()
        m2, culled, summary = mapping_ops.keyframe_pass(
            cfg, s.m, s.last_frame, jnp.asarray(s.last_Tcw),
            jnp.asarray(s.last_matched_pt), 100 + r, 3.0 + r)
        sh = jax.device_get(summary)
        ts.append(time.time() - t0)
        s.m = m2
    print(f"d. keyframe_pass dispatch+summary get: {[f'{t*1e3:.0f}' for t in ts]} ms "
          f"(first includes compile)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
