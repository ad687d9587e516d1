"""Probe the axon tunnel + device-time characteristics that bound the
pipelined stream design:

  1. RTT of a tiny device_get (the retire cost floor);
  2. whether copy_to_host_async makes a later device_get ~free;
  3. device-only time of the fused tracking step (throughput ceiling);
  4. host dispatch-enqueue cost of the fused step (is dispatch async?);
  5. device_get of a list (does batching N small arrays amortize the RTT?).

Run with the DEFAULT env (axon) + compile cache:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u scripts/probe_tunnel.py > /root/probe_tunnel.log 2>&1 &
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

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # --- 1. tiny-op RTT ---
    x = jax.device_put(jnp.arange(42, dtype=jnp.float32), dev)
    f = jax.jit(lambda a: a + 1.0)
    y = f(x)
    _ = jax.device_get(y)       # warm compile
    ts = []
    for _ in range(10):
        t0 = time.time()
        _ = jax.device_get(f(x))
        ts.append(time.time() - t0)
    print(f"1. tiny dispatch+get RTT: median {np.median(ts)*1e3:.1f} ms "
          f"min {min(ts)*1e3:.1f} ms", flush=True)

    # --- 2. async copy then get ---
    ts = []
    for _ in range(10):
        y = f(x)
        try:
            y.copy_to_host_async()
            has_async = True
        except Exception as e:
            has_async = False
            print(f"   copy_to_host_async raised: {e}", flush=True)
            break
        time.sleep(0.2)          # give the copy time to land
        t0 = time.time()
        _ = jax.device_get(y)
        ts.append(time.time() - t0)
    if ts:
        print(f"2. get after async copy + 200ms: median {np.median(ts)*1e3:.2f} ms "
              f"(async copy supported={has_async})", flush=True)

    # --- 3+4. fused tracking step device time & dispatch cost ---
    from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD
    from orb_slam2_tpu.utils.synthetic import PlateWorld, loop_trajectory
    from orb_slam2_tpu.pipeline.system import SlamSystem

    fx, W, H, nf = 517.3, 640, 480, 1000
    cfg = SlamConfig(fx=fx, fy=fx, cx=W / 2, cy=H / 2, width=W, height=H,
                     bf=fx * 0.25, sensor=SENSOR_RGBD, fps=30.0,
                     th_depth=40.0, n_features=nf, use_pallas=True)
    world = PlateWorld(fx, fx, W / 2, H / 2, W, H, z0=5.0)
    gt = loop_trajectory(40, radius=0.8)
    frames = [(jax.device_put(jnp.asarray(i), dev),
               jax.device_put(jnp.asarray(d), dev))
              for i, d in (world.render_with_depth(T) for T in gt)]
    s = SlamSystem(cfg, enable_loop_closing=False)
    t0 = time.time()
    for i in range(12):
        s.track_rgbd(*frames[i], i / 30.0)
    print(f"3a. map bootstrap (12 frames): {time.time()-t0:.1f}s "
          f"kf={int(s.m.n_keyframes)}", flush=True)

    # dispatch the fused step N times back to back (chained on the map),
    # sync once: wall/N ~ device time per step once the queue is deep
    from orb_slam2_tpu.pipeline import tracking_step
    import jax.numpy as jnp2

    def run_n(n, j0=12):
        t0 = time.time()
        outs = []
        for i in range(n):
            Tcw = s.track_rgbd(*frames[j0 + (i % 20)], (j0 + i) / 30.0)
        return time.time() - t0

    # synchronous per-frame cost (dispatch + get each frame)
    w = run_n(3)   # warm
    t_sync = run_n(10) / 10
    print(f"4. synchronous track_rgbd: {t_sync*1e3:.1f} ms/frame", flush=True)

    # raw dispatch enqueue cost: call the jitted step without reading
    ch_last = s.last_frame
    vel = jnp2.asarray(np.eye(4, dtype=np.float32))
    t0 = time.time()
    n = 20
    res = None
    m = s.m
    for i in range(n):
        res = tracking_step.full_tracking_step_from_images(
            cfg, m, frames[12 + (i % 20)], ch_last, s.last_pts,
            s.last_pts_valid, jnp2.asarray(s.last_matched_pt),
            jnp2.asarray(np.asarray(s.last_Tcw, dtype=np.float32)), vel,
            jnp2.asarray(False), jnp2.asarray(int(s.ref_kf), dtype=jnp2.int32),
            30, "rgbd")
        m = res.m
        ch_last = res.frame
    t_disp = (time.time() - t0) / n
    t0 = time.time()
    _ = jax.device_get(res.scalars)
    t_drain = time.time() - t0
    print(f"5. dispatch enqueue: {t_disp*1e3:.1f} ms/frame; "
          f"final drain after {n} dispatches: {t_drain*1e3:.1f} ms "
          f"(device time/step ~ {(t_disp + t_drain/n)*1e3:.1f} ms if enqueue "
          f"is device-bound, else drain/n = {t_drain/n*1e3:.1f} ms)", flush=True)

    # --- 5. batched gets ---
    ys = [f(jax.device_put(jnp.arange(42, dtype=jnp.float32) + i, dev))
          for i in range(8)]
    _ = jax.device_get(ys)
    t0 = time.time()
    _ = jax.device_get(ys)
    print(f"6. device_get of 8 small arrays at once: {(time.time()-t0)*1e3:.1f} ms",
          flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
