"""Per-stage DEVICE time breakdown of the tracking step and mapping pass.

Times each jitted piece as: warm once, then k chained dispatches + one final
get (throughput per call, enqueue excluded since it's ~2ms).

Default env (axon):
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u scripts/probe_parts.py > /root/probe_parts.log 2>&1 &
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
    from orb_slam2_tpu.pipeline import frame as frame_mod
    from orb_slam2_tpu.pipeline import tracking_ops, tracking_step, mapping_ops
    from orb_slam2_tpu.solvers import pose_opt
    import functools

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    fx, W, H, nf = 517.3, 640, 480, 1000
    cfg = SlamConfig(fx=fx, fy=fx, cx=W / 2, cy=H / 2, width=W, height=H,
                     bf=fx * 0.25, sensor=SENSOR_RGBD, fps=30.0,
                     th_depth=40.0, n_features=nf, use_pallas=True)
    world = PlateWorld(fx, fx, W / 2, H / 2, W, H, z0=5.0)
    gt = loop_trajectory(60, radius=1.4)
    frames = [(jax.device_put(jnp.asarray(i), dev),
               jax.device_put(jnp.asarray(d), dev))
              for i, d in (world.render_with_depth(T) for T in gt)]
    s = SlamSystem(cfg, enable_loop_closing=False)
    t0 = time.time()
    for i in range(30):
        assert s.track_rgbd(*frames[i], i / cfg.fps) is not None
    print(f"built kf={int(s.m.n_keyframes)} pts={int(s.m.n_points)} "
          f"in {time.time()-t0:.0f}s", flush=True)

    m = s.m
    f30 = frame_mod.make_frame_rgbd(frames[30][0], frames[30][1], cfg)
    cam = cfg.camera()

    def timeit(name, fn, out_of, k=8):
        """fn: () -> device array (or pytree); chained via closure state."""
        r = fn()
        jax.tree.leaves(r)[0].block_until_ready if False else None
        _ = jax.device_get(out_of(fn()))  # warm + sync
        t0 = time.time()
        for _ in range(k):
            r = fn()
        _ = jax.device_get(out_of(r))
        dt = (time.time() - t0) / k
        print(f"{name:<42s} {dt*1e3:8.2f} ms/call", flush=True)
        return dt

    # --- tracking step pieces ---
    timeit("make_frame_rgbd (extraction)",
           lambda: frame_mod.make_frame_rgbd(frames[31][0], frames[31][1], cfg),
           lambda r: r.xy[0])

    Tl = jnp.asarray(np.asarray(s.last_Tcw, np.float32))
    vel = jnp.asarray(np.eye(4, dtype=np.float32))
    mpt = jnp.asarray(s.last_matched_pt)

    # the step donates m -> hand it a fresh copy per call
    timeit("full tracking step (fused, from images)",
           lambda: tracking_step.full_tracking_step_from_images(
               cfg, jax.tree.map(jnp.copy, m), frames[31], s.last_frame,
               s.last_pts, s.last_pts_valid, mpt, Tl, vel, jnp.asarray(False),
               jnp.asarray(s.ref_kf, jnp.int32), 30, "rgbd"),
           lambda r: r.packed)

    # select_local_map + track_local_map + counters + stats as one jit
    @functools.partial(jax.jit, static_argnames=("cfg",))
    def local_part(cfg, m, Tcw, cur, matched):
        lkf, lmask, ref_kf, lpt, pmask = tracking_ops.select_local_map(
            m, matched, max_kf=cfg.max_local_keyframes,
            max_pts=cfg.max_local_points)
        Tcw2, matched2, n, vis, fnd = tracking_ops.track_local_map(
            cfg, m, Tcw, cur, matched, lpt, pmask)
        m2 = tracking_ops.update_counters(m, vis, matched2, cfg)
        st = tracking_ops.keyframe_stats(cfg, m2, ref_kf, cur, matched2)
        return Tcw2, st[0]

    timeit("local-map half (select+track+counters)",
           lambda: local_part(cfg, m, Tl, f30, mpt),
           lambda r: r[1])

    obs = jnp.concatenate([f30.xy, f30.ur[:, None]], -1)
    timeit("pose_opt alone (4x10 LM)",
           lambda: pose_opt.optimize_pose(cam, Tl, s.last_pts, obs, f30.level,
                                          s.last_pts_valid, cfg.level_sigma2),
           lambda r: r.Tcw)

    # --- mapping pieces (each returns a fresh map; don't chain m) ---
    kfq = jnp.asarray(int(s.ref_kf), jnp.int32)
    timeit("cull_map_points",
           lambda: mapping_ops.cull_map_points(cfg, m),
           lambda r: r.pt_valid, k=4)
    timeit("triangulate_with_neighbor (ONE neighbor)",
           lambda: mapping_ops.triangulate_with_neighbor(
               cfg, m, kfq, jnp.asarray(max(0, int(s.ref_kf) - 1), jnp.int32)),
           lambda r: r[1], k=4)
    timeit("local_ba",
           lambda: mapping_ops.local_ba(
               cfg, m, kfq, n_local=cfg.ba_local_cams,
               n_fixed=cfg.ba_fixed_cams, max_pts=cfg.ba_max_points,
               max_obs=cfg.ba_max_obs),
           lambda r: r.kf_pose, k=4)
    timeit("cull_keyframes",
           lambda: mapping_ops.cull_keyframes(cfg, m, kfq),
           lambda r: r[1], k=4)

    from orb_slam2_tpu.mapstate import map as mapstate
    timeit("point_observations(16)",
           lambda: mapstate.point_observations(m, 16)[0],
           lambda r: r, k=4)

    # full pass for reference (mapping_pass donates -> hand it a fresh copy)
    def full_pass():
        mc = jax.tree.map(jnp.copy, m)
        mm, culled = mapping_ops.mapping_pass(cfg, mc, kfq)
        return culled
    timeit("mapping_pass (full, on a copy)", full_pass, lambda r: r, k=3)
    print("done", flush=True)


if __name__ == "__main__":
    main()
