"""Honest per-stage timing of tracking_step + mapping_pass internals on axon.

Builds a small populated map (forced KF cadence), then times each jitted
stage with device_get syncs (block_until_ready is a no-op on axon).
"""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD
    from orb_slam2_tpu.utils.synthetic import PlateWorld, loop_trajectory
    from orb_slam2_tpu.pipeline.system import SlamSystem
    from orb_slam2_tpu.pipeline import frame as frame_mod
    from orb_slam2_tpu.pipeline import tracking_step, tracking_ops, mapping_ops
    from orb_slam2_tpu.mapstate import map as mapstate
    from orb_slam2_tpu.solvers import pose_opt

    dev = jax.devices()[0]
    fx = 517.3
    cfg = SlamConfig(fx=fx, fy=fx, cx=320.0, cy=240.0, width=640, height=480,
                     bf=fx * 0.25, sensor=SENSOR_RGBD, fps=30.0,
                     th_depth=40.0, n_features=1000, use_pallas=True)
    print("caps:", cfg.max_keyframes, cfg.max_map_points, cfg.max_keypoints,
          flush=True)
    world = PlateWorld(fx, fx, 320.0, 240.0, 640, 480, z0=5.0)
    n_build = 45
    # 150-frame circle density (~0.16 m/frame): aggressive enough to need
    # real tracking, gentle enough that the no-velocity first frames hold on
    gt = loop_trajectory(150, radius=3.0)[:n_build + 11]
    frames = [(jax.device_put(jnp.asarray(i), dev), jax.device_put(jnp.asarray(d), dev))
              for i, d in (world.render_with_depth(T) for T in gt)]

    sys_ = SlamSystem(cfg, enable_loop_closing=False)
    orig_need = sys_._need_kf_from_scalars
    sys_._force = False
    sys_._need_kf_from_scalars = lambda sc: sys_._force or orig_need(sc)
    t0 = time.time()
    for i in range(n_build + 1):
        sys_._force = (i % 3 == 0) and i < n_build
        Tcw = sys_.track_rgbd(*frames[i], i / cfg.fps)
        assert Tcw is not None, f"lost at {i}"
    print(f"built kf={int(sys_.m.n_keyframes)} pts={int(sys_.m.n_points)} "
          f"in {time.time()-t0:.0f}s", flush=True)

    m = sys_.m
    _ = np.asarray(m.pt_pos[0])      # drain
    f = frame_mod.make_frame_rgbd(*frames[n_build + 1], cfg)
    Tcw = jnp.asarray(sys_.last_Tcw)
    matched = sys_.last_matched_pt

    def timeit(label, fn, reps=3):
        out = fn()
        _ = jax.device_get(out)
        best = 1e9
        for _i in range(reps):
            t0 = time.time()
            out = fn()
            _ = jax.device_get(out)
            best = min(best, time.time() - t0)
        print(f"{label:26s} {best*1000:9.2f} ms", flush=True)

    # ---- tracking stages ----
    @jax.jit
    def f_sel(m, matched):
        lk, lm, rk, lp, pm = tracking_ops.select_local_map(
            m, matched, max_kf=cfg.max_local_keyframes,
            max_pts=cfg.max_local_points)
        return jnp.sum(lp) + rk
    timeit("select_local_map", lambda: f_sel(m, matched))

    local = tracking_ops.select_local_map(
        m, matched, max_kf=cfg.max_local_keyframes, max_pts=cfg.max_local_points)
    lk, lm, rk, lp, pm = local

    @jax.jit
    def f_tlm(m, Tcw, f, matched, lp, pm):
        out = tracking_ops.track_local_map(cfg, m, Tcw, f, matched, lp, pm)
        return out[2]
    timeit("track_local_map", lambda: f_tlm(m, Tcw, f, matched, lp, pm))

    @jax.jit
    def f_po(m, Tcw, f, matched):
        has = matched >= 0
        Xw = m.pt_pos[jnp.clip(matched, 0, m.capacity_pt - 1)]
        obs = jnp.concatenate([f.xy, f.ur[:, None]], axis=-1)
        res = pose_opt.optimize_pose(cfg.camera(), Tcw, Xw, obs, f.level, has,
                                     cfg.level_sigma2)
        return res.n_inliers
    timeit("optimize_pose", lambda: f_po(m, Tcw, f, matched))

    @jax.jit
    def f_ks(m, f, matched):
        a, b, c = tracking_ops.keyframe_stats(cfg, m, 3, f, matched)
        return a + b + c
    timeit("keyframe_stats", lambda: f_ks(m, f, matched))

    @jax.jit
    def f_uc(m, matched):
        m2 = tracking_ops.update_counters(m, matched, matched, cfg)
        return jnp.sum(m2.pt_visible)
    timeit("update_counters", lambda: f_uc(m, matched))

    # full fused step (no donation wrapper: copy m each call)
    def f_full():
        mm = jax.tree.map(jnp.copy, m)
        res = tracking_step.full_tracking_step(
            cfg, mm, f, sys_.last_frame, sys_.last_pts, sys_.last_pts_valid,
            sys_.last_matched_pt, Tcw, jnp.eye(4), jnp.asarray(True),
            jnp.asarray(sys_.ref_kf))
        return res.scalars
    timeit("full_tracking_step", f_full)

    # ---- mapping stages ----
    @jax.jit
    def f_po2(m):
        obs_kf, obs_ft, obs_on = mapstate.point_observations(m, max_obs=12)
        return jnp.sum(obs_kf)
    timeit("point_observations", lambda: f_po2(m))

    @jax.jit
    def f_cmp(m):
        m2 = mapping_ops.cull_map_points(cfg, m)
        return jnp.sum(m2.pt_valid)
    timeit("cull_map_points", lambda: f_cmp(m))

    kf_id = jnp.asarray(sys_.ref_kf)

    @jax.jit
    def f_tri(m):
        m2, n = mapping_ops.triangulate_with_neighbor(
            cfg, m, kf_id, jnp.asarray(max(0, sys_.ref_kf - 1)))
        return n
    timeit("triangulate x1", lambda: f_tri(m))

    @jax.jit
    def f_fuse(m):
        cur_pts = m.kf_obs[kf_id]
        m2 = mapping_ops.fuse_into_keyframe(
            cfg, m, jnp.asarray(max(0, sys_.ref_kf - 1)), cur_pts, cur_pts >= 0)
        return jnp.sum(m2.pt_valid)
    timeit("fuse x1", lambda: f_fuse(m))

    @jax.jit
    def f_upd(m):
        bound = m.kf_obs[kf_id]
        pmask = jnp.zeros((m.capacity_pt,), bool).at[
            jnp.where(bound >= 0, bound, m.capacity_pt)].set(True, mode="drop")
        m2 = mapstate.update_point_descriptors(m, pmask)
        m2 = mapstate.update_point_normals(m2, pmask, cfg.scale_factors)
        return jnp.sum(m2.pt_desc)
    timeit("upd desc+normals", lambda: f_upd(m))

    @jax.jit
    def f_lba(m):
        m2 = mapping_ops.local_ba(cfg, m, kf_id,
                                  n_local=cfg.ba_local_cams,
                                  n_fixed=cfg.ba_fixed_cams,
                                  max_pts=cfg.ba_max_points,
                                  max_obs=cfg.ba_max_obs)
        return jnp.sum(m2.kf_pose)
    timeit("local_ba", lambda: f_lba(m))

    @jax.jit
    def f_ckf(m):
        m2, culled = mapping_ops.cull_keyframes(cfg, m, kf_id)
        return jnp.sum(culled)
    timeit("cull_keyframes", lambda: f_ckf(m))

    def f_mp():
        mm = jax.tree.map(jnp.copy, m)
        m2, culled = mapping_ops.mapping_pass(cfg, mm, kf_id)
        return culled
    timeit("mapping_pass (fused)", f_mp)

    scan10(sys_, cfg, m, f)




def scan10(sys_, cfg, m, f):
    """True per-step device compute: 10 chained tracking steps, ONE dispatch."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import time
    from orb_slam2_tpu.pipeline import tracking_step

    Tcw = jnp.asarray(sys_.last_Tcw)

    @jax.jit
    def run(m, f, last, last_pts, last_valid, last_matched, Tcw, ref_kf):
        def body(carry, _):
            m, last, last_pts, last_valid, last_matched, Tcw = carry
            res = tracking_step._step(
                cfg, m, f, last, last_pts, last_valid, last_matched,
                Tcw, jnp.eye(4), jnp.asarray(True), ref_kf, 30)
            return (res.m, f, res.next_pts, res.next_pts_valid,
                    res.matched_pt, res.Tcw), res.scalars[3]
        carry, inl = jax.lax.scan(
            body, (m, f, last_pts * 0 + last_pts, last_valid, last_matched, Tcw),
            None, length=10)
        return inl

    last_pts = sys_.last_pts
    last_valid = sys_.last_pts_valid
    last_matched = sys_.last_matched_pt
    out = run(m, f, sys_.last_frame, last_pts, last_valid, last_matched,
              Tcw, jnp.asarray(sys_.ref_kf))
    _ = np.asarray(out)
    best = 1e9
    for _i in range(3):
        t0 = time.time()
        out = run(m, f, sys_.last_frame, last_pts, last_valid, last_matched,
                  Tcw, jnp.asarray(sys_.ref_kf))
        _ = np.asarray(out)
        best = min(best, (time.time() - t0) / 10)
    print(f"{'track_step x10 scan':26s} {best*1000:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
