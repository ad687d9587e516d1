"""Cumulative in-pass mapping-stage timings (mirrors mapping_pass's body so
each increment shows one stage's device cost inside the fused pass).

  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_mapping_stages.py
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax, jax.numpy as jnp
    import functools
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD, SENSOR_MONOCULAR
    from orb_slam2_tpu.utils.synthetic import PlateWorld, loop_trajectory
    from orb_slam2_tpu.pipeline.system import SlamSystem
    from orb_slam2_tpu.pipeline import mapping_ops
    from orb_slam2_tpu.mapstate import map as mapstate

    dev = jax.devices()[0]
    fx, W, H, nf = 517.3, 640, 480, 1000
    cfg = SlamConfig(fx=fx, fy=fx, cx=W / 2, cy=H / 2, width=W, height=H,
                     bf=fx * 0.25, sensor=SENSOR_RGBD, fps=30.0,
                     th_depth=40.0, n_features=nf,
                     max_keyframes=128, max_map_points=1 << 14)
    world = PlateWorld(fx, fx, W / 2, H / 2, W, H, z0=5.0)
    gt = loop_trajectory(60, radius=1.4)
    frames = [(jax.device_put(jnp.asarray(i), dev),
               jax.device_put(jnp.asarray(d), dev))
              for i, d in (world.render_with_depth(T) for T in gt)]
    s = SlamSystem(cfg, enable_loop_closing=False)
    for i in range(40):
        assert s.track_rgbd(*frames[i], i / cfg.fps) is not None
    print(f"map: kf={int(s.m.n_keyframes)} pts={int(s.m.n_points)}", flush=True)
    m0 = s.m
    kf_id = jnp.asarray(int(s.ref_kf), jnp.int32)
    SENSOR = cfg.sensor

    def upto_fn(stage):
        from orb_slam2_tpu.utils.config import SENSOR_MONOCULAR

        @functools.partial(jax.jit, static_argnames=())
        def run(m):
            INVALID = -1
            m = mapping_ops.cull_map_points(cfg, m, cur_kf=kf_id)
            if stage == 0:
                return m.pt_valid.sum()
            nn = 20 if SENSOR == SENSOR_MONOCULAR else 10
            ids, _ = mapstate.covisible_keyframes(m, kf_id, nn)
            m, _ = mapping_ops.triangulate_batch(cfg, m, kf_id, ids)
            if stage == 1:
                return m.pt_valid.sum()
            tgt_ids, tgt_ok = mapping_ops._fusion_targets(m, kf_id, nn, cap=3 * nn)
            cur_pts = m.kf_obs[kf_id]
            P = m.capacity_pt
            cnt = m.pt_obs_cnt

            def fuse_body(carry, nb):
                kf_obs, mapping = carry
                def run2(args):
                    kf_obs, mapping = args
                    nbs = jnp.maximum(nb, 0)
                    mloc = m._replace(kf_obs=kf_obs)
                    idx, bind, src, tgt, both, src_wins = mapping_ops._fuse_decide(
                        cfg, mloc, cnt, nbs, cur_pts, cur_pts >= 0)
                    mapping = mapping_ops._fuse_mapping_update(
                        mapping, src, tgt, both, src_wins, P)
                    row = kf_obs[nbs]
                    row = row.at[jnp.where(bind, idx, m.n_feat)].set(src, mode="drop")
                    return kf_obs.at[nbs].set(row), mapping
                carry = jax.lax.cond(nb >= 0, run2, lambda a: a, (kf_obs, mapping))
                return carry, ()

            mapping0 = jnp.arange(P, dtype=jnp.int32)
            (kf_obs, mapping), _ = jax.lax.scan(fuse_body, (m.kf_obs, mapping0),
                                                tgt_ids)
            m = m._replace(kf_obs=kf_obs)
            if stage == 2:
                return mapping.sum()
            rows = m.kf_obs[jnp.clip(tgt_ids, 0, m.capacity_kf - 1)]
            rows = jnp.where((tgt_ids >= 0)[:, None], rows, INVALID).reshape(-1)
            present = jnp.zeros((P,), bool).at[
                jnp.where(rows >= 0, rows, P)].set(True, mode="drop")
            fuse_pts, fuse_ok = mapstate.compact_mask(present, cfg.max_local_points)
            idx, bind, src, tgt, both, src_wins = mapping_ops._fuse_decide(
                cfg, m, cnt, kf_id, fuse_pts, fuse_ok)
            mapping = mapping_ops._fuse_mapping_update(mapping, src, tgt, both,
                                                       src_wins, P)
            m = mapstate.bind_observations(m, kf_id, idx, src, bind)
            mapping = mapping[mapping]
            mapping = mapping[mapping]
            m = mapstate.replace_points_fast(m, mapping)
            touched = jnp.concatenate([jnp.clip(tgt_ids, 0, m.capacity_kf - 1),
                                       jnp.asarray(kf_id, jnp.int32)[None]])
            rows = m.kf_obs[touched]
            rows = jnp.where(rows >= 0, mapping[jnp.clip(rows, 0, P - 1)], INVALID)
            rows = jnp.where(m.pt_valid[jnp.clip(rows, 0, P - 1)] & (rows >= 0),
                             rows, INVALID)
            m = m._replace(kf_obs=m.kf_obs.at[touched].set(rows))
            if stage == 3:
                return m.pt_valid.sum()
            bound = m.kf_obs[kf_id]
            pmask = jnp.zeros((P,), bool).at[
                jnp.where(bound >= 0, bound, P)].set(True, mode="drop")
            obs = mapstate.point_observations(m, 16)
            m = mapstate.refresh_obs_table(m, obs=obs)
            if stage == 4:
                return m.pt_obs_cnt.sum()
            m = mapstate.update_point_descriptors(m, pmask, obs=obs)
            m = mapstate.update_point_normals(m, pmask, cfg.scale_factors, obs=obs)
            m = mapstate.update_connections(m, kf_id, use_table=True)
            if stage == 5:
                return m.covis.sum()
            m = mapping_ops.local_ba(cfg, m, kf_id,
                                     n_local=cfg.ba_local_cams,
                                     n_fixed=cfg.ba_fixed_cams,
                                     max_pts=cfg.ba_max_points,
                                     max_obs=cfg.ba_max_obs, obs=obs)
            if stage == 6:
                return m.kf_pose.sum()
            m, culled = mapping_ops.cull_keyframes(cfg, m, kf_id, obs=obs)
            m = jax.lax.cond(jnp.any(culled), mapstate.refresh_obs_table,
                             lambda m: m, m)
            return m.kf_pose.sum() + culled.sum()
        return run

    labels = ["cull_pts", "+triangulate", "+fuse_scan", "+fuse_union_replace",
              "+table_rebuild", "+desc_norm_conn", "+local_ba", "+cull_kf"]
    prev = 0.0
    for stage, label in enumerate(labels):
        run = upto_fn(stage)
        mc = jax.tree.map(jnp.copy, m0)
        r = run(mc); _ = jax.device_get(r)
        best = 1e9
        for _i in range(3):
            t0 = time.time()
            r = run(m0)
            _ = jax.device_get(r)
            best = min(best, time.time() - t0)
        print(f"{label:22s} {best*1e3:8.2f} ms (+{(best-prev)*1e3:6.2f})",
              flush=True)
        prev = best
    print("done", flush=True)


if __name__ == "__main__":
    main()
