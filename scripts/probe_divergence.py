"""Dump per-frame diagnostics + a pre-frame-3 checkpoint to compare CPU/TPU."""
import os, sys
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
    from orb_slam2_tpu.utils import checkpoint

    tag = sys.argv[1] if len(sys.argv) > 1 else "x"
    fx = 517.3
    world = PlateWorld(fx, fx, 320.0, 240.0, 640, 480, z0=5.0)
    gt = loop_trajectory(55, radius=3.0)
    frames = [world.render_with_depth(T) for T in gt[:5]]

    cfg = SlamConfig(fx=fx, fy=fx, cx=320.0, cy=240.0, width=640, height=480,
                     bf=fx * 0.25, sensor=SENSOR_RGBD, fps=30.0,
                     th_depth=40.0, n_features=1000, use_pallas=False)
    s = SlamSystem(cfg, enable_loop_closing=False)
    orig = s._need_kf_from_scalars
    s._f = False
    s._need_kf_from_scalars = lambda sc: s._f or orig(sc)
    for i in range(4):
        if i == 3:
            checkpoint.save_map(f"/root/div_{tag}_m3.npz", s.m, extra=dict(
                last_Tcw=np.asarray(s.last_Tcw),
                last_pts=np.asarray(s.last_pts),
                last_pts_valid=np.asarray(s.last_pts_valid),
                last_matched=np.asarray(s.last_matched_pt),
                velocity=np.asarray(s.velocity),
                ref_kf=s.ref_kf))
        s._f = (i % 3 == 0)
        Tcw = s.track_rgbd(*frames[i], i / 30.0)
        m = s.m
        pv = np.asarray(m.pt_valid)
        pp = np.asarray(m.pt_pos)[pv]
        print(f"frame {i}: tracked={Tcw is not None} kf={int(m.n_keyframes)} "
              f"pts={int(pv.sum())} inl={s.n_inliers} "
              f"|pt|mean={np.linalg.norm(pp, axis=1).mean():.4f} "
              f"Tcw_t={np.round(np.asarray(s.last_Tcw)[:3,3], 4).tolist()}",
              flush=True)


if __name__ == "__main__":
    main()
