"""A/B the pallas matcher vs XLA path on the TPU: first 5 build frames."""
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

    fx = 517.3
    world = PlateWorld(fx, fx, 320.0, 240.0, 640, 480, z0=5.0)
    gt = loop_trajectory(55, radius=3.0)
    frames = [world.render_with_depth(T) for T in gt[:6]]

    for use_pallas in (True, False):
        cfg = SlamConfig(fx=fx, fy=fx, cx=320.0, cy=240.0, width=640,
                         height=480, bf=fx * 0.25, sensor=SENSOR_RGBD,
                         fps=30.0, th_depth=40.0, n_features=1000,
                         use_pallas=use_pallas)
        s = SlamSystem(cfg, enable_loop_closing=False)
        orig = s._need_kf_from_scalars
        s._f = False
        s._need_kf_from_scalars = lambda sc: s._f or orig(sc)
        print(f"--- use_pallas={use_pallas}", flush=True)
        for i in range(6):
            s._f = (i % 3 == 0)
            Tcw = s.track_rgbd(*frames[i], i / 30.0)
            print(f"  frame {i}: tracked={Tcw is not None} "
                  f"kf={int(s.m.n_keyframes)} pts={int(s.m.n_points)} "
                  f"inl={s.n_inliers}", flush=True)


if __name__ == "__main__":
    main()
