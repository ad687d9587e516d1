"""Probe: is block_until_ready honest on axon? Known-cost matmul chain."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    @jax.jit
    def chain(x):
        def body(c, _):
            return c @ c * 1e-3 + 0.1, ()
        y, _ = jax.lax.scan(body, x, None, length=64)
        return y

    n = 4096
    x = jnp.ones((n, n), jnp.bfloat16) * 1e-3
    y = chain(x)
    jax.block_until_ready(y)
    # 64 matmuls of 4096^3*2 = 8.8 TFLOP; v5e ~200 TFLOP/s bf16 -> ~45 ms
    t0 = time.time(); y = chain(x); jax.block_until_ready(y)
    t_block = time.time() - t0
    t0 = time.time(); y = chain(x); _ = np.asarray(y[:2, :2])
    t_get = time.time() - t0
    print(f"block_until_ready: {t_block*1000:.1f} ms, device_get: {t_get*1000:.1f} ms")

    # same for make_frame: block vs get
    from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD
    from orb_slam2_tpu.utils.synthetic import PlateWorld, loop_trajectory
    from orb_slam2_tpu.pipeline import frame as frame_mod
    fx = 517.3
    cfg = SlamConfig(fx=fx, fy=fx, cx=320.0, cy=240.0, width=640, height=480,
                     bf=fx * 0.25, sensor=SENSOR_RGBD, fps=30.0,
                     th_depth=40.0, n_features=1000, use_pallas=True)
    world = PlateWorld(fx, fx, 320.0, 240.0, 640, 480, z0=5.0)
    gt = loop_trajectory(8, radius=3.0)
    dev = jax.devices()[0]
    frames = [(jax.device_put(jnp.asarray(i), dev), jax.device_put(jnp.asarray(d), dev))
              for i, d in (world.render_with_depth(T) for T in gt)]
    f = frame_mod.make_frame_rgbd(*frames[0], cfg)
    jax.block_until_ready(f.desc)
    for label, sync in [("block", lambda f: jax.block_until_ready(f.desc)),
                        ("get", lambda f: np.asarray(f.n))]:
        t0 = time.time()
        for img, d in frames:
            f = frame_mod.make_frame_rgbd(img, d, cfg)
            sync(f)
        print(f"make_frame_rgbd sync={label}: {(time.time()-t0)/len(frames)*1000:.2f} ms")


if __name__ == "__main__":
    main()
