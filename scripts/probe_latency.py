"""Probe: tunnel RTT, make_frame mono vs rgbd, tracking_step internals."""
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
    from orb_slam2_tpu.pipeline import frame as frame_mod

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # 1. raw dispatch RTT: tiny jitted op, block each time
    @jax.jit
    def tiny(x):
        return x + 1.0
    x = jax.device_put(jnp.zeros((8,)), dev)
    jax.block_until_ready(tiny(x))
    t0 = time.time()
    for _ in range(50):
        x = tiny(x)
        jax.block_until_ready(x)
    print(f"tiny-op RTT: {(time.time()-t0)/50*1000:.3f} ms", flush=True)

    fx = 517.3
    cfg = SlamConfig(fx=fx, fy=fx, cx=320.0, cy=240.0, width=640, height=480,
                     bf=fx * 0.25, sensor=SENSOR_RGBD, fps=30.0,
                     th_depth=40.0, n_features=1000, use_pallas=True)
    world = PlateWorld(fx, fx, 320.0, 240.0, 640, 480, z0=5.0)
    gt = loop_trajectory(8, radius=3.0)
    frames = []
    for T in gt:
        img, depth = world.render_with_depth(T)
        frames.append((jax.device_put(jnp.asarray(img), dev),
                       jax.device_put(jnp.asarray(depth), dev)))

    def timeit(label, fn, n=8, reps=3):
        fn()  # compile
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, (time.time() - t0) / n)
        print(f"{label:28s} {best*1000:8.2f} ms", flush=True)

    def run_rgbd():
        for img, d in frames:
            f = frame_mod.make_frame_rgbd(img, d, cfg)
            jax.block_until_ready(f.desc)
        return len(frames)
    timeit("make_frame_rgbd", run_rgbd)

    import dataclasses
    cfg_m = dataclasses.replace(cfg, sensor=0, bf=0.0)
    def run_mono():
        for img, d in frames:
            f = frame_mod.make_frame_monocular(img, cfg_m)
            jax.block_until_ready(f.desc)
        return len(frames)
    timeit("make_frame_mono", run_mono)

    # extraction only
    from orb_slam2_tpu.ops import extractor
    ext = jax.jit(lambda im: extractor.extract(im.astype(jnp.float32), cfg),
                  static_argnames=())
    def run_ext():
        for img, d in frames:
            k = ext(img)
            jax.block_until_ready(k.desc)
    timeit("extract only", run_ext)

    # rgbd depth association only
    from orb_slam2_tpu.ops import stereo as stereo_ops
    f0 = frame_mod.make_frame_rgbd(*frames[0], cfg)
    sfr = jax.jit(lambda xy, valid, dimg: stereo_ops.stereo_from_rgbd(
        xy, xy, valid, dimg.astype(jnp.float32), cfg.bf, cfg.depth_map_factor))
    def run_sfr():
        for img, d in frames:
            out = sfr(f0.xy, f0.valid, d)
            jax.block_until_ready(out[0])
    timeit("stereo_from_rgbd only", run_sfr)


if __name__ == "__main__":
    main()
