"""Honest per-stage timing of the extraction + tracking path on axon.

block_until_ready is a NO-OP on the axon backend (measured: an 8.8-TFLOP
chain "blocks" in 0.2 ms). Every timing here syncs with a device_get of a
scalar reduction, which genuinely drains the queue.
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
    from orb_slam2_tpu.ops import extractor, fast as fast_ops, image as image_ops
    from orb_slam2_tpu.ops import select as select_ops, orient_brief, stereo as stereo_ops
    from orb_slam2_tpu.pipeline import frame as frame_mod

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    fx = 517.3
    cfg = SlamConfig(fx=fx, fy=fx, cx=320.0, cy=240.0, width=640, height=480,
                     bf=fx * 0.25, sensor=SENSOR_RGBD, fps=30.0,
                     th_depth=40.0, n_features=1000, use_pallas=True)
    world = PlateWorld(fx, fx, 320.0, 240.0, 640, 480, z0=5.0)
    gt = loop_trajectory(4, radius=3.0)
    frames = [(jax.device_put(jnp.asarray(i), dev), jax.device_put(jnp.asarray(d), dev))
              for i, d in (world.render_with_depth(T) for T in gt)]
    img0 = frames[0][0].astype(jnp.float32)
    imgs = [f[0].astype(jnp.float32) for f in frames]
    jax.block_until_ready(imgs)
    _ = np.asarray(jnp.sum(imgs[0]))  # drain

    def timeit(label, fn, reps=5):
        out = fn(0)
        _ = np.asarray(out)          # compile + drain
        t0 = time.time()
        for i in range(reps):
            out = fn(i % len(frames))
        _ = np.asarray(out)          # one drain at the end: amortized honest
        dt = (time.time() - t0) / reps
        print(f"{label:28s} {dt*1000:9.2f} ms", flush=True)
        return dt

    # --- extraction stages (level-0 image) ---
    @jax.jit
    def f_pyr(im):
        pyr = extractor.build_pyramid(im, cfg)
        return sum(jnp.sum(p) for p in pyr)
    timeit("build_pyramid", lambda i: f_pyr(imgs[i]))

    @jax.jit
    def f_score(im):
        return jnp.sum(fast_ops.fast_score_map(im))
    timeit("fast_score_map L0", lambda i: f_score(imgs[i]))

    @jax.jit
    def f_cand(im):
        s = fast_ops.fast_score_map(im)
        cand, ms = fast_ops.compute_candidates(s, cfg.ini_th_fast,
                                               cfg.min_th_fast, 16, 624, 16, 464)
        return jnp.sum(cand)
    timeit("score+candidates L0", lambda i: f_cand(imgs[i]))

    @jax.jit
    def f_sel(im):
        s = fast_ops.fast_score_map(im)
        cand, ms = fast_ops.compute_candidates(s, cfg.ini_th_fast,
                                               cfg.min_th_fast, 16, 624, 16, 464)
        ys, xs, resp, valid = select_ops.select_uniform(ms, 217, 16, 624, 16, 464)
        return jnp.sum(ys) + jnp.sum(valid)
    timeit("score+cand+select L0", lambda i: f_sel(imgs[i]))

    @jax.jit
    def f_orient(im):
        ys = jnp.linspace(20, 440, 217).astype(jnp.int32)
        xs = jnp.linspace(20, 600, 217).astype(jnp.int32)
        a = orient_brief.ic_angles(im, ys, xs)
        return jnp.sum(a)
    timeit("ic_angles L0 (217 kp)", lambda i: f_orient(imgs[i]))

    @jax.jit
    def f_blur(im):
        return jnp.sum(image_ops.gaussian_blur(im))
    timeit("gaussian_blur L0", lambda i: f_blur(imgs[i]))

    @jax.jit
    def f_brief(im):
        ys = jnp.linspace(20, 440, 217).astype(jnp.int32)
        xs = jnp.linspace(20, 600, 217).astype(jnp.int32)
        b = image_ops.gaussian_blur(im)
        a = orient_brief.ic_angles(im, ys, xs)
        d = orient_brief.steered_brief(b, ys, xs, a)
        return jnp.sum(d)
    timeit("blur+angles+brief L0", lambda i: f_brief(imgs[i]))

    @jax.jit
    def f_extract(im):
        k = extractor.extract(im, cfg)
        return jnp.sum(k.desc) + jnp.sum(k.xy)
    timeit("extract (8 levels)", lambda i: f_extract(imgs[i]))

    @jax.jit
    def f_frame(im, d):
        f = frame_mod.make_frame_rgbd(im, d, cfg)
        return jnp.sum(f.desc) + jnp.sum(f.depth)
    timeit("make_frame_rgbd", lambda i: f_frame(*frames[i]))


if __name__ == "__main__":
    main()
