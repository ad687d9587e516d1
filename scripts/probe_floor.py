"""Probe: axon per-dispatch overhead vs real compute (scan-amortized)."""
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
    from orb_slam2_tpu.ops import extractor

    dev = jax.devices()[0]
    fx = 517.3
    cfg = SlamConfig(fx=fx, fy=fx, cx=320.0, cy=240.0, width=640, height=480,
                     bf=fx * 0.25, sensor=SENSOR_RGBD, fps=30.0,
                     th_depth=40.0, n_features=1000, use_pallas=True)
    world = PlateWorld(fx, fx, 320.0, 240.0, 640, 480, z0=5.0)
    gt = loop_trajectory(10, radius=3.0)
    imgs = jnp.stack([jnp.asarray(world.render_with_depth(T)[0], jnp.float32)
                      for T in gt])
    imgs = jax.device_put(imgs, dev)
    _ = np.asarray(jnp.sum(imgs))

    def timeit(label, fn, reps=5, per=1):
        out = fn(0)
        _ = np.asarray(out)
        t0 = time.time()
        for i in range(reps):
            out = fn(i)
        _ = np.asarray(out)
        print(f"{label:28s} {(time.time()-t0)/reps/per*1000:9.2f} ms", flush=True)

    @jax.jit
    def f_sum(im):
        return jnp.sum(im)
    timeit("sum(img) [floor]", lambda i: f_sum(imgs[i % 10]))

    @jax.jit
    def f_ext1(im):
        k = extractor.extract(im, cfg)
        return jnp.sum(k.desc)
    timeit("extract x1", lambda i: f_ext1(imgs[i % 10]))

    @jax.jit
    def f_ext10(ims):
        def body(c, im):
            k = extractor.extract(im, cfg)
            return c + jnp.sum(k.desc), ()
        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint32), ims)
        return out
    timeit("extract x10 scan (per img)", lambda i: f_ext10(imgs), per=10)


if __name__ == "__main__":
    main()
