"""Cumulative scan-amortized extract-stage timings (all 8 levels)."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from orb_slam2_tpu.utils.config import SlamConfig
    from orb_slam2_tpu.utils.synthetic import PlateWorld, loop_trajectory
    from orb_slam2_tpu.ops import extractor, fast as fast_ops, image as image_ops
    from orb_slam2_tpu.ops import select as select_ops, orient_brief

    dev = jax.devices()[0]
    fx = 517.3
    cfg = SlamConfig(fx=fx, fy=fx, cx=320.0, cy=240.0, width=640, height=480,
                     bf=fx * 0.25, fps=30.0, n_features=1000, use_pallas=True)
    world = PlateWorld(fx, fx, 320.0, 240.0, 640, 480, z0=5.0)
    gt = loop_trajectory(10, radius=3.0)
    imgs = jax.device_put(jnp.stack(
        [jnp.asarray(world.render_with_depth(T)[0], jnp.float32) for T in gt]), dev)
    _ = np.asarray(jnp.sum(imgs))

    budgets = cfg.features_per_level()
    E = 19 - 3  # EDGE_THRESHOLD - 3

    def stage_fn(upto):
        def per_img(im):
            acc = jnp.zeros((), jnp.float32)
            pyr = extractor.build_pyramid(im, cfg)
            if upto == 0:
                return sum(jnp.sum(p[::16, ::16]) for p in pyr)
            for lvl in range(cfg.n_levels):
                img = pyr[lvl]
                h, w = img.shape
                score = fast_ops.fast_score_map(img)
                if upto == 1:
                    acc += jnp.sum(score[::16, ::16]); continue
                cand, ms = fast_ops.compute_candidates(
                    score, cfg.ini_th_fast, cfg.min_th_fast,
                    E, w - E, E, h - E)
                if upto == 2:
                    acc += jnp.sum(cand[::16, ::16]); continue
                ys, xs, resp, valid = select_ops.select_uniform(
                    ms, budgets[lvl], E, w - E, E, h - E)
                if upto == 3:
                    acc += jnp.sum(ys) + jnp.sum(valid); continue
                ys_s = jnp.where(valid, ys, 19)
                xs_s = jnp.where(valid, xs, 19)
                ang = orient_brief.ic_angles(img, ys_s, xs_s)
                if upto == 4:
                    acc += jnp.sum(ang); continue
                blur = image_ops.gaussian_blur(img)
                if upto == 5:
                    acc += jnp.sum(blur[::16, ::16]) + jnp.sum(ang); continue
                desc = orient_brief.steered_brief(blur, ys_s, xs_s, ang)
                acc += jnp.sum(desc).astype(jnp.float32)
            return acc

        @jax.jit
        def run(ims):
            def body(c, im):
                return c + per_img(im), ()
            out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), ims)
            return out
        return run

    labels = ["pyramid", "+score", "+candidates", "+select", "+angles",
              "+blur", "+brief(all)"]
    prev = 0.0
    for upto, label in enumerate(labels):
        run = stage_fn(upto)
        out = run(imgs); _ = np.asarray(out)
        best = 1e9
        for _i in range(3):
            t0 = time.time()
            out = run(imgs); _ = np.asarray(out)
            best = min(best, (time.time() - t0) / 10)
        print(f"{label:14s} {best*1000:8.2f} ms  (+{(best-prev)*1000:6.2f})",
              flush=True)
        prev = best


if __name__ == "__main__":
    main()
