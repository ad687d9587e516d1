"""Micro-profile of the extraction pipeline stages on the TPU.

Times each stage of ops/extractor.extract separately (steady-state, blocked),
plus the tunnel round-trip floor, to find where make_frame's ~216 ms goes.

  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u scripts/profile_extract.py > /root/profile_extract.log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import functools

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print("devices:", jax.devices(), flush=True)

    from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD
    from orb_slam2_tpu.utils.synthetic import PlateWorld
    from orb_slam2_tpu.ops import extractor, fast as fast_ops, image as image_ops
    from orb_slam2_tpu.ops import select as select_ops, orient_brief, stereo as stereo_ops
    from orb_slam2_tpu.geometry import camera as camera_mod
    from orb_slam2_tpu.pipeline import frame as frame_mod

    fx = fy = 517.3
    W, H = 640, 480
    cfg = SlamConfig(fx=fx, fy=fy, cx=W / 2, cy=H / 2, width=W, height=H,
                     n_features=1000, bf=fx * 0.25, sensor=SENSOR_RGBD,
                     fps=30.0, th_depth=40.0, use_pallas=True)
    world = PlateWorld(fx, fy, W / 2, H / 2, W, H, z0=5.0)
    img_np, depth_np = world.render_with_depth(np.eye(4))
    dev = jax.devices()[0]
    img = jax.device_put(jnp.asarray(img_np), dev)
    depth = jax.device_put(jnp.asarray(depth_np), dev)

    REPS = 30

    def timeit(label, fn, *args):
        out = fn(*args)                    # compile
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(REPS):
                out = fn(*args)
                jax.block_until_ready(out)
            ts.append((time.time() - t0) / REPS)
        print(f"{label:22s} {min(ts)*1000:8.2f} ms", flush=True)
        return out

    # tunnel round-trip floor
    trivial = jax.jit(lambda x: x + 1.0)
    timeit("rtt_floor(add)", trivial, jnp.zeros(()))

    imgf = img.astype(jnp.float32)
    jax.block_until_ready(imgf)

    # pyramid
    pyr_fn = jax.jit(functools.partial(extractor.build_pyramid, cfg=cfg))
    pyr = timeit("build_pyramid", pyr_fn, imgf)

    # FAST score maps, all levels
    @jax.jit
    def fast_all(pyr):
        return [fast_ops.fast_score_map(p) for p in pyr]
    scores = timeit("fast_scores(8lv)", fast_all, pyr)

    # candidates + uniform selection, all levels
    budgets = cfg.features_per_level()

    @jax.jit
    def select_all(pyr):
        outs = []
        for lvl in range(cfg.n_levels):
            p = pyr[lvl]
            h, w = p.shape
            mb = extractor.EDGE_THRESHOLD - 3
            score = fast_ops.fast_score_map(p)
            cand, cand_score = fast_ops.compute_candidates(
                score, cfg.ini_th_fast, cfg.min_th_fast,
                mb, w - mb, mb, h - mb)
            outs.append(select_ops.select_uniform(
                cand_score, budgets[lvl], mb, w - mb, mb, h - mb))
        return outs
    sel = timeit("fast+select(8lv)", select_all, pyr)

    # orientation + blur + BRIEF, all levels
    @jax.jit
    def orient_all(pyr, sel):
        outs = []
        for lvl in range(cfg.n_levels):
            ys, xs, resp, valid = sel[lvl]
            ys = jnp.where(valid, ys, extractor.EDGE_THRESHOLD)
            xs = jnp.where(valid, xs, extractor.EDGE_THRESHOLD)
            ang = orient_brief.ic_angles(pyr[lvl], ys, xs)
            blurred = image_ops.gaussian_blur(pyr[lvl])
            desc = orient_brief.steered_brief(blurred, ys, xs, ang)
            outs.append((ang, desc))
        return outs
    timeit("orient+blur+brief", orient_all, pyr, sel)

    @jax.jit
    def blur_all(pyr):
        return [image_ops.gaussian_blur(p) for p in pyr]
    timeit("blur_only(8lv)", blur_all, pyr)

    # full extract + full make_frame for reference
    ex_fn = jax.jit(functools.partial(extractor.extract, cfg=cfg))
    timeit("extract(full)", ex_fn, imgf)
    timeit("make_frame_rgbd", lambda i, d: frame_mod.make_frame_rgbd(i, d, cfg),
           img, depth)


if __name__ == "__main__":
    main()
