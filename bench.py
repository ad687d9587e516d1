"""Benchmark: per-chip tracking throughput at the reference's TUM settings.

Measures the per-frame hot path (ORB extraction 640x480/1000 features +
motion-model projection matching + motion-only BA) on the available device,
steady-state after compilation. One JSON line:

  {"metric": "tracking_fps_per_chip", "value": ..., "unit": "frames/s",
   "vs_baseline": ...}

vs_baseline is against the reference's real-time CPU tracking rate on TUM
(30 fps camera rate, tracked in real time on an i7 — `README.md:134`,
`Examples/Monocular/TUM1.yaml:22`); the BASELINE.json target is >= 2.0 here.
"""
import json
import os
import time

import numpy as np

BASELINE_FPS = 30.0


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeat runs skip the remote compile entirely
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from orb_slam2_tpu.utils.config import SlamConfig
    from orb_slam2_tpu.utils.synthetic import PlaneWorld, lateral_trajectory
    from orb_slam2_tpu.ops import extractor
    from orb_slam2_tpu.pipeline import frame as frame_mod
    from orb_slam2_tpu.pipeline import tracking_ops

    dev = jax.devices()[0]
    cfg = SlamConfig(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                     width=640, height=480, n_features=1000, use_pallas=True)

    world = PlaneWorld(cfg.fx, cfg.fy, cfg.cx, cfg.cy, 640, 480, z0=5.0)
    gt = lateral_trajectory(6, step=0.03)
    imgs = [jax.device_put(jnp.asarray(world.render(T), jnp.float32), dev)
            for T in gt]

    # build two frames + a fake 3D point set for the motion step
    f_prev = frame_mod.make_frame_monocular(imgs[0], cfg)
    cam = cfg.camera()
    z = jnp.full((cfg.max_keypoints,), 5.0)
    x = (f_prev.xy[:, 0] - cam.cx) / cam.fx * z
    y = (f_prev.xy[:, 1] - cam.cy) / cam.fy * z
    last_pts = jnp.stack([x, y, z], axis=-1)
    T_pred = jnp.eye(4)

    def step(img):
        f = frame_mod.make_frame_monocular(img, cfg)
        Tcw, matched, n_inl, n_m = tracking_ops.track_motion_model(
            cfg, T_pred, f_prev, last_pts, f_prev.valid, f)
        return Tcw, n_inl

    # warmup/compile
    out = step(imgs[1])
    jax.block_until_ready(out)

    times = []
    for rep in range(3):
        t0 = time.time()
        n = 0
        for img in imgs[1:]:
            out = step(img)
            jax.block_until_ready(out)   # honest per-frame latency
            n += 1
        times.append((time.time() - t0) / n)
    per_frame = min(times)
    fps = 1.0 / per_frame

    print(json.dumps({
        "metric": "tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
