"""Measured ingredients of the two-chip tracking/mapping split (VERDICT r4
#7): the MapState snapshot transfer cost at bench capacities, through the
tunnel (host-mediated — an upper bound many times worse than real ICI), plus
its exact payload size; and the tracking-step throughput with no mapping work
on the chip (what the tracking chip runs in split mode).

  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_split_cost.py
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD
    from orb_slam2_tpu.utils.synthetic import PlateWorld, loop_trajectory
    from orb_slam2_tpu.pipeline.system import SlamSystem

    dev = jax.devices()[0]
    fx, W, H = 517.3, 640, 480
    cfg = SlamConfig(fx=fx, fy=fx, cx=W/2, cy=H/2, width=W, height=H,
                     bf=fx*0.25, sensor=SENSOR_RGBD, fps=30.0, th_depth=40.0,
                     n_features=1000, max_keyframes=128, max_map_points=1 << 14)
    world = PlateWorld(fx, fx, W/2, H/2, W, H, z0=5.0)
    gt = loop_trajectory(40, radius=1.2)
    s = SlamSystem(cfg, enable_loop_closing=False)
    for i, T in enumerate(gt):
        img, dep = world.render_with_depth(T)
        assert s.track_rgbd(jnp.asarray(img), jnp.asarray(dep), i/30.) is not None
    m = s.m
    leaves = jax.tree.leaves(m)
    nbytes = sum(int(np.prod(l.shape)) * l.dtype.itemsize for l in leaves)
    print(f"MapState: {len(leaves)} arrays, {nbytes/1e6:.1f} MB "
          f"(caps kf={cfg.max_keyframes} pts={cfg.max_map_points})", flush=True)

    # device -> host (the tunnel's worst case; ICI would be ~45 GB/s)
    t = []
    for _ in range(3):
        t0 = time.time(); h = jax.device_get(m); t.append(time.time() - t0)
    print(f"device->host full snapshot: {min(t)*1e3:.0f} ms "
          f"({nbytes/1e6/min(t):.0f} MB/s)", flush=True)
    # host -> device
    t = []
    for _ in range(3):
        t0 = time.time()
        md = jax.device_put(h, dev)
        jax.tree.map(lambda a: a.block_until_ready(), md)
        t.append(time.time() - t0)
    print(f"host->device full snapshot: {min(t)*1e3:.0f} ms "
          f"({nbytes/1e6/min(t):.0f} MB/s)", flush=True)
    print("projected ICI transfer at 45 GB/s: "
          f"{nbytes/45e9*1e3:.2f} ms per direction", flush=True)


if __name__ == "__main__":
    main()
