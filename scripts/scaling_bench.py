"""Multi-chip scaling measurement for the sharded global-BA step.

BASELINE.json asks for >= 70% scaling efficiency at 2 hosts. No multi-chip
hardware is available here, so this harness measures what CAN be measured and
models the rest:

1. STRONG SCALING on an 8-virtual-device CPU mesh: the same global-BA problem
   (points sharded) solved at mesh sizes 1/2/4/8. CPU cores are not TPU
   chips, but the parallel fraction and the collective's cost structure are
   the design's own; the efficiency curve validates that per-iteration work
   is ~1/n + one psum.
2. COMMUNICATION MODEL: the solver's only per-iteration collective is a psum
   of the reduced camera system ((6C)^2 + 6C + 1 floats). Projected 2-host
   efficiency = t_comp/2 / (t_comp/2 + t_comm) with t_comm from ICI
   (~4.5e10 B/s/link v5e) and DCN (~2.5e9 B/s) bandwidths vs the measured
   single-chip iteration time (pass --tpu to measure it on the real chip).

Writes the table to stdout; paste into SCALING.md.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_problem(C, Q, O, seed=0):
    import jax.numpy as jnp
    from orb_slam2_tpu.geometry import se3
    import jax
    from orb_slam2_tpu.solvers.schur_ba import BAProblem

    rng = np.random.default_rng(seed)
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (C, 4, 4)).copy()
    for c in range(C):
        xi = np.concatenate([rng.normal(0, 0.3, 3), rng.normal(0, 0.02, 3)])
        poses[c] = np.asarray(se3.exp(jnp.asarray(xi.astype(np.float32))))
    X = np.stack([rng.uniform(-5, 5, Q), rng.uniform(-3, 3, Q),
                  rng.uniform(4, 20, Q)], -1).astype(np.float32)
    obs_cam = rng.integers(0, C, size=(Q, O)).astype(np.int32)
    # project ground truth + noise
    pc = np.einsum("qoij,qj->qoi", poses[obs_cam][:, :, :3, :3], X) + \
        poses[obs_cam][:, :, :3, 3]
    z = np.maximum(pc[..., 2], 0.5)
    u = 300.0 * pc[..., 0] / z + 320.0 + rng.normal(0, 0.5, (Q, O))
    v = 300.0 * pc[..., 1] / z + 240.0 + rng.normal(0, 0.5, (Q, O))
    obs_uvr = np.stack([u, v, np.full_like(u, -1.0)], -1).astype(np.float32)
    bad = pc[..., 2] < 0.5
    obs_cam = np.where(bad, -1, obs_cam)
    cam_fixed = np.zeros(C, bool)
    cam_fixed[:2] = True
    return BAProblem(
        poses=jnp.asarray(poses), cam_valid=jnp.ones(C, bool),
        cam_fixed=jnp.asarray(cam_fixed),
        points=jnp.asarray(X + rng.normal(0, 0.05, X.shape).astype(np.float32)),
        pt_valid=jnp.ones(Q, bool), obs_cam=jnp.asarray(obs_cam),
        obs_uvr=jnp.asarray(obs_uvr), obs_level=jnp.zeros((Q, O), jnp.int32))


def measure(mesh_size, C, Q, O, n_iters=6, reps=3):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from orb_slam2_tpu.parallel import sharded_ba
    from orb_slam2_tpu.geometry.camera import Camera

    cam = Camera.make(300.0, 300.0, 320.0, 240.0, bf=0.0)
    prob = build_problem(C, Q, O)
    mesh = Mesh(np.array(jax.devices()[:mesh_size]), ("shard",))
    sig2 = [1.2 ** (2 * i) for i in range(8)]
    res = sharded_ba.solve_global_ba_sharded(cam, prob, sig2, mesh,
                                             n_iters=n_iters)
    _ = np.asarray(res.poses)  # compile + drain (block_until_ready lies on axon)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        res = sharded_ba.solve_global_ba_sharded(cam, prob, sig2, mesh,
                                                 n_iters=n_iters)
        _ = np.asarray(res.poses)
        best = min(best, (time.time() - t0) / n_iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="measure single-chip iteration time on the real TPU")
    ap.add_argument("--cams", type=int, default=256)
    ap.add_argument("--points", type=int, default=1 << 15)
    ap.add_argument("--obs", type=int, default=8)
    args = ap.parse_args()

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"   # override the axon sitecustomize
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   " --xla_force_host_platform_device_count=8")
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    C, Q, O = args.cams, args.points, args.obs
    print(f"devices: {len(jax.devices())} ({jax.devices()[0].platform}); "
          f"problem C={C} Q={Q} O={O}", flush=True)

    sizes = [1, 2, 4, 8] if not args.tpu else [1]
    t1 = None
    rows = []
    for n in sizes:
        t = measure(n, C, Q, O)
        t1 = t1 or t
        eff = t1 / (n * t)
        rows.append((n, t * 1000, eff))
        print(f"mesh={n}:  {t*1000:8.2f} ms/iter   strong-scaling eff "
              f"{eff*100:5.1f}%", flush=True)

    # communication model for the projected 2-host figure
    comm_bytes = ((6 * C) ** 2 + 6 * C + 1) * 4
    print(f"\npsum payload per iteration: {comm_bytes/1e6:.2f} MB")
    for label, bw in [("ICI (v5e, 1 link)", 4.5e10), ("DCN", 2.5e9)]:
        t_comm = 2 * comm_bytes / bw  # reduce-scatter + all-gather equivalent
        if args.tpu:
            t_comp = rows[0][1] / 1000
            eff2 = (t_comp / 2) / (t_comp / 2 + t_comm)
            print(f"projected 2-device eff over {label}: {eff2*100:5.1f}% "
                  f"(t_comp={t_comp*1000:.2f} ms, t_comm={t_comm*1000:.3f} ms)")
        else:
            print(f"{label}: t_comm = {t_comm*1000:.3f} ms/iter")


if __name__ == "__main__":
    main()
