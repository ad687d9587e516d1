"""Micro-timings for local_ba internals on TPU: Cholesky of the reduced
camera system vs the dense-W Schur chain vs one-hot reductions.

  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u scripts/probe_ba_micro.py > /root/probe_ba.log 2>&1 &
"""
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(f"device: {jax.devices()[0]}", flush=True)

    rng = np.random.default_rng(0)
    Q, O, C = 4096, 12, 64

    def timeit(name, f, *args, k=20):
        g = jax.jit(f)
        r = g(*args)
        _ = jax.device_get(jax.tree.leaves(r)[0])
        t0 = time.time()
        for _ in range(k):
            r = g(*args)
        _ = jax.device_get(jax.tree.leaves(r)[0])
        print(f"{name:<44s} {(time.time()-t0)/k*1e3:8.2f} ms", flush=True)

    A = jnp.asarray(rng.normal(size=(C * 6, C * 6)).astype(np.float32))
    S = A @ A.T + 1e3 * jnp.eye(C * 6)
    b = jnp.asarray(rng.normal(size=(C * 6,)).astype(np.float32))
    timeit("cho_factor+solve (384x384)",
           lambda S, b: jax.scipy.linalg.cho_solve(
               jax.scipy.linalg.cho_factor(S, lower=True), b), S, b)
    timeit("linalg.solve (384x384)", lambda S, b: jnp.linalg.solve(S, b), S, b)

    W_e = jnp.asarray(rng.normal(size=(Q, O, 6, 3)).astype(np.float32))
    oc = jnp.asarray(rng.integers(0, C, (Q, O)).astype(np.int32))
    Hinv = jnp.asarray(rng.normal(size=(Q, 3, 3)).astype(np.float32))

    def wd_chain(W_e, oc, Hinv):
        onehot = (oc[:, :, None] == jnp.arange(C)[None, None, :]).astype(jnp.float32)
        Wd = jnp.einsum("qoc,qoij->qcij", onehot, W_e)
        M = jnp.einsum("qcij,qjk->qcik", Wd, Hinv)
        M2 = M.transpose(1, 2, 0, 3).reshape(C * 6, Q * 3)
        W2 = Wd.transpose(1, 2, 0, 3).reshape(C * 6, Q * 3)
        return M2 @ W2.T
    timeit("dense-W Schur chain (onehot+2x75MB+matmul)", wd_chain, W_e, oc, Hinv)

    # edge terms proxy: (Q,O) gathers + jacobians-scale elementwise
    poses = jnp.asarray(rng.normal(size=(C, 4, 4)).astype(np.float32))
    def edge_gather(poses, oc):
        T = poses[jnp.clip(oc, 0, C - 1)]
        return jnp.sum(T, axis=(2, 3))
    timeit("edge pose gather (Q,O,4,4)", edge_gather, poses, oc)

    from orb_slam2_tpu.solvers import schur_ba
    from orb_slam2_tpu.geometry.camera import Camera
    cam = Camera.make(500., 500., 320., 240., bf=120.)
    prob = schur_ba.BAProblem(
        poses=jnp.eye(4)[None].repeat(C, 0),
        cam_valid=jnp.ones(C, bool), cam_fixed=jnp.zeros(C, bool).at[0].set(True),
        points=jnp.asarray(rng.normal(size=(Q, 3)).astype(np.float32) + np.array([0, 0, 10.])),
        pt_valid=jnp.ones(Q, bool),
        obs_cam=oc,
        obs_uvr=jnp.asarray(np.concatenate([rng.uniform(0, 640, (Q, O, 2)),
                                            -np.ones((Q, O, 1))], -1).astype(np.float32)),
        obs_level=jnp.zeros((Q, O), jnp.int32))
    sigma2 = [1.2 ** (2 * i) for i in range(8)]
    for up in (False, True):
        for it in [(1, 0), (5, 0), (5, 10)]:
            t0 = time.time()
            r = schur_ba.solve_ba(cam, prob, sigma2, iters_a=it[0],
                                  iters_b=it[1], use_pallas=up)
            _ = jax.device_get(r.poses)
            t1 = time.time()
            for _k in range(3):
                r = schur_ba.solve_ba(cam, prob, sigma2, iters_a=it[0],
                                      iters_b=it[1], use_pallas=up)
            _ = jax.device_get(r.poses)
            print(f"solve_ba iters={it} pallas={up}: "
                  f"{(time.time()-t1)/3*1e3:.1f} ms "
                  f"(first {t1-t0:.1f}s w/ compile)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
