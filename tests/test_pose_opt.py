import numpy as np
import jax.numpy as jnp

from orb_slam2_tpu.geometry import se3, camera
from orb_slam2_tpu.solvers import pose_opt, reproj

LEVEL_SIGMA2 = [1.2 ** (2 * i) for i in range(8)]


def make_scene(rng, n=200, stereo=False, bf=40.0):
    cam = camera.Camera.make(500.0, 500.0, 320.0, 240.0, bf=bf if stereo else 0.0)
    Xw = np.stack([
        rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 15, n)
    ], axis=-1).astype(np.float32)
    xi_true = np.array([0.1, -0.05, 0.08, 0.02, -0.03, 0.01], dtype=np.float32)
    T_true = se3.exp(jnp.asarray(xi_true))
    pc = np.asarray(se3.apply(T_true, jnp.asarray(Xw)))
    u = 500.0 * pc[:, 0] / pc[:, 2] + 320.0
    v = 500.0 * pc[:, 1] / pc[:, 2] + 240.0
    if stereo:
        ur = u - bf / pc[:, 2]
    else:
        ur = -np.ones(n, np.float32)
    obs = np.stack([u, v, ur], axis=-1).astype(np.float32)
    return cam, Xw, obs, np.asarray(T_true)


class TestPoseOpt:
    def test_converges_noiseless_mono(self, rng):
        cam, Xw, obs, T_true = make_scene(rng)
        T0 = se3.retract(jnp.asarray(T_true), jnp.asarray([0.1, -0.1, 0.05, 0.03, -0.02, 0.04]))
        res = pose_opt.optimize_pose(
            cam, T0, jnp.asarray(Xw), jnp.asarray(obs),
            jnp.zeros(len(Xw), jnp.int32), jnp.ones(len(Xw), bool), LEVEL_SIGMA2)
        np.testing.assert_allclose(np.asarray(res.Tcw), T_true, atol=1e-3)
        assert int(res.n_inliers) == len(Xw)

    def test_converges_stereo(self, rng):
        cam, Xw, obs, T_true = make_scene(rng, stereo=True)
        T0 = se3.retract(jnp.asarray(T_true), jnp.asarray([0.15, 0.1, -0.1, -0.04, 0.02, 0.03]))
        res = pose_opt.optimize_pose(
            cam, T0, jnp.asarray(Xw), jnp.asarray(obs),
            jnp.zeros(len(Xw), jnp.int32), jnp.ones(len(Xw), bool), LEVEL_SIGMA2)
        np.testing.assert_allclose(np.asarray(res.Tcw), T_true, atol=1e-3)

    def test_outlier_rejection(self, rng):
        cam, Xw, obs, T_true = make_scene(rng, n=300)
        # corrupt 20% of observations badly
        n_out = 60
        obs = obs.copy()
        obs[:n_out, :2] += rng.uniform(20, 80, size=(n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
        T0 = se3.retract(jnp.asarray(T_true), jnp.asarray([0.05, -0.05, 0.02, 0.01, -0.02, 0.015]))
        res = pose_opt.optimize_pose(
            cam, T0, jnp.asarray(Xw), jnp.asarray(obs),
            jnp.zeros(len(Xw), jnp.int32), jnp.ones(len(Xw), bool), LEVEL_SIGMA2)
        inl = np.asarray(res.inliers)
        assert not inl[:n_out].any()       # all outliers rejected
        assert inl[n_out:].sum() >= 300 - n_out - 2
        np.testing.assert_allclose(np.asarray(res.Tcw), T_true, atol=2e-3)

    def test_noisy_observations(self, rng):
        cam, Xw, obs, T_true = make_scene(rng, n=500)
        obs = obs.copy()
        obs[:, :2] += rng.normal(0, 0.5, size=(500, 2))
        T0 = se3.retract(jnp.asarray(T_true), jnp.asarray([0.1, 0.05, -0.08, 0.02, 0.02, -0.03]))
        res = pose_opt.optimize_pose(
            cam, T0, jnp.asarray(Xw), jnp.asarray(obs),
            jnp.zeros(len(Xw), jnp.int32), jnp.ones(len(Xw), bool), LEVEL_SIGMA2)
        # translation error small relative to scene scale
        dT = np.asarray(se3.compose(se3.inverse(jnp.asarray(T_true)), res.Tcw))
        assert np.linalg.norm(dT[:3, 3]) < 0.02
        assert int(res.n_inliers) > 450

    def test_masked_edges_ignored(self, rng):
        cam, Xw, obs, T_true = make_scene(rng, n=100)
        # make half the entries garbage but masked out
        obs = obs.copy()
        obs[50:] = 1e6
        valid = np.zeros(100, bool)
        valid[:50] = True
        T0 = se3.retract(jnp.asarray(T_true), jnp.asarray([0.05, 0, 0, 0, 0.01, 0]))
        res = pose_opt.optimize_pose(
            cam, T0, jnp.asarray(Xw), jnp.asarray(obs),
            jnp.zeros(100, jnp.int32), jnp.asarray(valid), LEVEL_SIGMA2)
        np.testing.assert_allclose(np.asarray(res.Tcw), T_true, atol=1e-3)
        assert int(res.n_inliers) == 50


class TestJacobians:
    def test_pose_jacobian_matches_autodiff(self, rng):
        import jax
        cam, Xw, obs, T_true = make_scene(rng, n=20, stereo=True)
        T = jnp.asarray(T_true)
        stereo_mask = jnp.ones(20, bool)

        def res_fn(xi):
            Tp = se3.retract(T, xi)
            e, _, _ = reproj.project_residual(cam, Tp, jnp.asarray(Xw), jnp.asarray(obs), stereo_mask)
            return e

        J_auto = jax.jacfwd(res_fn)(jnp.zeros(6))       # (E,3,6)
        e, pc, _ = reproj.project_residual(cam, T, jnp.asarray(Xw), jnp.asarray(obs), stereo_mask)
        J_ana, _ = reproj.pose_point_jacobians(cam, T, pc)
        np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_ana), atol=1e-3, rtol=1e-3)

    def test_point_jacobian_matches_autodiff(self, rng):
        import jax
        cam, Xw, obs, T_true = make_scene(rng, n=20, stereo=True)
        T = jnp.asarray(T_true)
        stereo_mask = jnp.ones(20, bool)

        def res_fn(X):
            e, _, _ = reproj.project_residual(cam, T, X, jnp.asarray(obs), stereo_mask)
            return e

        J_auto = jax.jacfwd(res_fn)(jnp.asarray(Xw))     # (E,3,E,3)
        J_auto = np.asarray(J_auto)[np.arange(20), :, np.arange(20), :]
        e, pc, _ = reproj.project_residual(cam, T, jnp.asarray(Xw), jnp.asarray(obs), stereo_mask)
        _, J_pt = reproj.pose_point_jacobians(cam, T, pc)
        np.testing.assert_allclose(J_auto, np.asarray(J_pt), atol=1e-3, rtol=1e-3)


class TestPoseLMFused:
    """The one-launch fused LM kernel (pose_lm_pallas, interpret mode) vs
    the XLA schedule: same solution within LM-trajectory tolerance (the
    in-kernel Cholesky and the XLA LU take slightly different damped
    steps)."""

    def _run_both(self, rng, stereo, with_outliers=False, n=256):
        from orb_slam2_tpu.ops import pallas_kernels as pk
        cam, Xw, obs, T_true = make_scene(rng, n=n, stereo=stereo)
        if with_outliers:
            k = n // 8
            obs[:k, :2] += rng.uniform(30, 80, (k, 2)).astype(np.float32)
        T0 = se3.retract(jnp.asarray(T_true),
                         jnp.asarray([0.1, -0.08, 0.05, 0.03, -0.02, 0.04]))
        args = (cam, T0, jnp.asarray(Xw), jnp.asarray(obs),
                jnp.zeros(n, jnp.int32), jnp.ones(n, bool), LEVEL_SIGMA2)
        ref = pose_opt.optimize_pose(*args)
        orig = pk.pose_lm_pallas
        pk.pose_lm_pallas = lambda *a, **k: orig(
            *a, **{**k, "interpret": True})
        try:
            got = pose_opt.optimize_pose(*args, use_pallas=True)
        finally:
            pk.pose_lm_pallas = orig
        return ref, got, T_true

    def test_matches_xla_mono(self, rng):
        ref, got, T_true = self._run_both(rng, stereo=False)
        np.testing.assert_allclose(np.asarray(got.Tcw), T_true, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got.Tcw), np.asarray(ref.Tcw),
                                   atol=1e-3)
        assert int(got.n_inliers) == int(ref.n_inliers)

    def test_matches_xla_stereo_outliers(self, rng):
        ref, got, T_true = self._run_both(rng, stereo=True,
                                          with_outliers=True)
        np.testing.assert_allclose(np.asarray(got.Tcw), T_true, atol=2e-3)
        assert abs(int(got.n_inliers) - int(ref.n_inliers)) <= 2
