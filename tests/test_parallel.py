import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from orb_slam2_tpu.geometry import se3
from orb_slam2_tpu.parallel import sharded_ba

from test_schur_ba import make_ba_scene, LEVEL_SIGMA2


class TestShardedBA:
    def test_matches_truth_on_8_device_mesh(self, rng):
        assert len(jax.devices()) >= 8
        cam, prob, poses_true, X_true, nc, npts = make_ba_scene(
            rng, n_cams=6, n_pts=120, C=8, Q=160, O=8)
        mesh = Mesh(np.array(jax.devices()[:8]), ("shard",))
        res = sharded_ba.solve_global_ba_sharded(
            cam, prob, LEVEL_SIGMA2, mesh, n_iters=15, robust=True)
        for c in range(nc):
            np.testing.assert_allclose(np.asarray(res.poses)[c], poses_true[c],
                                       atol=5e-3)
        err = np.linalg.norm(np.asarray(res.points)[:npts] - X_true, axis=-1)
        assert np.median(err) < 1e-2

    def test_sharded_equals_single_device(self, rng):
        """The psum-reduced system must equal the single-shard computation."""
        cam, prob, poses_true, X_true, nc, npts = make_ba_scene(
            rng, n_cams=4, n_pts=60, C=8, Q=160, O=8, perturb=0.01)
        mesh8 = Mesh(np.array(jax.devices()[:8]), ("shard",))
        mesh1 = Mesh(np.array(jax.devices()[:1]), ("shard",))
        r8 = sharded_ba.solve_global_ba_sharded(
            cam, prob, LEVEL_SIGMA2, mesh8, n_iters=5)
        r1 = sharded_ba.solve_global_ba_sharded(
            cam, prob, LEVEL_SIGMA2, mesh1, n_iters=5)
        np.testing.assert_allclose(np.asarray(r8.poses), np.asarray(r1.poses),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(r8.points), np.asarray(r1.points),
                                   atol=1e-4)


class TestShardedPoseGraph:
    """Sharded essential-graph solve (parallel/sharded_pose_graph.py)."""

    def _problem(self, rng, n=16, K=16, E=32):
        from orb_slam2_tpu.geometry import se3, sim3
        from orb_slam2_tpu.geometry.sim3 import Sim3
        from orb_slam2_tpu.solvers.pose_graph import PoseGraphProblem

        gt = []
        for i in range(n):
            ang = 2 * np.pi * i / n
            Twc = np.eye(4)
            Twc[:3, :3] = np.asarray(se3.so3_exp(jnp.asarray([0, 0, ang])))
            Twc[:3, 3] = [np.cos(ang), np.sin(ang), 0.0]
            gt.append(np.linalg.inv(Twc))
        rel_true = [gt[i + 1] @ np.linalg.inv(gt[i]) for i in range(n - 1)]
        drift = np.asarray(se3.exp(jnp.asarray([0.04, 0.02, 0, 0, 0, 0.02])))
        rel_noisy = [r @ drift for r in rel_true]
        poses = [gt[0]]
        for r in rel_noisy:
            poses.append(r @ poses[-1])

        R = jnp.asarray(np.stack([p[:3, :3] for p in poses] +
                                 [np.eye(3)] * (K - n)), jnp.float32)
        t = jnp.asarray(np.stack([p[:3, 3] for p in poses] +
                                 [np.zeros(3)] * (K - n)), jnp.float32)
        nodes = Sim3(R, t, jnp.ones(K))
        node_valid = np.zeros(K, bool); node_valid[:n] = True
        node_fixed = np.zeros(K, bool); node_fixed[0] = True
        ei = np.zeros(E, np.int32); ej = np.zeros(E, np.int32)
        ev = np.zeros(E, bool)
        mR = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
        mt = np.zeros((E, 3), np.float32)
        for i in range(n - 1):
            ei[i], ej[i], ev[i] = i, i + 1, True
            mR[i] = rel_noisy[i][:3, :3]; mt[i] = rel_noisy[i][:3, 3]
        loop = gt[0] @ np.linalg.inv(gt[n - 1])
        ei[n - 1], ej[n - 1], ev[n - 1] = n - 1, 0, True
        mR[n - 1] = loop[:3, :3]; mt[n - 1] = loop[:3, 3]
        prob = PoseGraphProblem(
            nodes=nodes, node_valid=jnp.asarray(node_valid),
            node_fixed=jnp.asarray(node_fixed),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            edge_meas=Sim3(jnp.asarray(mR), jnp.asarray(mt), jnp.ones(E)),
            edge_valid=jnp.asarray(ev))
        return prob, gt, n

    def test_sharded_equals_single_device(self, rng):
        from orb_slam2_tpu.parallel import sharded_pose_graph
        from orb_slam2_tpu.solvers import pose_graph

        prob, gt, n = self._problem(rng)
        mesh8 = Mesh(np.array(jax.devices()[:8]), ("shard",))
        out_s = sharded_pose_graph.optimize_pose_graph_sharded(
            prob, mesh8, n_iters=15, fix_scale=True)
        out_1 = pose_graph.optimize_pose_graph(prob, n_iters=15,
                                               fix_scale=True)
        np.testing.assert_allclose(np.asarray(out_s.t)[:n],
                                   np.asarray(out_1.t)[:n], atol=1e-3)
        np.testing.assert_allclose(np.asarray(out_s.R)[:n],
                                   np.asarray(out_1.R)[:n], atol=1e-3)
        # and the loop junction actually snapped shut (the drift that
        # accumulated at the last node is redistributed around the cycle)
        T_new = np.asarray(out_s.to_se3())
        T0 = np.asarray(prob.nodes.to_se3())
        end_after = np.linalg.norm(np.linalg.inv(T_new[n - 1])[:3, 3]
                                   - np.linalg.inv(gt[n - 1])[:3, 3])
        end_before = np.linalg.norm(np.linalg.inv(T0[n - 1])[:3, 3]
                                    - np.linalg.inv(gt[n - 1])[:3, 3])
        assert end_after < 0.5 * end_before, (end_before, end_after)
