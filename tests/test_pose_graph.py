import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_tpu.geometry import se3, sim3
from orb_slam2_tpu.geometry.sim3 import Sim3
from orb_slam2_tpu.solvers import pose_graph


def make_sim3(R, t, s):
    return Sim3(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
                jnp.asarray(s, jnp.float32))


def stack_sim3(gs):
    return Sim3(jnp.stack([g.R for g in gs]), jnp.stack([g.t for g in gs]),
                jnp.stack([g.s for g in gs]))


class TestPoseGraph:
    def test_loop_drift_correction(self, rng):
        """Classic test: circular trajectory with odometry drift; one loop
        edge snaps the chain back; ATE drops massively."""
        n = 16
        K = 20  # padded
        # ground-truth poses on a circle (camera-to-world), convert to Siw
        gt = []
        for i in range(n):
            ang = 2 * np.pi * i / n
            Twc = np.eye(4)
            Twc[:3, :3] = np.asarray(se3.so3_exp(jnp.asarray([0, 0, ang])))
            Twc[:3, 3] = [np.cos(ang), np.sin(ang), 0.0]
            gt.append(np.linalg.inv(Twc))      # Tcw

        # odometry with drift: relative measurements between consecutive
        rel_true = [gt[i + 1] @ np.linalg.inv(gt[i]) for i in range(n - 1)]
        drift = np.asarray(se3.exp(jnp.asarray([0.05, 0.02, 0.0, 0.0, 0.0, 0.025])))
        rel_noisy = [r @ drift for r in rel_true]

        # integrated (drifted) initial nodes
        poses = [gt[0]]
        for r in rel_noisy:
            poses.append(r @ poses[-1])

        nodes = stack_sim3(
            [make_sim3(p[:3, :3], p[:3, 3], 1.0) for p in poses] +
            [make_sim3(np.eye(3), np.zeros(3), 1.0)] * (K - n))
        node_valid = np.zeros(K, bool); node_valid[:n] = True
        node_fixed = np.zeros(K, bool); node_fixed[0] = True

        # edges: odometry chain (with the DRIFTED measurements — consistent
        # with initialization) + one loop edge with the TRUE relative pose
        E = 32
        ei = np.zeros(E, np.int32); ej = np.zeros(E, np.int32)
        ev = np.zeros(E, bool)
        meas = []
        for i in range(n - 1):
            ei[i], ej[i], ev[i] = i, i + 1, True
            meas.append(make_sim3(rel_noisy[i][:3, :3], rel_noisy[i][:3, 3], 1.0))
        # loop edge n-1 -> 0 with true measurement
        loop_rel = gt[0] @ np.linalg.inv(gt[n - 1])
        ei[n - 1], ej[n - 1], ev[n - 1] = n - 1, 0, True
        meas.append(make_sim3(loop_rel[:3, :3], loop_rel[:3, 3], 1.0))
        while len(meas) < E:
            meas.append(make_sim3(np.eye(3), np.zeros(3), 1.0))
        edge_meas = stack_sim3(meas)

        prob = pose_graph.PoseGraphProblem(
            nodes=nodes, node_valid=jnp.asarray(node_valid),
            node_fixed=jnp.asarray(node_fixed),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            edge_meas=edge_meas, edge_valid=jnp.asarray(ev))

        def ate(ns):
            err = 0.0
            for i in range(n):
                Tcw = np.asarray(ns.R[i]), np.asarray(ns.t[i]) / np.asarray(ns.s[i])
                C = -Tcw[0].T @ Tcw[1]
                Cg = -gt[i][:3, :3].T @ gt[i][:3, 3]
                err += np.sum((C - Cg) ** 2)
            return np.sqrt(err / n)

        def endpoint_err(ns):
            # camera-center error of the last node (where drift accumulates)
            i = n - 1
            C = -np.asarray(ns.R[i]).T @ (np.asarray(ns.t[i]) / np.asarray(ns.s[i]))
            Cg = -gt[i][:3, :3].T @ gt[i][:3, 3]
            return np.linalg.norm(C - Cg)

        ate_before = ate(nodes)
        end_before = endpoint_err(nodes)
        out = pose_graph.optimize_pose_graph(prob, n_iters=20)
        ate_after = ate(out)
        end_after = endpoint_err(out)
        assert end_before > 0.3           # accumulated drift at the loop end
        # the loop edge snaps the junction shut; remaining error is the
        # least-squares redistribution over the drifted odometry edges
        assert end_after < 0.35 * end_before, (end_before, end_after)
        assert ate_after < ate_before

    def test_scale_drift_correction_7dof(self, rng):
        """Monocular scale drift: each odometry step shrinks scale; the 7-dof
        graph with a loop edge recovers scale consistency."""
        n = 10
        K = 12
        gt = []
        for i in range(n):
            Twc = np.eye(4)
            Twc[:3, 3] = [i * 1.0, 0, 0]
            gt.append(np.linalg.inv(Twc))
        rel_true = [gt[i + 1] @ np.linalg.inv(gt[i]) for i in range(n - 1)]
        # measured odometry has wrong scale s=0.95 each step
        nodes_list = [make_sim3(gt[0][:3, :3], gt[0][:3, 3], 1.0)]
        meas = []
        cur = sim3.Sim3(jnp.asarray(gt[0][:3, :3]), jnp.asarray(gt[0][:3, 3]), jnp.asarray(1.0))
        for i in range(n - 1):
            m = sim3.Sim3(jnp.asarray(rel_true[i][:3, :3]),
                          jnp.asarray(rel_true[i][:3, 3]), jnp.asarray(0.95))
            meas.append(m)
            cur = sim3.compose(m, cur)
            nodes_list.append(cur)
        while len(nodes_list) < K:
            nodes_list.append(make_sim3(np.eye(3), np.zeros(3), 1.0))
        nodes = stack_sim3(nodes_list)

        E = 16
        ei = np.zeros(E, np.int32); ej = np.zeros(E, np.int32); ev = np.zeros(E, bool)
        for i in range(n - 1):
            ei[i], ej[i], ev[i] = i, i + 1, True
        loop_rel = gt[0] @ np.linalg.inv(gt[n - 1])
        ei[n - 1], ej[n - 1], ev[n - 1] = n - 1, 0, True
        meas.append(make_sim3(loop_rel[:3, :3], loop_rel[:3, 3], 1.0))
        while len(meas) < E:
            meas.append(make_sim3(np.eye(3), np.zeros(3), 1.0))

        prob = pose_graph.PoseGraphProblem(
            nodes=nodes,
            node_valid=jnp.asarray(np.arange(K) < n),
            node_fixed=jnp.asarray(np.arange(K) == 0),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            edge_meas=stack_sim3(meas), edge_valid=jnp.asarray(ev))
        out = pose_graph.optimize_pose_graph(prob, n_iters=25)
        # the loop junction's scale inconsistency (s_0/s_{n-1} = 1/0.63 before)
        # must collapse: least squares spreads it over all n edges
        junction_before = abs(np.log(float(nodes.s[0]) / float(nodes.s[n - 1])))
        junction_after = abs(np.log(float(out.s[0]) / float(out.s[n - 1])))
        assert junction_before > 0.4
        assert junction_after < 0.5 * junction_before, (junction_before, junction_after)
        # scales end up geometrically interpolated, all within the drift band
        s_all = np.asarray(out.s[:n])
        assert (s_all > 0.9).all() and (s_all <= 1.05).all()
