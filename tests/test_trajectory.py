"""Trajectory export fidelity under keyframe culling (VERDICT r1 gap 4).

The reference walks the bad-reference-KF chain with the stored mTcp when
exporting (`System::SaveTrajectoryTUM`, src/System.cc:431-505, chain at
:476); here the same re-basing happens eagerly at cull time
(SlamSystem._rehome_trajectory), so an entry whose reference keyframe was
culled keeps exporting the correct pose AND keeps following later
pose-graph/GBA corrections of the surviving ancestor.
"""
import numpy as np
import jax.numpy as jnp

from orb_slam2_tpu.mapstate import map as mapstate
from orb_slam2_tpu.pipeline.system import SlamSystem, TrajectoryEntry
from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD

K, P, N = 8, 128, 32


def make_system():
    cfg = SlamConfig(fx=300.0, fy=300.0, cx=160.0, cy=120.0, width=320,
                     height=240, n_features=N, max_keypoints=N,
                     sensor=SENSOR_RGBD, bf=30.0, max_keyframes=K,
                     max_map_points=P)
    return SlamSystem(cfg, enable_loop_closing=False)


def pose_x(tx):
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = tx
    return T


def test_culled_reference_chain_rebased():
    s = make_system()
    m = mapstate.empty(K, P, N)
    # chain: kf0 (root) <- kf1 <- kf2, distinct poses
    poses = [pose_x(0.0), pose_x(1.0), pose_x(2.5)]
    for i, T in enumerate(poses):
        m, k = mapstate.add_keyframe(
            m, jnp.asarray(T), jnp.zeros((N, 2)), jnp.zeros(N, jnp.int32),
            jnp.zeros(N), jnp.zeros((N, 8), jnp.uint32), jnp.full(N, -1.0),
            jnp.full(N, -1.0), jnp.zeros(N, bool), jnp.full(N, -1, jnp.int32),
            i, float(i))
    m = m._replace(parent=m.parent.at[1].set(0).at[2].set(1))
    s.m = m

    # a tracked frame referenced kf2 at track time
    Tcw_frame = pose_x(3.0)
    T_rel = Tcw_frame @ np.linalg.inv(poses[2])
    s.trajectory.append(TrajectoryEntry(0.1, T_rel, 2, False))

    # cull kf1 AND kf2 in one batch (the walk must skip the dead parent)
    culled = np.zeros(K, bool)
    culled[1] = culled[2] = True
    s.m = s.m._replace(kf_valid=s.m.kf_valid & ~jnp.asarray(culled))
    s._rehome_trajectory(culled)

    e = s.trajectory[0]
    assert e.ref_kf == 0
    got = [T for _, T in s.get_trajectory()]
    np.testing.assert_allclose(got[0], np.linalg.inv(Tcw_frame),
                               rtol=1e-5, atol=1e-5)

    # a later "GBA" moves the surviving ancestor: the exported frame pose
    # must follow the correction (this is the whole point of T_rel storage)
    corr = pose_x(-0.5)
    s.m = s.m._replace(kf_pose=s.m.kf_pose.at[0].set(
        jnp.asarray(corr @ poses[0])))
    got2 = [T for _, T in s.get_trajectory()]
    np.testing.assert_allclose(got2[0], np.linalg.inv(Tcw_frame @ corr),
                               rtol=1e-5, atol=1e-5)


def test_reset_clears_trajectory():
    s = make_system()
    s.trajectory.append(TrajectoryEntry(0.0, np.eye(4), 0, False))
    s.reset()
    assert s.trajectory == []
    assert s.get_trajectory() == []
