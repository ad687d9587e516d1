"""Deterministic loop-closing tests on a hand-built drifted map."""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_tpu.geometry import se3, sim3
from orb_slam2_tpu.mapstate import map as mapstate
from orb_slam2_tpu.pipeline import loop_closing
from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD
from orb_slam2_tpu.bow import database as db_mod

K, P, N = 16, 512, 64
FX = 300.0


def cfg():
    return SlamConfig(fx=FX, fy=FX, cx=160.0, cy=120.0, width=320, height=240,
                      n_features=N, max_keypoints=N, sensor=SENSOR_RGBD,
                      bf=FX * 0.1, max_keyframes=K, max_map_points=P,
                      min_covis_weight=5)


def project(Xc):
    return np.stack([FX * Xc[:, 0] / Xc[:, 2] + 160.0,
                     FX * Xc[:, 1] / Xc[:, 2] + 120.0], -1).astype(np.float32)


def build_drifted_map(rng, drift_t=np.array([0.4, 0.0, 0.1])):
    """Two keyframes at (nearly) the same viewpoint observing the same
    surface, but KF1 drifted: its pose and its COPY of the landmarks carry
    the drift. Shared descriptors make them matchable."""
    c = cfg()
    m = mapstate.empty(K, P, N)
    Xw = np.stack([rng.uniform(-1.5, 1.5, N), rng.uniform(-1.0, 1.0, N),
                   rng.uniform(3.0, 5.0, N)], -1).astype(np.float32)
    desc = rng.integers(0, 2**32, size=(N, 8), dtype=np.uint32)

    T0 = np.eye(4, dtype=np.float32)
    uv0 = project(Xw)
    in_img = (uv0[:, 0] > 10) & (uv0[:, 0] < 310) & (uv0[:, 1] > 10) & (uv0[:, 1] < 230)

    def add_kf(m, Tcw, uv, valid, frame_id):
        return mapstate.add_keyframe(
            m, jnp.asarray(Tcw), jnp.asarray(uv),
            jnp.zeros(N, jnp.int32), jnp.zeros(N, jnp.float32),
            jnp.asarray(desc), jnp.full(N, -1.0), jnp.full(N, -1.0),
            jnp.asarray(valid), jnp.full(N, -1, jnp.int32), frame_id, 0.0)

    # KF0 (true) + its points
    m, kf0 = add_kf(m, T0, uv0, in_img, 0)
    slots0 = mapstate.allocate_points(m, jnp.asarray(in_img))
    m = mapstate.add_points(m, slots0, jnp.asarray(Xw), jnp.asarray(desc), kf0, 0)
    m = mapstate.bind_observations(m, kf0, jnp.arange(N), slots0, jnp.asarray(in_img) & (slots0 >= 0))

    # KF1 (drifted duplicate): true pose == T0, recorded pose = drift * T0,
    # and its OWN copies of the landmarks, drifted consistently so that
    # reprojection is self-consistent.
    T_drift = np.eye(4, dtype=np.float32)
    T_drift[:3, 3] = drift_t
    T1 = T0 @ np.linalg.inv(T_drift)     # Tcw' : world' = drift(world)
    Xw1 = Xw + drift_t                   # drifted copies
    m, kf1 = add_kf(m, T1.astype(np.float32), uv0, in_img, 10)
    slots1 = mapstate.allocate_points(m, jnp.asarray(in_img))
    m = mapstate.add_points(m, slots1, jnp.asarray(Xw1.astype(np.float32)),
                            jnp.asarray(desc), kf1, 1)
    m = mapstate.bind_observations(m, kf1, jnp.arange(N), slots1, jnp.asarray(in_img) & (slots1 >= 0))

    m = mapstate.update_connections(m, kf0)
    m = mapstate.update_connections(m, kf1)
    m = mapstate.update_point_normals(m, jnp.ones(P, bool), c.scale_factors)
    return c, m, int(kf0), int(kf1), Xw, drift_t


class TestComputeSim3:
    def test_recovers_drift(self, rng):
        c, m, kf0, kf1, Xw, drift_t = build_drifted_map(rng)
        ok, Scm, n_inl = loop_closing.compute_sim3(c, m, kf1, kf0)
        assert ok
        assert n_inl > 40
        # Scm maps candidate(kf0)-camera points into current(kf1)-camera.
        # Both cameras see the same pixels, so Scm should be ~identity.
        np.testing.assert_allclose(np.asarray(Scm.R), np.eye(3), atol=5e-3)
        np.testing.assert_allclose(np.asarray(Scm.t), 0.0, atol=2e-2)
        assert abs(float(Scm.s) - 1.0) < 5e-3


class TestCorrectLoop:
    def test_poses_merge_after_correction(self, rng):
        c, m, kf0, kf1, Xw, drift_t = build_drifted_map(rng)
        ok, Scm, _ = loop_closing.compute_sim3(c, m, kf1, kf0)
        assert ok
        m2 = loop_closing.correct_loop(c, m, kf1, kf0, Scm)
        # after correction, kf1's pose should agree with kf0's frame: the
        # camera centers of both keyframes coincide in reality
        P0 = np.asarray(m2.kf_pose[kf0])
        P1 = np.asarray(m2.kf_pose[kf1])
        c0 = -P0[:3, :3].T @ P0[:3, 3]
        c1 = -P1[:3, :3].T @ P1[:3, 3]
        dist_before = np.linalg.norm(drift_t)
        dist_after = np.linalg.norm(c0 - c1)
        assert dist_after < 0.35 * dist_before, (dist_before, dist_after)


class TestDetectCandidates:
    def test_consistency_gate(self, rng):
        """detect_loop requires cfg.covis_consistency_th consecutive
        detections sharing a group member."""
        c, m, kf0, kf1, Xw, drift_t = build_drifted_map(rng)
        # add kf2 sharing kf1's points -> covisibility neighbor for minScore
        slots1 = m.kf_obs[kf1]
        desc2 = m.kf_desc[kf1]
        m, kf2 = mapstate.add_keyframe(
            m, m.kf_pose[kf1], m.kf_xy[kf1], m.kf_level[kf1], m.kf_angle[kf1],
            desc2, m.kf_ur[kf1], m.kf_depth[kf1], m.kf_feat_valid[kf1],
            slots1, 11, 0.0)
        m = mapstate.update_connections(m, kf2)
        m = mapstate.update_connections(m, kf1)
        assert int(m.covis[kf1, kf2]) > c.min_covis_weight

        c2 = SlamConfig(**{**c.__dict__, "covis_consistency_th": 2,
                           "loop_kf_gap": 0, "max_keypoints": N})
        db = db_mod.BowDatabase.empty(K, 32)
        ws = np.full(32, np.iinfo(np.int32).max, np.int32); ws[:8] = np.arange(8)
        wv = np.zeros(32, np.float32); wv[:8] = 1 / 8
        v0 = (jnp.asarray(ws), jnp.asarray(wv))
        db = db.add(kf0, v0)
        state = loop_closing.LoopState()
        # consistency 0 < th=2 on first sight, 1 on second, accepted on third
        assert loop_closing.detect_loop(c2, m, db, v0, kf1, state, 20) == []
        assert loop_closing.detect_loop(c2, m, db, v0, kf1, state, 21) == []
        got = loop_closing.detect_loop(c2, m, db, v0, kf1, state, 22)
        assert got == [kf0]


class TestDeferredGBA:
    def test_correction_without_gba_still_merges(self, rng):
        """cfg.gba_async_chunks amortizes the loop GBA over later keyframes
        (P5); the correction itself (Sim3 propagation + essential graph) must
        already merge the drifted poses so tracking can continue while the
        chunks run."""
        c, m, kf0, kf1, Xw, drift_t = build_drifted_map(rng)
        ok, Scm, _ = loop_closing.compute_sim3(c, m, kf1, kf0)
        assert ok
        m2 = loop_closing.correct_loop(c, m, kf1, kf0, Scm, run_gba=False)
        P0 = np.asarray(m2.kf_pose[kf0])
        P1 = np.asarray(m2.kf_pose[kf1])
        c0 = -P0[:3, :3].T @ P0[:3, 3]
        c1 = -P1[:3, :3].T @ P1[:3, 3]
        assert np.linalg.norm(c0 - c1) < 0.5 * np.linalg.norm(drift_t)
        # and the deferred full GBA still runs standalone on the result
        m3 = loop_closing.run_global_ba(c, m2, n_iters=3)
        assert np.isfinite(np.asarray(m3.kf_pose)).all()


class TestLoopEdgePersistence:
    """VERDICT r1 gap 3: loop edges must outlive the closure that made them
    (`KeyFrame::mspLoopEdges`, src/KeyFrame.cc:591-649;
    src/Optimizer.cc:1248-1283)."""

    def test_edge_recorded_and_fed_to_later_solves(self, rng):
        c, m, kf0, kf1, Xw, drift_t = build_drifted_map(rng)
        ok, Scm, _ = loop_closing.compute_sim3(c, m, kf1, kf0)
        assert ok
        m2 = loop_closing.correct_loop(c, m, kf1, kf0, Scm)
        le = np.asarray(m2.loop_edges)
        assert (le[0] == [kf1, kf0]).all(), le[0]
        # both endpoints are protected from keyframe culling
        prot = np.asarray(mapstate.loop_protected_keyframes(m2))
        assert prot[kf0] and prot[kf1]
        # a LATER essential-graph build (different trigger pair) still
        # carries the persisted edge
        edges = loop_closing.build_essential_edges(c, m2, kf0, kf1)
        keys = {(min(e), max(e)) for e in edges}
        assert (min(kf0, kf1), max(kf0, kf1)) in keys

    def test_loop_kf_survives_redundancy_culling(self, rng):
        """Four identical-view keyframes make each other redundant; the one
        holding a loop edge must survive cull_keyframes."""
        from orb_slam2_tpu.pipeline import mapping_ops

        c = cfg()
        m = mapstate.empty(K, P, N)
        Xw = np.stack([rng.uniform(-1.5, 1.5, N), rng.uniform(-1.0, 1.0, N),
                       rng.uniform(3.0, 5.0, N)], -1).astype(np.float32)
        desc = rng.integers(0, 2**32, size=(N, 8), dtype=np.uint32)
        uv = project(Xw)
        in_img = (uv[:, 0] > 10) & (uv[:, 0] < 310) & \
                 (uv[:, 1] > 10) & (uv[:, 1] < 230)
        kfs = []
        slots = None
        for fid in range(5):
            m, k = mapstate.add_keyframe(
                m, jnp.eye(4), jnp.asarray(uv), jnp.zeros(N, jnp.int32),
                jnp.zeros(N, jnp.float32), jnp.asarray(desc),
                jnp.full(N, -1.0), jnp.full(N, -1.0), jnp.asarray(in_img),
                jnp.full(N, -1, jnp.int32), fid, 0.0)
            kfs.append(int(k))
            if slots is None:
                slots = mapstate.allocate_points(m, jnp.asarray(in_img))
                m = mapstate.add_points(m, slots, jnp.asarray(Xw),
                                        jnp.asarray(desc), k, 0)
            m = mapstate.bind_observations(
                m, k, jnp.arange(N), slots, jnp.asarray(in_img) & (slots >= 0))
            m = mapstate.update_connections(m, k)
        # kf1 holds a loop edge; kf2/kf3 are plain redundant keyframes
        m = mapstate.add_loop_edge(m, kfs[1], kfs[4])
        m2, culled = mapping_ops.cull_keyframes(c, m, jnp.asarray(kfs[4]))
        culled = np.asarray(culled)
        assert not culled[kfs[1]], "loop-edge keyframe was culled"
        assert not culled[kfs[4]]
        assert culled[kfs[2]] or culled[kfs[3]], \
            "redundancy culling should still fire on unprotected keyframes"
