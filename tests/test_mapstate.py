import numpy as np
import jax.numpy as jnp

from orb_slam2_tpu.mapstate import map as mapstate
from orb_slam2_tpu.geometry import se3

K, P, N = 8, 64, 32
SCALE_FACTORS = [1.2 ** i for i in range(8)]


def blank_frame(rng, n_feat=N):
    return dict(
        xy=rng.uniform(0, 640, size=(n_feat, 2)).astype(np.float32),
        level=rng.integers(0, 8, n_feat).astype(np.int32),
        angle=rng.uniform(0, 360, n_feat).astype(np.float32),
        desc=rng.integers(0, 2**32, size=(n_feat, 8), dtype=np.uint32),
        ur=-np.ones(n_feat, np.float32),
        depth=-np.ones(n_feat, np.float32),
        feat_valid=np.ones(n_feat, bool),
    )


def add_kf(m, rng, pose=None, obs=None, frame_id=0):
    f = blank_frame(rng)
    if pose is None:
        pose = np.eye(4, dtype=np.float32)
    if obs is None:
        obs = np.full(N, -1, np.int32)
    return mapstate.add_keyframe(
        m, jnp.asarray(pose), jnp.asarray(f["xy"]), jnp.asarray(f["level"]),
        jnp.asarray(f["angle"]), jnp.asarray(f["desc"]), jnp.asarray(f["ur"]),
        jnp.asarray(f["depth"]), jnp.asarray(f["feat_valid"]), jnp.asarray(obs),
        frame_id, 0.0)


class TestMapState:
    def test_add_keyframe(self, rng):
        m = mapstate.empty(K, P, N)
        m, k0 = add_kf(m, rng, frame_id=0)
        m, k1 = add_kf(m, rng, frame_id=1)
        assert int(m.n_keyframes) == 2
        assert int(k0) == 0 and int(k1) == 1

    def test_point_allocation_and_binding(self, rng):
        m = mapstate.empty(K, P, N)
        m, k0 = add_kf(m, rng)
        want = np.zeros(16, bool)
        want[:10] = True
        slots = mapstate.allocate_points(m, jnp.asarray(want))
        s = np.asarray(slots)
        assert (s[:10] >= 0).all() and (s[10:] == -1).all()
        assert len(np.unique(s[:10])) == 10
        pos = rng.normal(size=(16, 3)).astype(np.float32)
        desc = rng.integers(0, 2**32, size=(16, 8), dtype=np.uint32)
        m = mapstate.add_points(m, slots, jnp.asarray(pos), jnp.asarray(desc), k0, k0)
        assert int(m.n_points) == 10
        # bind first 10 features of kf0 to these points
        m = mapstate.bind_observations(
            m, k0, jnp.arange(16), slots, jnp.asarray(want))
        obs = np.asarray(m.kf_obs[0])
        assert (obs[:10] == s[:10]).all()
        assert (obs[10:] == -1).all()

    def test_covisibility(self, rng):
        m = mapstate.empty(K, P, N)
        m, k0 = add_kf(m, rng, frame_id=0)
        m, k1 = add_kf(m, rng, frame_id=1)
        m, k2 = add_kf(m, rng, frame_id=2)
        want = np.zeros(20, bool); want[:20] = True
        slots = mapstate.allocate_points(m, jnp.asarray(want))
        pos = rng.normal(size=(20, 3)).astype(np.float32)
        desc = rng.integers(0, 2**32, size=(20, 8), dtype=np.uint32)
        m = mapstate.add_points(m, slots, jnp.asarray(pos), jnp.asarray(desc), k0, k0)
        # kf0 sees pts 0..19, kf1 sees 0..11, kf2 sees 8..19
        m = mapstate.bind_observations(m, k0, jnp.arange(20), slots, jnp.ones(20, bool))
        m = mapstate.bind_observations(m, k1, jnp.arange(20), slots, jnp.asarray(np.arange(20) < 12))
        m = mapstate.bind_observations(m, k2, jnp.arange(20), slots, jnp.asarray(np.arange(20) >= 8))
        m = mapstate.update_connections(m, k1)
        m = mapstate.update_connections(m, k2)
        covis = np.asarray(m.covis)
        assert covis[1, 0] == 12 and covis[0, 1] == 12
        assert covis[2, 0] == 12
        assert covis[2, 1] == 4  # overlap 8..11
        # spanning parents: k1 -> k0 (best earlier), k2 -> k0
        assert int(m.parent[1]) == 0
        assert int(m.parent[2]) == 0
        ids, w = mapstate.covisible_keyframes(m, 2, 4)
        assert int(ids[0]) == 0 and int(w[0]) == 12

    def test_point_observations_roundtrip(self, rng):
        m = mapstate.empty(K, P, N)
        m, k0 = add_kf(m, rng, frame_id=0)
        m, k1 = add_kf(m, rng, frame_id=1)
        want = np.ones(5, bool)
        slots = mapstate.allocate_points(m, jnp.asarray(want))
        pos = rng.normal(size=(5, 3)).astype(np.float32)
        desc = rng.integers(0, 2**32, size=(5, 8), dtype=np.uint32)
        m = mapstate.add_points(m, slots, jnp.asarray(pos), jnp.asarray(desc), k0, k0)
        m = mapstate.bind_observations(m, k0, jnp.asarray([3, 4, 5, 6, 7]), slots, jnp.ones(5, bool))
        m = mapstate.bind_observations(m, k1, jnp.asarray([10, 11]), slots[:2], jnp.ones(2, bool))
        obs_kf, obs_ft, ok = mapstate.point_observations(m, max_obs=4)
        s = np.asarray(slots)
        okf, oft, ook = np.asarray(obs_kf), np.asarray(obs_ft), np.asarray(ok)
        # point s[0] observed by kf0 feat3 and kf1 feat10
        assert set(map(tuple, np.stack([okf[s[0]][ook[s[0]]], oft[s[0]][ook[s[0]]]], -1))) == {(0, 3), (1, 10)}
        assert set(map(tuple, np.stack([okf[s[2]][ook[s[2]]], oft[s[2]][ook[s[2]]]], -1))) == {(0, 5)}
        cnt = np.asarray(mapstate.count_observations(m))
        assert cnt[s[0]] == 2 and cnt[s[2]] == 1

    def test_erase_points(self, rng):
        m = mapstate.empty(K, P, N)
        m, k0 = add_kf(m, rng)
        slots = mapstate.allocate_points(m, jnp.ones(4, dtype=bool))
        pos = rng.normal(size=(4, 3)).astype(np.float32)
        desc = rng.integers(0, 2**32, size=(4, 8), dtype=np.uint32)
        m = mapstate.add_points(m, slots, jnp.asarray(pos), jnp.asarray(desc), k0, k0)
        m = mapstate.bind_observations(m, k0, jnp.arange(4), slots, jnp.ones(4, bool))
        kill = np.zeros(P, bool)
        kill[np.asarray(slots)[1]] = True
        m = mapstate.erase_points(m, jnp.asarray(kill))
        assert int(m.n_points) == 3
        assert int(m.kf_obs[0, 1]) == -1
        assert int(m.kf_obs[0, 0]) >= 0

    def test_replace_points(self, rng):
        m = mapstate.empty(K, P, N)
        m, k0 = add_kf(m, rng, frame_id=0)
        m, k1 = add_kf(m, rng, frame_id=1)
        slots = mapstate.allocate_points(m, jnp.ones(2, dtype=bool))
        pos = rng.normal(size=(2, 3)).astype(np.float32)
        desc = rng.integers(0, 2**32, size=(2, 8), dtype=np.uint32)
        m = mapstate.add_points(m, slots, jnp.asarray(pos), jnp.asarray(desc), k0, k0)
        s = np.asarray(slots)
        # kf0 observes both points at feats 0,1 ; kf1 observes point0 at feat 5
        m = mapstate.bind_observations(m, k0, jnp.arange(2), slots, jnp.ones(2, bool))
        m = mapstate.bind_observations(m, k1, jnp.asarray([5]), slots[:1], jnp.ones(1, bool))
        # replace point s[1] by s[0]
        mapping = np.arange(P, dtype=np.int32)
        mapping[s[1]] = s[0]
        m = mapstate.replace_points(m, jnp.asarray(mapping))
        assert not bool(m.pt_valid[s[1]])
        obs0 = np.asarray(m.kf_obs[0])
        # kf0 saw both -> now sees s[0] once (duplicate cleared)
        assert (obs0 == s[0]).sum() == 1
        assert int(m.kf_obs[1, 5]) == s[0]

    def test_replace_forwarding_chain(self, rng):
        """CheckReplacedInLastFrame parity (src/Tracking.cc:1135-1163): ids
        handed out before a fusion pass must resolve to the survivor through
        pt_forward, including across chained replacements; reallocating a
        freed slot resets its redirect."""
        m = mapstate.empty(K, P, N)
        m, k0 = add_kf(m, rng, frame_id=0)
        slots = mapstate.allocate_points(m, jnp.ones(3, dtype=bool))
        pos = rng.normal(size=(3, 3)).astype(np.float32)
        desc = rng.integers(0, 2**32, size=(3, 8), dtype=np.uint32)
        m = mapstate.add_points(m, slots, jnp.asarray(pos), jnp.asarray(desc),
                                k0, k0)
        s = np.asarray(slots)
        # replace s1 -> s0
        mapping = np.arange(P, dtype=np.int32)
        mapping[s[1]] = s[0]
        m = mapstate.replace_points(m, jnp.asarray(mapping))
        assert int(m.pt_forward[s[1]]) == s[0]
        # then s0 -> s2: an old binding to s1 must now resolve to s2
        mapping = np.arange(P, dtype=np.int32)
        mapping[s[0]] = s[2]
        m = mapstate.replace_points(m, jnp.asarray(mapping))
        assert int(m.pt_forward[s[1]]) == s[2]
        assert int(m.pt_forward[s[0]]) == s[2]
        # reallocate: the freed slot s[0] comes back as a fresh point with an
        # identity redirect
        slots2 = mapstate.allocate_points(m, jnp.ones(1, dtype=bool))
        m = mapstate.add_points(m, slots2, jnp.asarray(pos[:1]),
                                jnp.asarray(desc[:1]), k0, k0)
        s2 = int(np.asarray(slots2)[0])
        assert int(m.pt_forward[s2]) == s2

    def test_insert_keyframe_resolves_stale_bindings(self, rng):
        """A pipelined frame's matched ids may reference points fused away by
        the time its keyframe is inserted: insert_keyframe must bind the
        survivor and drop culled ids."""
        from orb_slam2_tpu.pipeline import mapping_ops
        from orb_slam2_tpu.pipeline.frame import FrameData
        from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD

        cfg = SlamConfig(fx=100.0, fy=100.0, cx=160.0, cy=120.0, width=320,
                         height=240, n_features=N, bf=25.0,
                         sensor=SENSOR_RGBD, th_depth=40.0, max_keyframes=K,
                         max_map_points=P)
        m = mapstate.empty(K, P, N)
        m, k0 = add_kf(m, rng, frame_id=0)
        slots = mapstate.allocate_points(m, jnp.ones(3, dtype=bool))
        pos = np.asarray([[0, 0, 5.0], [0.1, 0, 5.0], [0, 0.1, 5.0]],
                         np.float32)
        desc = rng.integers(0, 2**32, size=(3, 8), dtype=np.uint32)
        m = mapstate.add_points(m, slots, jnp.asarray(pos), jnp.asarray(desc),
                                k0, k0)
        s = np.asarray(slots)
        mapping = np.arange(P, dtype=np.int32)
        mapping[s[1]] = s[0]                      # fuse s1 into s0
        m = mapstate.replace_points(m, jnp.asarray(mapping))
        kill = np.zeros(P, bool)
        kill[s[2]] = True                         # cull s2
        m = mapstate.erase_points(m, jnp.asarray(kill))

        f = blank_frame(rng)
        fd = FrameData(xy=jnp.asarray(f["xy"]), xy_raw=jnp.asarray(f["xy"]),
                       level=jnp.asarray(f["level"]),
                       angle=jnp.asarray(f["angle"]),
                       response=jnp.zeros(N, jnp.float32),
                       desc=jnp.asarray(f["desc"]),
                       valid=jnp.asarray(f["feat_valid"]),
                       ur=jnp.asarray(f["ur"]), depth=jnp.asarray(f["depth"]))
        matched = np.full(N, -1, np.int32)
        matched[0] = s[1]                         # stale: replaced id
        matched[1] = s[2]                         # stale: culled id
        m2, kf_id = mapping_ops.insert_keyframe(
            cfg, m, fd, jnp.eye(4), jnp.asarray(matched), 1, 1.0)
        row = np.asarray(m2.kf_obs[int(kf_id)])
        assert row[0] == s[0], "replaced id must bind the survivor"
        assert row[1] == -1, "culled id must not resurrect"

    def test_update_descriptors_and_normals(self, rng):
        m = mapstate.empty(K, P, N)
        pose0 = np.eye(4, dtype=np.float32)
        pose1 = np.asarray(se3.exp(jnp.asarray([0.5, 0, 0, 0, 0, 0])))
        m, k0 = add_kf(m, rng, pose=pose0, frame_id=0)
        m, k1 = add_kf(m, rng, pose=pose1, frame_id=1)
        slots = mapstate.allocate_points(m, jnp.ones(3, dtype=bool))
        pos = np.array([[0, 0, 5], [1, 0, 6], [-1, 1, 7]], np.float32)
        desc = rng.integers(0, 2**32, size=(3, 8), dtype=np.uint32)
        m = mapstate.add_points(m, slots, jnp.asarray(pos), jnp.asarray(desc), k0, k0)
        m = mapstate.bind_observations(m, k0, jnp.arange(3), slots, jnp.ones(3, bool))
        m = mapstate.bind_observations(m, k1, jnp.arange(3), slots, jnp.ones(3, bool))
        mask = np.zeros(P, bool)
        mask[np.asarray(slots)] = True
        m = mapstate.update_point_descriptors(m, jnp.asarray(mask))
        m = mapstate.update_point_normals(m, jnp.asarray(mask), SCALE_FACTORS)
        s = np.asarray(slots)
        # descriptor is one of the observing descs
        d = np.asarray(m.pt_desc[s[0]])
        obs_descs = [np.asarray(m.kf_desc[0, 0]), np.asarray(m.kf_desc[1, 0])]
        assert any((d == od).all() for od in obs_descs)
        # normal roughly towards -z viewing dir (cameras at origin & x=-0.5)
        nrm = np.asarray(m.pt_normal[s[0]])
        assert nrm[2] > 0.9
        assert float(m.pt_max_dist[s[0]]) > 0


class TestIncrementalTable:
    """The cached observation table is maintained IN PLACE through the
    keyframe event (insert appends, triangulation writes its two creating
    observations, BA revalidates erased rows, culling triggers the full
    rebuild) — round 5 removed the per-pass full rebuilds. The invariant:
    at pass exit the table rows equal a fresh point_observations build as
    SETS (left-packed, order-free), wherever the point has <= OBS_W
    observations."""

    def test_table_matches_rebuild_after_passes(self):
        import jax
        from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD
        from orb_slam2_tpu.utils.synthetic import (PlateWorld,
                                                   loop_trajectory)
        from orb_slam2_tpu.pipeline.system import SlamSystem

        fx = 260.0
        cfg = SlamConfig(fx=fx, fy=fx, cx=160.0, cy=120.0, width=320,
                         height=240, n_features=500, bf=fx * 0.25,
                         sensor=SENSOR_RGBD, fps=10.0, th_depth=40.0,
                         max_keyframes=64, max_map_points=1 << 14,
                         ba_local_cams=16, ba_fixed_cams=16,
                         ba_max_points=1 << 11, ba_max_obs=8,
                         max_local_keyframes=32, max_local_points=1 << 12)
        world = PlateWorld(fx, fx, 160.0, 120.0, 320, 240, z0=5.0)
        gt = loop_trajectory(40, radius=1.4)
        s = SlamSystem(cfg, enable_loop_closing=False)
        for i, T in enumerate(gt):
            img, d = world.render_with_depth(T)
            s.track_rgbd(img, d, i / cfg.fps)
        s.flush()
        m = s.m
        assert int(m.n_keyframes) >= 3

        ref_kf, ref_ft, ref_on = mapstate.point_observations(
            m, mapstate.OBS_W)
        got_kf = np.asarray(m.obs_kf)
        got_ft = np.asarray(m.obs_ft)
        ref_kf = np.asarray(ref_kf)
        ref_ft = np.asarray(ref_ft)
        kf_obs = np.asarray(m.kf_obs)
        valid_pts = np.nonzero(np.asarray(m.pt_valid))[0]

        # 1. no phantom entries: every table entry is backed by kf_obs
        for p in valid_pts:
            for k, f in zip(got_kf[p], got_ft[p]):
                if k >= 0:
                    assert kf_obs[k, f] == p, (p, k, f, kf_obs[k, f])

        # 2. left-packed: no valid entry right of an invalid one
        holes = (got_kf[:, 1:] >= 0) & (got_kf[:, :-1] < 0)
        assert not holes.any()

        # 3. the table tracks the rebuild closely. Divergence is allowed
        # ONLY in the direction the reference itself diverges: a KF can
        # transiently bind one point at two features (Replace + dangling
        # mvpMapPoints); after a BA erasure of the REGISTERED entry the
        # table — like the reference's observation map — does not
        # resurrect the dangling twin, while a fresh rebuild would. So:
        # no extra entries ever (checked in 1), and missing entries stay
        # a small minority of rows.
        n_mismatch = 0
        for p in valid_pts:
            ref_set = {(int(k), int(f))
                       for k, f in zip(ref_kf[p], ref_ft[p]) if k >= 0}
            got_set = {(int(k), int(f))
                       for k, f in zip(got_kf[p], got_ft[p]) if k >= 0}
            if len(ref_set) >= mapstate.OBS_W:
                continue
            if ref_set != got_set:
                assert got_set <= ref_set, (p, got_set - ref_set)
                n_mismatch += 1
        # ~10% of rows carry such an unregistered duplicate in practice
        # (the fusion redirect can re-bind a winner at a second feature of
        # a row, exactly like the reference's Replace when IsInKeyFrame is
        # stale); kf_obs stays authoritative for the consumers that care
        # (incidence counts, triangulation occupancy, matchers)
        assert n_mismatch <= 0.15 * len(valid_pts), \
            f"{n_mismatch}/{len(valid_pts)} rows miss dangling-dup entries"
