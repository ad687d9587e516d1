import numpy as np
import jax.numpy as jnp

from orb_slam2_tpu.ops import matching, stereo, extractor
from orb_slam2_tpu.utils.config import SlamConfig

import oracle


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


class TestHamming:
    def test_matches_oracle(self, rng):
        a = rand_desc(rng, 16)
        b = rand_desc(rng, 12)
        d = np.asarray(matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        for i in range(16):
            for j in range(12):
                assert d[i, j] == oracle.hamming(a[i], b[j])

    def test_self_distance_zero(self, rng):
        a = rand_desc(rng, 8)
        d = np.asarray(matching.hamming_matrix(jnp.asarray(a), jnp.asarray(a)))
        assert (np.diag(d) == 0).all()


class TestSearchInit:
    def test_shifted_copy_matches(self, rng):
        n = 64
        xy1 = rng.uniform(50, 400, size=(n, 2)).astype(np.float32)
        xy2 = xy1 + np.array([3.0, -2.0], dtype=np.float32)
        desc = rand_desc(rng, n)
        lvl = np.zeros(n, dtype=np.int32)
        val = np.ones(n, dtype=bool)
        ang = rng.uniform(0, 360, n).astype(np.float32)
        m = matching.search_for_initialization(
            jnp.asarray(xy1), jnp.asarray(lvl), jnp.asarray(desc), jnp.asarray(val), jnp.asarray(ang),
            jnp.asarray(xy2), jnp.asarray(lvl), jnp.asarray(desc), jnp.asarray(val), jnp.asarray(ang),
        )
        valid = np.asarray(m.valid)
        idx = np.asarray(m.idx)
        assert valid.sum() >= n - 2  # random desc collisions possible but rare
        assert (idx[valid] == np.nonzero(valid)[0]).all()

    def test_window_excludes_far(self, rng):
        xy1 = np.array([[100.0, 100.0]], dtype=np.float32)
        xy2 = np.array([[350.0, 100.0]], dtype=np.float32)  # 250px away > 100 window
        desc = rand_desc(rng, 1)
        one = np.ones(1, bool)
        zero_l = np.zeros(1, np.int32)
        ang = np.zeros(1, np.float32)
        m = matching.search_for_initialization(
            jnp.asarray(xy1), jnp.asarray(zero_l), jnp.asarray(desc), jnp.asarray(one), jnp.asarray(ang),
            jnp.asarray(xy2), jnp.asarray(zero_l), jnp.asarray(desc), jnp.asarray(one), jnp.asarray(ang),
        )
        assert not bool(m.valid[0])


class TestRotationConsistency:
    def test_dominant_rotation_kept(self, rng):
        n = 100
        ang_dst = rng.uniform(0, 360, n).astype(np.float32)
        # consistent 25 deg rotation (off a histogram bin boundary; 30 deg sits
        # exactly on the round() boundary between bins 2 and 3)
        ang_src = (ang_dst + 25.0) % 360
        # 10 outliers with random rotation
        ang_src[:10] = rng.uniform(0, 360, 10)
        best_idx = jnp.arange(n)
        mask = jnp.ones(n, bool)
        keep = np.asarray(matching.rotation_consistency(
            jnp.asarray(ang_src), jnp.asarray(ang_dst), mask, best_idx))
        assert keep[10:].all()
        assert keep[:10].sum() <= 4


class TestConflictResolution:
    def test_lowest_distance_wins(self):
        best_idx = jnp.asarray(np.array([5, 5, 3], dtype=np.int32))
        best_dist = jnp.asarray(np.array([40, 20, 10], dtype=np.int32))
        accept = jnp.ones(3, bool)
        keep = np.asarray(matching.resolve_conflicts(best_idx, best_dist, accept, 8))
        assert list(keep) == [False, True, True]


class TestProjectionSearch:
    def test_points_match_keypoints(self, rng):
        p = 32
        n = 64
        kp_xy = rng.uniform(30, 450, size=(n, 2)).astype(np.float32)
        kp_desc = rand_desc(rng, n)
        kp_lvl = rng.integers(0, 3, n).astype(np.int32)
        kp_val = np.ones(n, bool)
        neg = -np.ones(n, np.float32)
        # project points exactly onto the first p keypoints
        uv = kp_xy[:p] + rng.normal(0, 0.5, size=(p, 2)).astype(np.float32)
        m = matching.search_by_projection_points(
            jnp.asarray(uv), jnp.asarray(kp_lvl[:p]), jnp.asarray(np.ones(p, np.float32)),
            jnp.asarray(kp_desc[:p]), jnp.asarray(np.ones(p, bool)), jnp.asarray(neg[:p]),
            jnp.asarray(kp_xy), jnp.asarray(kp_lvl), jnp.asarray(kp_desc), jnp.asarray(kp_val),
            jnp.asarray(neg), [1.2 ** i for i in range(8)], th=3.0)
        valid = np.asarray(m.valid)
        idx = np.asarray(m.idx)
        assert valid.sum() >= p - 2
        assert (idx[valid] == np.nonzero(valid)[0][: valid.sum()]).all()


class TestStereo:
    def test_constant_disparity_plane(self, rng):
        h, w = 240, 320
        disp_true = 13.0
        # blobby texture: strong repeatable corners. Integer disparity so both
        # views have identical pixel phase — keypoint *selection* (like the
        # reference's quadtree) is not phase-repeatable on synthetic scenes of
        # identical-contrast corners, which is a scene property, not a matcher
        # property; sub-pixel refinement is covered by the parabola test below.
        base = rng.uniform(0, 40, size=(h, w + 64)).astype(np.float32)
        for _ in range(120):
            y, x = rng.integers(10, h - 14), rng.integers(10, w + 40)
            s = rng.integers(5, 12)
            base[y : y + s, x : x + s] += rng.uniform(80, 200)
        base = np.clip(base, 0, 255)
        left = base[:, :w].copy()
        right = base[:, 13 : 13 + w].copy()  # uR = uL - 13

        cfg = SlamConfig(n_features=300, width=w, height=h, n_levels=4)
        kl = extractor.extract(jnp.asarray(left), cfg)
        kr = extractor.extract(jnp.asarray(right), cfg)
        from orb_slam2_tpu.ops.extractor import build_pyramid
        pyl = build_pyramid(jnp.asarray(left), cfg)
        pyr = build_pyramid(jnp.asarray(right), cfg)
        bf = 40.0
        ur, depth = stereo.compute_stereo_matches(
            kl.xy, kl.level, kl.desc, kl.valid,
            kr.xy, kr.level, kr.desc, kr.valid,
            pyl, pyr, cfg.scale_factors, bf, max_disparity=100.0)
        ur = np.asarray(ur)
        xy = np.asarray(kl.xy)
        ok = ur >= 0
        assert ok.sum() > 30
        disp = xy[ok, 0] - ur[ok]
        err = np.abs(disp - disp_true)
        # majority of matches within a pixel of the true disparity
        assert np.median(err) < 0.5, np.median(err)
        d = np.asarray(depth)[ok]
        np.testing.assert_allclose(d, bf / disp, rtol=1e-5)

    def test_subpixel_parabola(self):
        # the parabola fit recovers the vertex of SAD samples exactly
        d1, d2, d3 = 4.0, 1.0, 2.0  # min between samples, closer to center
        delta = (d1 - d3) / (2.0 * (d1 + d3 - 2.0 * d2))
        assert abs(delta - 0.25) < 1e-9

    def test_rgbd(self, rng):
        depth_img = rng.uniform(1.0, 5.0, size=(48, 64)).astype(np.float32)
        depth_img[10, :] = 0.0  # invalid row
        xy = np.array([[5.2, 7.8], [3.0, 10.0]], dtype=np.float32)
        ur, d = stereo.stereo_from_rgbd(
            jnp.asarray(xy), jnp.asarray(xy), jnp.ones(2, bool), jnp.asarray(depth_img), bf=40.0)
        assert float(d[0]) == depth_img[8, 5]
        assert float(d[1]) == -1.0  # row 10 invalid
        assert abs(float(ur[0]) - (5.2 - 40.0 / depth_img[8, 5])) < 1e-5
