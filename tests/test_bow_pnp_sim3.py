import numpy as np
import jax.numpy as jnp

from orb_slam2_tpu.bow import vocabulary as vocab_mod
from orb_slam2_tpu.bow import database as db_mod
from orb_slam2_tpu.geometry import se3, sim3
from orb_slam2_tpu.solvers import pnp, sim3_solver

LEVEL_SIGMA2 = [1.2 ** (2 * i) for i in range(8)]


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def perturb_desc(rng, desc, n_bits):
    """Flip n_bits random bits per descriptor."""
    out = desc.copy()
    for i in range(len(out)):
        for b in rng.choice(256, n_bits, replace=False):
            out[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return out


class TestVocabulary:
    def test_transform_finds_nearest_word(self, rng):
        train = rand_desc(rng, 2000)
        voc = vocab_mod.build_vocabulary(train, k=5, depth=3)
        assert voc.n_words > 50
        q = train[:32]
        word, weight, node = vocab_mod.transform(voc, jnp.asarray(q), jnp.ones(32, bool))
        w = np.asarray(word)
        assert (w >= 0).all()
        # same descriptor -> same word; slightly perturbed -> usually same word
        q2 = perturb_desc(rng, q, 8)
        word2, _, _ = vocab_mod.transform(voc, jnp.asarray(q2), jnp.ones(32, bool))
        same = (np.asarray(word2) == w).mean()
        assert same > 0.5, same

    def test_bow_similarity_orders_frames(self, rng):
        train = rand_desc(rng, 3000)
        voc = vocab_mod.build_vocabulary(train, k=8, depth=4)
        a = train[:200]
        b = perturb_desc(rng, a, 12)       # same place, noisy
        c = rand_desc(rng, 200)            # different place
        vecs = []
        for d in (a, b, c):
            word, weight, _ = vocab_mod.transform(voc, jnp.asarray(d), jnp.ones(200, bool))
            vecs.append(vocab_mod.bow_vector(word, weight, voc.n_words))
        s_ab = float(vocab_mod.l1_score(vecs[0], vecs[1]))
        s_ac = float(vocab_mod.l1_score(vecs[0], vecs[2]))
        assert s_ab > 3 * s_ac, (s_ab, s_ac)

    def test_database_query(self, rng):
        train = rand_desc(rng, 3000)
        voc = vocab_mod.build_vocabulary(train, k=6, depth=3)
        db = db_mod.BowDatabase.empty(8, 150)
        frames = [rand_desc(rng, 150) for _ in range(4)]
        for i, d in enumerate(frames):
            word, weight, _ = vocab_mod.transform(voc, jnp.asarray(d), jnp.ones(150, bool))
            db = db.add(i, vocab_mod.bow_sparse(word, weight))
        # query with a noisy copy of frame 2
        q = perturb_desc(rng, frames[2], 10)
        word, weight, _ = vocab_mod.transform(voc, jnp.asarray(q), jnp.ones(150, bool))
        qv = vocab_mod.bow_sparse(word, weight)
        scores, shared = db_mod.query_scores(db, qv)
        assert int(np.argmax(np.asarray(scores)[:4])) == 2

    def test_bow_sparse_aggregates_and_normalizes(self):
        word = jnp.asarray([5, 3, 5, -1, 9, 3, 3], jnp.int32)
        weight = jnp.asarray([1.0, 2.0, 1.0, 7.0, 4.0, 1.0, 1.0], jnp.float32)
        ws, wt = vocab_mod.bow_sparse(word, weight)
        ws, wt = np.asarray(ws), np.asarray(wt)
        pad = np.iinfo(np.int32).max
        assert ws[:3].tolist() == [3, 5, 9] and (ws[3:] == pad).all()
        np.testing.assert_allclose(wt[:3], np.array([4, 2, 4]) / 10.0, rtol=1e-6)
        assert abs(wt.sum() - 1.0) < 1e-6

    def test_database_hosts_huge_vocab_word_ids(self, rng):
        # the sparse DB is vocabulary-size independent: word ids near 1M
        # (the real ORBvoc scale) cost no extra memory
        db = db_mod.BowDatabase.empty(4, 8)
        ids = np.sort(rng.choice(1_000_000, 8, replace=False)).astype(np.int32)
        w = np.full(8, 1 / 8, np.float32)
        db = db.add(0, (jnp.asarray(ids), jnp.asarray(w)))
        scores, shared = db_mod.query_scores(db, (jnp.asarray(ids), jnp.asarray(w)))
        assert abs(float(scores[0]) - 1.0) < 1e-6 and int(shared[0]) == 8

    def test_detect_reloc_candidates_group_best(self):
        # 3 KFs: 0 and 1 covisible (one group), 2 isolated with low overlap;
        # the group is returned through its best-scoring member (kf 1)
        K = 4
        db = db_mod.BowDatabase.empty(K, 8)
        def row(idlist, wt):
            ws = np.full(8, np.iinfo(np.int32).max, np.int32)
            wv = np.zeros(8, np.float32)
            ws[:len(idlist)] = idlist
            wv[:len(idlist)] = wt / len(idlist)
            return jnp.asarray(ws), jnp.asarray(wv)
        db = db.add(0, row([0, 1, 2, 3], 1.0))
        db = db.add(1, row([0, 1, 2, 3, 4, 5], 1.0))
        db = db.add(2, row([6, 7], 1.0))
        covis = np.zeros((K, K), np.int32)
        covis[0, 1] = covis[1, 0] = 50
        q = row([0, 1, 2, 3, 4, 5], 1.0)
        mask, acc, scores = db_mod.detect_reloc_candidates(
            db, q, jnp.asarray(covis))
        mask = np.asarray(mask)
        assert mask[1] and not mask[2] and not mask[3]


class TestPnP:
    def test_recovers_pose(self, rng):
        n = 120
        Xw = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                       rng.uniform(4, 10, n)], -1).astype(np.float32)
        T = np.asarray(se3.exp(jnp.asarray([0.3, -0.1, 0.2, 0.05, -0.08, 0.1])))
        pc = Xw @ T[:3, :3].T + T[:3, 3]
        uv = np.stack([500 * pc[:, 0] / pc[:, 2] + 320,
                       500 * pc[:, 1] / pc[:, 2] + 240], -1).astype(np.float32)
        res = pnp.ransac_pnp(jnp.asarray(Xw), jnp.asarray(uv),
                             jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
                             LEVEL_SIGMA2, 500.0, 500.0, 320.0, 240.0)
        assert bool(res.ok)
        assert int(res.n_inliers) > 100
        np.testing.assert_allclose(np.asarray(res.Tcw), T, atol=0.02)

    def test_with_outliers(self, rng):
        n = 150
        Xw = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                       rng.uniform(4, 10, n)], -1).astype(np.float32)
        T = np.asarray(se3.exp(jnp.asarray([0.2, 0.1, -0.1, 0.03, 0.05, -0.02])))
        pc = Xw @ T[:3, :3].T + T[:3, 3]
        uv = np.stack([500 * pc[:, 0] / pc[:, 2] + 320,
                       500 * pc[:, 1] / pc[:, 2] + 240], -1).astype(np.float32)
        uv[:40] += rng.uniform(30, 120, (40, 2))       # 27% outliers
        res = pnp.ransac_pnp(jnp.asarray(Xw), jnp.asarray(uv),
                             jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
                             LEVEL_SIGMA2, 500.0, 500.0, 320.0, 240.0)
        assert bool(res.ok)
        inl = np.asarray(res.inliers)
        assert inl[:40].sum() <= 2
        np.testing.assert_allclose(np.asarray(res.Tcw), T, atol=0.03)

    def test_planar_scene(self, rng):
        """EPnP's barycentric solve is singular on coplanar points; the
        planar-homography hypothesis (`_planar_pose`) must carry relocation
        on flat scenes (e.g. the synthetic plane world)."""
        n = 120
        Xw = np.concatenate([rng.uniform(-3, 3, (n, 2)),
                             np.full((n, 1), 5.0)], axis=1).astype(np.float32)
        T = np.asarray(se3.exp(jnp.asarray([0.25, -0.15, 0.1, 0.04, -0.06, 0.08])))
        pc = Xw @ T[:3, :3].T + T[:3, 3]
        uv = np.stack([500 * pc[:, 0] / pc[:, 2] + 320,
                       500 * pc[:, 1] / pc[:, 2] + 240], -1).astype(np.float32)
        res = pnp.ransac_pnp(jnp.asarray(Xw), jnp.asarray(uv),
                             jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
                             LEVEL_SIGMA2, 500.0, 500.0, 320.0, 240.0)
        assert bool(res.ok)
        assert int(res.n_inliers) > 100
        np.testing.assert_allclose(np.asarray(res.Tcw), T, atol=0.02)


class TestSim3:
    def test_recovers_similarity(self, rng):
        n = 80
        p2 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                       rng.uniform(3, 8, n)], -1).astype(np.float32)
        R = np.asarray(se3.so3_exp(jnp.asarray([0.1, -0.2, 0.15])))
        s = 1.4
        t = np.array([0.5, -0.2, 0.3], np.float32)
        p1 = (s * (p2 @ R.T) + t).astype(np.float32)
        res = sim3_solver.ransac_sim3(
            jnp.asarray(p1), jnp.asarray(p2),
            jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
            jnp.ones(n, bool), LEVEL_SIGMA2, 500.0, 500.0, 320.0, 240.0)
        assert bool(res.ok)
        np.testing.assert_allclose(float(res.g12.s), s, atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.g12.R), R, atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.g12.t), t, atol=1e-2)

    def test_fix_scale(self, rng):
        n = 60
        p2 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                       rng.uniform(3, 8, n)], -1).astype(np.float32)
        R = np.asarray(se3.so3_exp(jnp.asarray([0.05, 0.1, -0.08])))
        t = np.array([0.3, 0.1, -0.2], np.float32)
        p1 = (p2 @ R.T + t).astype(np.float32)
        res = sim3_solver.ransac_sim3(
            jnp.asarray(p1), jnp.asarray(p2),
            jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
            jnp.ones(n, bool), LEVEL_SIGMA2, 500.0, 500.0, 320.0, 240.0,
            fix_scale=True)
        assert bool(res.ok)
        assert float(res.g12.s) == 1.0
        np.testing.assert_allclose(np.asarray(res.g12.R), R, atol=1e-3)

    def test_outliers_rejected(self, rng):
        n = 80
        p2 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                       rng.uniform(3, 8, n)], -1).astype(np.float32)
        R = np.asarray(se3.so3_exp(jnp.asarray([0.1, -0.1, 0.05])))
        p1 = (1.2 * (p2 @ R.T) + np.array([0.4, 0, 0.2])).astype(np.float32)
        p1[:20] += rng.uniform(1, 3, (20, 3))
        res = sim3_solver.ransac_sim3(
            jnp.asarray(p1), jnp.asarray(p2),
            jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
            jnp.ones(n, bool), LEVEL_SIGMA2, 500.0, 500.0, 320.0, 240.0)
        assert bool(res.ok)
        inl = np.asarray(res.inliers)
        assert inl[:20].sum() <= 2
        np.testing.assert_allclose(float(res.g12.s), 1.2, atol=0.02)


class TestOptimizeSim3:
    """Reprojection-error Sim3 refinement (`Optimizer::OptimizeSim3`,
    `src/Optimizer.cc:1405-1640`)."""

    def _setup(self, rng, n=60):
        pc2 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                        rng.uniform(3, 8, n)], -1).astype(np.float32)
        g_true = sim3.Sim3.from_se3(se3.exp(
            jnp.asarray([0.2, -0.1, 0.15, 0.03, -0.05, 0.02])))
        pc1 = np.asarray(sim3.apply(g_true, jnp.asarray(pc2)))

        def proj(p):
            return np.stack([500 * p[:, 0] / p[:, 2] + 320,
                             500 * p[:, 1] / p[:, 2] + 240], -1)

        return pc1, pc2, proj(pc1), proj(pc2), g_true

    def test_converges_from_perturbed_init(self, rng):
        n = 60
        pc1, pc2, uv1, uv2, g_true = self._setup(rng, n)
        g0 = sim3.compose(sim3.exp(jnp.asarray(
            [0.05, -0.03, 0.04, 0.01, 0.02, -0.01, 0.0])), g_true)
        lvl = jnp.zeros(n, jnp.int32)
        g_opt, inl, n_inl = sim3_solver.optimize_sim3(
            g0, jnp.asarray(pc1), jnp.asarray(pc2), jnp.asarray(uv1),
            jnp.asarray(uv2), lvl, lvl, jnp.ones(n, bool), LEVEL_SIGMA2,
            500.0, 500.0, 320.0, 240.0, fix_scale=True)
        assert int(n_inl) == n
        np.testing.assert_allclose(np.asarray(g_opt.R), np.asarray(g_true.R),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(g_opt.t), np.asarray(g_true.t),
                                   atol=1e-3)

    def test_prunes_outlier_pairs(self, rng):
        n = 60
        pc1, pc2, uv1, uv2, g_true = self._setup(rng, n)
        uv1 = uv1.copy()
        uv1[:10] += rng.uniform(20, 60, (10, 2))      # corrupt 10 pairs
        lvl = jnp.zeros(n, jnp.int32)
        g_opt, inl, n_inl = sim3_solver.optimize_sim3(
            g_true, jnp.asarray(pc1), jnp.asarray(pc2), jnp.asarray(uv1),
            jnp.asarray(uv2), lvl, lvl, jnp.ones(n, bool), LEVEL_SIGMA2,
            500.0, 500.0, 320.0, 240.0, fix_scale=True)
        inl = np.asarray(inl)
        assert inl[:10].sum() == 0
        assert inl[10:].all()
        np.testing.assert_allclose(np.asarray(g_opt.R), np.asarray(g_true.R),
                                   atol=1e-3)

    def test_stereo_channel_breaks_planar_flip(self, rng):
        """On a coplanar point set the flipped planar-pose solution
        reprojects almost as well as the truth; the disparity residual
        separates them (TPU-native extension, see solver docstring)."""
        n = 50
        pc2 = np.concatenate([rng.uniform(-2, 2, (n, 2)),
                              np.full((n, 1), 5.0)], 1).astype(np.float32)
        g_true = sim3.Sim3.from_se3(se3.exp(
            jnp.asarray([0.1, -0.05, 0.02, 0.02, -0.03, 0.01])))
        pc1 = np.asarray(sim3.apply(g_true, jnp.asarray(pc2)))

        bf = 50.0
        def proj(p):
            return np.stack([500 * p[:, 0] / p[:, 2] + 320,
                             500 * p[:, 1] / p[:, 2] + 240], -1)
        ur1 = proj(pc1)[:, 0] - bf / pc1[:, 2]
        ur2 = proj(pc2)[:, 0] - bf / pc2[:, 2]
        lvl = jnp.zeros(n, jnp.int32)
        g0 = sim3.compose(sim3.exp(jnp.asarray(
            [0.03, -0.02, 0.03, 0.008, 0.015, -0.008, 0.0])), g_true)
        g_opt, inl, n_inl = sim3_solver.optimize_sim3(
            g0, jnp.asarray(pc1), jnp.asarray(pc2),
            jnp.asarray(proj(pc1)), jnp.asarray(proj(pc2)), lvl, lvl,
            jnp.ones(n, bool), LEVEL_SIGMA2, 500.0, 500.0, 320.0, 240.0,
            fix_scale=True, ur1=jnp.asarray(ur1), ur2=jnp.asarray(ur2),
            bf=bf)
        assert int(n_inl) == n
        np.testing.assert_allclose(np.asarray(g_opt.t), np.asarray(g_true.t),
                                   atol=2e-3)


class TestSearchBySim3:
    def test_mutual_guided_matching(self, rng):
        """`ORBmatcher::SearchBySim3` (`src/ORBmatcher.cc:1139-1320`)."""
        from orb_slam2_tpu.ops import matching
        n = 64
        pc2 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                        rng.uniform(3, 8, n)], -1).astype(np.float32)
        g = sim3.Sim3.from_se3(se3.exp(
            jnp.asarray([0.1, 0.0, 0.05, 0.01, -0.02, 0.0])))
        pc1 = np.asarray(sim3.apply(g, jnp.asarray(pc2)))

        def proj(p):
            return np.stack([500 * p[:, 0] / p[:, 2] + 320,
                             500 * p[:, 1] / p[:, 2] + 240], -1)

        perm = rng.permutation(n)
        desc2 = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
        desc1 = desc2[perm]                      # feature i of KF1 = perm[i] of KF2
        lvl = jnp.zeros(n, jnp.int32)
        mm = matching.search_by_sim3(
            jnp.asarray(pc1[perm]), jnp.asarray(proj(pc1[perm])), lvl,
            jnp.asarray(desc1), jnp.ones(n, bool),
            jnp.asarray(pc2), jnp.asarray(proj(pc2)), lvl,
            jnp.asarray(desc2), jnp.ones(n, bool),
            g, [1.2 ** i for i in range(8)], 500.0, 500.0, 320.0, 240.0)
        idx = np.asarray(mm.idx)
        valid = np.asarray(mm.valid)
        assert valid.mean() > 0.9
        assert (idx[valid] == perm[valid]).all()
