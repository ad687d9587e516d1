"""Pallas matching kernel vs the XLA reference path (interpreter mode on CPU;
the compiled path is exercised on real TPU by bench/e2e runs)."""
import numpy as np
import jax.numpy as jnp

from orb_slam2_tpu.ops import matching, pallas_kernels


class TestMaskedBestTwo:
    def _check(self, rng, n, m, density):
        a = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
        b = rng.integers(0, 2**32, (m, 8), dtype=np.uint32)
        mask = rng.random((n, m)) < density
        best, idx, second = pallas_kernels.masked_best_two_pallas(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask), interpret=True)
        d = matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b))
        b2, i2, s2 = matching.best_two(d, jnp.asarray(mask))
        np.testing.assert_array_equal(np.asarray(best), np.asarray(b2))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(second), np.asarray(s2))

    def test_bit_exact_vs_xla(self, rng):
        self._check(rng, 200, 300, 0.3)

    def test_unaligned_rows(self, rng):
        self._check(rng, 130, 256, 0.5)

    def test_empty_mask_rows(self, rng):
        # rows with no candidates must give BIG like the XLA path
        a = rng.integers(0, 2**32, (128, 8), dtype=np.uint32)
        b = rng.integers(0, 2**32, (128, 8), dtype=np.uint32)
        mask = np.zeros((128, 128), bool)
        mask[0, 5] = True
        best, idx, second = pallas_kernels.masked_best_two_pallas(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask), interpret=True)
        assert int(best[1]) == matching.BIG
        assert int(idx[0]) == 5
        assert int(second[0]) == matching.BIG


class TestProjectionBestTwo:
    """Fused projection matcher vs the XLA search_by_projection_points path
    (bit-exact: same candidate mask, same tie-breaks, same level-aware
    second-best)."""

    def _inputs(self, rng, P, N):
        uv = rng.uniform(0, 640, (P, 2)).astype(np.float32)
        radius = rng.uniform(5, 60, P).astype(np.float32)
        pred = rng.integers(0, 8, P).astype(np.int32)
        p_ur = np.where(rng.random(P) < 0.5,
                        rng.uniform(0, 640, P), -1.0).astype(np.float32)
        p_valid = rng.random(P) < 0.8
        p_desc = rng.integers(0, 2**32, (P, 8), dtype=np.uint32)
        kp_xy = rng.uniform(0, 640, (N, 2)).astype(np.float32)
        kp_level = rng.integers(0, 8, N).astype(np.int32)
        kp_ur = np.where(rng.random(N) < 0.5,
                         rng.uniform(0, 640, N), -1.0).astype(np.float32)
        kp_valid = rng.random(N) < 0.9
        kp_desc = rng.integers(0, 2**32, (N, 8), dtype=np.uint32)
        return (uv, radius, pred, p_ur, p_valid, p_desc,
                kp_xy, kp_level, kp_ur, kp_valid, kp_desc)

    def _xla_ref(self, uv, radius, pred, p_ur, p_valid, p_desc,
                 kp_xy, kp_level, kp_ur, kp_valid, kp_desc):
        win = (np.abs(uv[:, None, 0] - kp_xy[None, :, 0]) < radius[:, None]) & \
              (np.abs(uv[:, None, 1] - kp_xy[None, :, 1]) < radius[:, None])
        lvl_ok = (kp_level[None, :] >= pred[:, None] - 1) & \
                 (kp_level[None, :] <= pred[:, None])
        st = np.where((p_ur[:, None] >= 0) & (kp_ur[None, :] >= 0),
                      np.abs(p_ur[:, None] - kp_ur[None, :]) < radius[:, None],
                      True)
        cand = win & lvl_ok & st & p_valid[:, None] & kp_valid[None, :]
        dist = np.asarray(matching.hamming_matrix(jnp.asarray(p_desc),
                                                  jnp.asarray(kp_desc)))
        d = np.where(cand, dist, matching.BIG)
        best = d.min(1)
        bidx = d.argmin(1)
        best_lvl = kp_level[bidx]
        same = cand & (kp_level[None, :] == best_lvl[:, None])
        dd = np.where(same, dist, matching.BIG)
        dd[np.arange(len(bidx)), bidx] = matching.BIG
        second = dd.min(1)
        return best, bidx, second

    def test_bit_exact(self, rng):
        args = self._inputs(rng, 200, 256)
        best, idx, second = pallas_kernels.projection_best_two_pallas(
            *[jnp.asarray(a) for a in args], interpret=True)
        b, i, s = self._xla_ref(*args)
        np.testing.assert_array_equal(np.asarray(best), b)
        np.testing.assert_array_equal(np.asarray(idx), i)
        np.testing.assert_array_equal(np.asarray(second), s)

    def test_matches_search_by_projection_points(self, rng):
        """End-to-end: the use_pallas path of search_by_projection_points
        (interpret via monkeypatch) equals the XLA path."""
        import orb_slam2_tpu.ops.pallas_kernels as pk

        (uv, radius, pred, p_ur, p_valid, p_desc,
         kp_xy, kp_level, kp_ur, kp_valid, kp_desc) = self._inputs(rng, 150, 256)
        view_cos = rng.uniform(0.5, 1.0, 150).astype(np.float32)
        sf = [1.2 ** i for i in range(8)]
        kw = dict(th=3.0, nn_ratio=0.9)
        args = (jnp.asarray(uv), jnp.asarray(pred), jnp.asarray(view_cos),
                jnp.asarray(p_desc), jnp.asarray(p_valid), jnp.asarray(p_ur),
                jnp.asarray(kp_xy), jnp.asarray(kp_level),
                jnp.asarray(kp_desc), jnp.asarray(kp_valid),
                jnp.asarray(kp_ur), sf)
        ref = matching.search_by_projection_points(*args, **kw)
        orig = pk.projection_best_two_pallas
        pk.projection_best_two_pallas = \
            lambda *a, **k: orig(*a, interpret=True)
        try:
            got = matching.search_by_projection_points(
                *args, use_pallas=True, **kw)
        finally:
            pk.projection_best_two_pallas = orig
        np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
        np.testing.assert_array_equal(
            np.asarray(ref.idx)[np.asarray(ref.valid)],
            np.asarray(got.idx)[np.asarray(got.valid)])


class TestPoseNormalEqs:
    def test_matches_xla_build(self, rng):
        """pose_normal_eqs_pallas (interpret mode) == _build_normal_eqs."""
        import jax.numpy as jnp
        from orb_slam2_tpu.solvers import pose_opt, reproj
        from orb_slam2_tpu.geometry.camera import Camera
        from orb_slam2_tpu.geometry import se3
        E = 256
        cam = Camera.make(300.0, 300.0, 160.0, 120.0, 0, 0, 0, 0, 0,
                          30.0, 320, 240)
        Xw = rng.normal(0, 1.0, (E, 3)).astype(np.float32) + [0, 0, 5.0]
        Xw[:8, 2] = -0.5    # behind-camera points: the Jacobian products
        # overflow f32 unless the kernel zeroes invz (H went NaN on TPU)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.1, -0.05, 0.2]
        pc = Xw @ T[:3, :3].T + T[:3, 3]
        u = 300.0 * pc[:, 0] / pc[:, 2] + 160.0
        v = 300.0 * pc[:, 1] / pc[:, 2] + 120.0
        ur = u - 30.0 / pc[:, 2]
        stereo = rng.random(E) < 0.5
        obs = np.stack([u + rng.normal(0, 2, E), v + rng.normal(0, 2, E),
                        np.where(stereo, ur + rng.normal(0, 2, E), -1.0)],
                       axis=-1).astype(np.float32)
        level = rng.integers(0, 8, E).astype(np.int32)
        sigma2 = [1.2 ** (2 * i) for i in range(8)]
        inv_s2 = (1.0 / np.asarray(sigma2)[level]).astype(np.float32)
        mask = (rng.random(E) < 0.9).astype(np.float32)
        comp_stereo = jnp.asarray(obs[:, 2] >= 0)
        for robust in (True, False):
            H0, b0, e0 = pose_opt._build_normal_eqs(
                cam, jnp.asarray(T), jnp.asarray(Xw), jnp.asarray(obs),
                comp_stereo, jnp.asarray(inv_s2), jnp.asarray(mask), robust)
            H1, b1, e1 = pallas_kernels.pose_normal_eqs_pallas(
                jnp.asarray(T), cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
                jnp.asarray(Xw.T), jnp.asarray(obs.T),
                jnp.asarray(inv_s2)[None], jnp.asarray(mask)[None],
                np.asarray(comp_stereo, np.float32)[None],
                jnp.float32(reproj.CHI2_MONO), jnp.float32(reproj.CHI2_STEREO),
                robust=robust, interpret=True)
            # f32 accumulation order differs (einsum tree vs lane sums)
            np.testing.assert_allclose(np.asarray(H0), np.asarray(H1),
                                       rtol=3e-4, atol=2e-3)
            np.testing.assert_allclose(np.asarray(b0), np.asarray(b1),
                                       rtol=3e-4, atol=2e-2)
            np.testing.assert_allclose(float(e0), float(e1), rtol=3e-4)


class TestBAEdgeTerms:
    """ba_edge_terms_pallas-based assembly (interpret mode) vs the XLA
    _assemble, and full solve_ba equivalence through the kernel path."""

    def _lin_pair(self, rng, robust):
        import jax.numpy as jnp
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_schur_ba import make_ba_scene, LEVEL_SIGMA2
        from orb_slam2_tpu.solvers import schur_ba

        cam, prob, *_ = make_ba_scene(rng, noise=0.5, perturb=0.05)
        # push some points behind cameras to exercise the invz guard
        pts = np.asarray(prob.points).copy()
        pts[:4, 2] = -2.0
        prob = prob._replace(points=jnp.asarray(pts))
        sigma2 = jnp.asarray(LEVEL_SIGMA2, jnp.float32)
        inv_s2 = 1.0 / sigma2[jnp.clip(prob.obs_level, 0, 7)]
        base = (prob.obs_cam >= 0) & prob.pt_valid[:, None]
        maskf = base.astype(jnp.float32)
        C = prob.poses.shape[0]
        onehot = schur_ba._onehot_cam(prob, C)
        ref = schur_ba._assemble(cam, prob, prob.poses, prob.points,
                                 inv_s2, maskf, robust, False, onehot)
        got = schur_ba._assemble_pallas(cam, prob, prob.poses, prob.points,
                                        inv_s2, maskf, robust, onehot)
        return ref, got, np.asarray(base)

    def test_assembly_matches_xla(self, rng, monkeypatch):
        import orb_slam2_tpu.ops.pallas_kernels as pk
        orig = pk.ba_edge_terms_pallas
        monkeypatch.setattr(pk, "ba_edge_terms_pallas",
                            lambda *a, **k: orig(*a, interpret=True, **k))
        for robust in (True, False):
            ref, got, base = self._lin_pair(rng, robust)
            for name in ("Hcc", "bc", "Hpp", "bp", "We", "err"):
                np.testing.assert_allclose(
                    np.asarray(getattr(ref, name)),
                    np.asarray(getattr(got, name)),
                    rtol=3e-4, atol=2e-2, err_msg=name)
            np.testing.assert_array_equal(np.asarray(ref.pt_on),
                                          np.asarray(got.pt_on))
            # per-edge classifications compared on REAL edges only: masked/
            # padded edges see a zero pose in the kernel (one-hot row is all
            # zero) vs camera 0's pose in XLA (clipped index) — every
            # consumer ANDs these with base_mask
            np.testing.assert_array_equal(np.asarray(ref.depth_ok)[base],
                                          np.asarray(got.depth_ok)[base])
            ok = np.asarray(ref.depth_ok) & base
            np.testing.assert_allclose(np.asarray(ref.chi2)[ok],
                                       np.asarray(got.chi2)[ok],
                                       rtol=1e-3, atol=1e-2)

    def test_solve_ba_through_kernel(self, rng, monkeypatch):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_schur_ba import make_ba_scene, LEVEL_SIGMA2
        from orb_slam2_tpu.solvers import schur_ba
        from orb_slam2_tpu.geometry import se3
        import orb_slam2_tpu.ops.pallas_kernels as pk
        import jax.numpy as jnp

        orig = pk.ba_edge_terms_pallas
        monkeypatch.setattr(pk, "ba_edge_terms_pallas",
                            lambda *a, **k: orig(*a, interpret=True, **k))
        cam, prob, poses_true, X_true, nc, npts = make_ba_scene(rng)
        res = schur_ba.solve_ba(cam, prob, LEVEL_SIGMA2, use_pallas=True)
        for c in range(nc):
            np.testing.assert_allclose(np.asarray(res.poses)[c],
                                       poses_true[c], atol=2e-3)
        err = np.linalg.norm(np.asarray(res.points)[:npts] - X_true, axis=-1)
        assert np.median(err) < 5e-3, np.median(err)
