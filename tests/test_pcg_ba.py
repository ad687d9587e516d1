import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from orb_slam2_tpu.geometry import se3
from orb_slam2_tpu.solvers import pcg_ba, schur_ba

from test_schur_ba import make_ba_scene, LEVEL_SIGMA2


class TestPcgBA:
    def test_matches_dense_schur(self, rng):
        cam, prob, poses_true, X_true, nc, npts = make_ba_scene(
            rng, n_cams=6, n_pts=120, C=8, Q=160, O=8, perturb=0.02)
        res_pcg = pcg_ba.solve_ba_pcg(cam, prob, LEVEL_SIGMA2, n_iters=15,
                                      cg_iters=60, robust=True)
        for c in range(nc):
            np.testing.assert_allclose(np.asarray(res_pcg.poses)[c],
                                       poses_true[c], atol=5e-3)
        err = np.linalg.norm(np.asarray(res_pcg.points)[:npts] - X_true, axis=-1)
        assert np.median(err) < 1e-2

    def test_sharded_pcg(self, rng):
        assert len(jax.devices()) >= 8
        cam, prob, poses_true, X_true, nc, npts = make_ba_scene(
            rng, n_cams=6, n_pts=120, C=8, Q=160, O=8, perturb=0.02)
        mesh = Mesh(np.array(jax.devices()[:8]), ("shard",))
        res = pcg_ba.solve_ba_pcg_sharded(cam, prob, LEVEL_SIGMA2, mesh,
                                          n_iters=15, cg_iters=60, robust=True)
        for c in range(nc):
            np.testing.assert_allclose(np.asarray(res.poses)[c],
                                       poses_true[c], atol=5e-3)

    def test_sharded_equals_unsharded(self, rng):
        cam, prob, *_ = make_ba_scene(rng, n_cams=4, n_pts=60, C=8, Q=160,
                                      O=8, perturb=0.01)
        mesh = Mesh(np.array(jax.devices()[:8]), ("shard",))
        r1 = pcg_ba.solve_ba_pcg(cam, prob, LEVEL_SIGMA2, n_iters=5, cg_iters=40)
        r8 = pcg_ba.solve_ba_pcg_sharded(cam, prob, LEVEL_SIGMA2, mesh,
                                         n_iters=5, cg_iters=40)
        np.testing.assert_allclose(np.asarray(r1.poses), np.asarray(r8.poses),
                                   atol=1e-4)
