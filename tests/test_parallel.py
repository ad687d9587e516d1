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
