import numpy as np
import jax.numpy as jnp

from orb_slam2_tpu.geometry import se3, triangulation
from orb_slam2_tpu.solvers import initializer

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0


def project(X, R=np.eye(3), t=np.zeros(3)):
    Xc = X @ R.T + t
    return np.stack([FX * Xc[:, 0] / Xc[:, 2] + CX, FY * Xc[:, 1] / Xc[:, 2] + CY], axis=-1), Xc[:, 2]


def make_general_scene(rng, n=150, pad_to=256):
    """3D cloud, camera 2 translated+rotated -> fundamental-matrix regime."""
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)], axis=-1)
    w = np.array([0.02, -0.05, 0.01])
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    t = np.array([0.8, 0.05, 0.1])
    p1, z1 = project(X)
    p2, z2 = project(X, R, t)
    valid = np.zeros(pad_to, bool)
    valid[:n] = True
    pp1 = np.zeros((pad_to, 2), np.float32)
    pp2 = np.zeros((pad_to, 2), np.float32)
    pp1[:n] = p1
    pp2[:n] = p2
    return pp1, pp2, valid, R, t, X


def make_planar_scene(rng, n=150, pad_to=256):
    """All points on a plane -> homography regime."""
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), np.full(n, 6.0)], axis=-1)
    X[:, 2] += 0.3 * X[:, 0] * 0.0  # exact plane z=6
    w = np.array([0.03, -0.04, 0.02])
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    t = np.array([0.7, -0.1, 0.05])
    p1, _ = project(X)
    p2, _ = project(X, R, t)
    valid = np.zeros(pad_to, bool)
    valid[:n] = True
    pp1 = np.zeros((pad_to, 2), np.float32)
    pp2 = np.zeros((pad_to, 2), np.float32)
    pp1[:n] = p1
    pp2[:n] = p2
    return pp1, pp2, valid, R, t, X


def check_pose(res, R_true, t_true, atol_rot=0.01, atol_t=0.05):
    R = np.asarray(res.R21)
    t = np.asarray(res.t21)
    t_unit = t_true / np.linalg.norm(t_true)
    assert np.allclose(R, R_true, atol=atol_rot), np.abs(R - R_true).max()
    assert np.allclose(t, t_unit, atol=atol_t), (t, t_unit)


class TestTriangulate:
    def test_exact(self, rng):
        X = np.stack([rng.uniform(-2, 2, 30), rng.uniform(-2, 2, 30), rng.uniform(3, 9, 30)], axis=-1)
        R = np.asarray(se3.so3_exp(jnp.asarray([0.05, -0.02, 0.03])))
        t = np.array([0.5, 0.1, -0.05])
        p1, _ = project(X)
        p2, _ = project(X, R, t)
        K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])
        P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = K @ np.hstack([R, t[:, None]])
        Xr = np.asarray(triangulation.triangulate(jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(p1), jnp.asarray(p2)))
        np.testing.assert_allclose(Xr, X, atol=1e-2)


class TestInitializer:
    def test_general_scene_noiseless(self, rng):
        p1, p2, valid, R, t, X = make_general_scene(rng)
        res = initializer.initialize(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(valid), FX, FY, CX, CY)
        assert bool(res.success)
        assert not bool(res.used_homography)
        check_pose(res, R, t)
        good = np.asarray(res.good)
        assert good.sum() > 100
        # triangulated structure matches up to the scale of |t21|=1
        scale = 1.0 / np.linalg.norm(t)
        np.testing.assert_allclose(np.asarray(res.points)[good[: len(X)].nonzero()[0]],
                                   X[good[: len(X)].nonzero()[0]] * scale, atol=0.05)

    def test_planar_scene_uses_homography(self, rng):
        p1, p2, valid, R, t, X = make_planar_scene(rng)
        res = initializer.initialize(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(valid), FX, FY, CX, CY)
        assert bool(res.success)
        assert bool(res.used_homography)
        check_pose(res, R, t)

    def test_noise_and_outliers(self, rng):
        p1, p2, valid, R, t, X = make_general_scene(rng, n=200)
        p2 = p2.copy()
        p2[valid.nonzero()[0]] += rng.normal(0, 0.5, size=(200, 2))
        # 15% gross outliers
        out = rng.choice(200, 30, replace=False)
        p2[out] += rng.uniform(30, 100, size=(30, 2))
        res = initializer.initialize(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(valid), FX, FY, CX, CY)
        assert bool(res.success)
        check_pose(res, R, t, atol_rot=0.02, atol_t=0.08)

    def test_pure_rotation_fails(self, rng):
        # no translation -> no parallax -> must refuse to initialize
        n = 150
        X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)], axis=-1)
        R = np.asarray(se3.so3_exp(jnp.asarray([0.02, -0.03, 0.01])))
        p1, _ = project(X)
        p2, _ = project(X, R, np.zeros(3))
        pp1 = np.zeros((256, 2), np.float32); pp1[:n] = p1
        pp2 = np.zeros((256, 2), np.float32); pp2[:n] = p2
        valid = np.zeros(256, bool); valid[:n] = True
        res = initializer.initialize(jnp.asarray(pp1), jnp.asarray(pp2), jnp.asarray(valid), FX, FY, CX, CY)
        assert not bool(res.success)

    def test_too_few_matches_fails(self, rng):
        p1, p2, valid, R, t, X = make_general_scene(rng, n=30)  # < 50 triangulated
        res = initializer.initialize(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(valid), FX, FY, CX, CY)
        assert not bool(res.success)
