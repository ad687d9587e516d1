import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_tpu.geometry import se3, sim3, camera


@pytest.fixture(autouse=True, scope="module")
def _x64():
    """These tests check Lie-group identities at f64 precision; restore f32
    afterwards so the rest of the suite runs at production dtype."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def random_rotation(rng, n=()):
    q = rng.normal(size=n + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(se3.from_quat(jnp.asarray(q)))


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        w = rng.normal(size=(64, 3)) * 2.0
        R = se3.so3_exp(jnp.asarray(w))
        w2 = se3.so3_log(R)
        R2 = se3.so3_exp(w2)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-8)

    def test_exp_small_angle(self):
        w = jnp.array([[1e-10, 0, 0], [0.0, 0.0, 0.0]])
        R = se3.so3_exp(w)
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-12)

    def test_exp_known(self):
        R = se3.so3_exp(jnp.array([0.0, 0.0, np.pi / 2]))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        np.testing.assert_allclose(np.asarray(R), expected, atol=1e-12)

    def test_log_near_pi(self, rng):
        axis = rng.normal(size=(16, 3))
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        w = axis * (np.pi - 1e-4)
        R = se3.so3_exp(jnp.asarray(w))
        w2 = np.asarray(se3.so3_log(R))
        R2 = se3.so3_exp(jnp.asarray(w2))
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-6)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(32, 6))
        T = se3.exp(jnp.asarray(xi))
        xi2 = se3.log(T)
        np.testing.assert_allclose(xi, np.asarray(xi2), atol=1e-8)

    def test_inverse(self, rng):
        xi = rng.normal(size=(8, 6))
        T = se3.exp(jnp.asarray(xi))
        I = se3.compose(T, se3.inverse(T))
        np.testing.assert_allclose(np.asarray(I), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-10)

    def test_orthonormalize(self, rng):
        xi = rng.normal(size=(8, 6))
        T = np.asarray(se3.exp(jnp.asarray(xi)))
        # perturb the rotation block off SO(3) (f32 pose-chain drift model)
        Tp = T.copy()
        Tp[:, :3, :3] += rng.normal(size=(8, 3, 3)) * 1e-4
        To = np.asarray(se3.orthonormalize(jnp.asarray(Tp)))
        RtR = np.einsum("bji,bjk->bik", To[:, :3, :3], To[:, :3, :3])
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (8, 3, 3)),
                                   atol=1e-9)
        # projection stays near the perturbed input, not some other rotation
        np.testing.assert_allclose(To[:, :3, :3], T[:, :3, :3], atol=1e-3)
        np.testing.assert_allclose(To[:, :3, 3], Tp[:, :3, 3], atol=1e-12)
        # exact rotations are fixed points
        To2 = np.asarray(se3.orthonormalize(jnp.asarray(T)))
        np.testing.assert_allclose(To2, T, atol=1e-12)

    def test_apply(self, rng):
        xi = rng.normal(size=(6,))
        T = se3.exp(jnp.asarray(xi))
        p = rng.normal(size=(10, 3))
        out = se3.apply(T, jnp.asarray(p))
        expected = (np.asarray(T)[:3, :3] @ p.T).T + np.asarray(T)[:3, 3]
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-10)

    def test_quat_roundtrip(self, rng):
        R = random_rotation(rng, (32,))
        q = se3.to_quat(jnp.asarray(R))
        R2 = se3.from_quat(q)
        np.testing.assert_allclose(R, np.asarray(R2), atol=1e-8)


class TestSim3:
    def test_compose_inverse(self, rng):
        for _ in range(5):
            R = random_rotation(rng)
            t = rng.normal(size=3)
            s = np.exp(rng.normal() * 0.3)
            g = sim3.Sim3(jnp.asarray(R), jnp.asarray(t), jnp.asarray(s))
            gi = sim3.inverse(g)
            comp = sim3.compose(g, gi)
            np.testing.assert_allclose(np.asarray(comp.R), np.eye(3), atol=1e-9)
            np.testing.assert_allclose(np.asarray(comp.t), np.zeros(3), atol=1e-9)
            np.testing.assert_allclose(np.asarray(comp.s), 1.0, atol=1e-9)

    def test_apply(self, rng):
        R = random_rotation(rng)
        t = rng.normal(size=3)
        s = 1.7
        g = sim3.Sim3(jnp.asarray(R), jnp.asarray(t), jnp.asarray(s))
        p = rng.normal(size=(5, 3))
        out = sim3.apply(g, jnp.asarray(p))
        expected = s * (R @ p.T).T + t
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-9)

    def test_exp_log_roundtrip(self, rng):
        zeta = rng.normal(size=(16, 7)) * 0.5
        g = sim3.exp(jnp.asarray(zeta))
        zeta2 = sim3.log(g)
        g2 = sim3.exp(zeta2)
        np.testing.assert_allclose(np.asarray(g.R), np.asarray(g2.R), atol=1e-7)
        np.testing.assert_allclose(np.asarray(g.t), np.asarray(g2.t), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g.s), np.asarray(g2.s), atol=1e-7)

    def test_exp_zero(self):
        g = sim3.exp(jnp.zeros(7))
        np.testing.assert_allclose(np.asarray(g.R), np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.asarray(g.s), 1.0, atol=1e-12)


class TestCamera:
    def _tum_cam(self):
        return camera.Camera.make(
            fx=517.306408, fy=516.469215, cx=318.643040, cy=255.313989,
            k1=0.262383, k2=-0.953104, p1=-0.005358, p2=0.002628, k3=1.163314,
            width=640, height=480, dtype=jnp.float64)

    def test_undistort_roundtrip(self, rng):
        cam = self._tum_cam()
        # sample normalized points well inside the image
        xn = rng.uniform(-0.3, 0.3, size=(64, 2))
        xd = camera.distort_normalized(cam, jnp.asarray(xn))
        uv_dist = jnp.stack([xd[..., 0] * cam.fx + cam.cx, xd[..., 1] * cam.fy + cam.cy], axis=-1)
        uv_und = camera.undistort_pixels(cam, uv_dist, iters=20)
        expected = np.stack([xn[:, 0] * np.asarray(cam.fx) + np.asarray(cam.cx),
                             xn[:, 1] * np.asarray(cam.fy) + np.asarray(cam.cy)], axis=-1)
        np.testing.assert_allclose(np.asarray(uv_und), expected, atol=1e-3)

    def test_project_backproject(self, rng):
        cam = camera.Camera.make(500.0, 500.0, 320.0, 240.0, bf=40.0, dtype=jnp.float64)
        pc = np.stack([rng.uniform(-1, 1, 32), rng.uniform(-1, 1, 32), rng.uniform(1, 10, 32)], axis=-1)
        uv = camera.project(cam, jnp.asarray(pc))
        pc2 = camera.backproject(cam, uv, jnp.asarray(pc[:, 2]))
        np.testing.assert_allclose(np.asarray(pc2), pc, atol=1e-9)

    def test_stereo_projection(self):
        cam = camera.Camera.make(500.0, 500.0, 320.0, 240.0, bf=40.0, dtype=jnp.float64)
        pc = jnp.array([[0.0, 0.0, 2.0]])
        uvr = camera.project_stereo(cam, pc)
        assert np.allclose(np.asarray(uvr), [[320.0, 240.0, 320.0 - 20.0]])


class TestConfig:
    def test_feature_budgets_match_reference_formula(self):
        from orb_slam2_tpu.utils.config import SlamConfig

        cfg = SlamConfig(n_features=1000, scale_factor=1.2, n_levels=8)
        budgets = cfg.features_per_level()
        assert sum(budgets) == 1000
        assert budgets[0] > budgets[1] > budgets[-2]
        # the reference's exact split for 1000/1.2/8 (cvRound semantics)
        assert budgets[0] in (216, 217)

    def test_yaml_loading(self, tmp_path):
        from orb_slam2_tpu.utils.config import SlamConfig

        y = tmp_path / "cam.yaml"
        y.write_text("""%YAML:1.0
Camera.fx: 718.856
Camera.fy: 718.856
Camera.cx: 607.1928
Camera.cy: 185.2157
Camera.fps: 10.0
Camera.bf: 386.1448
ORBextractor.nFeatures: 2000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
""")
        cfg = SlamConfig.from_yaml(str(y), sensor=1)
        assert cfg.fx == 718.856
        assert cfg.n_features == 2000
        assert cfg.max_keypoints == 4096
        assert abs(cfg.baseline - 386.1448 / 718.856) < 1e-9
