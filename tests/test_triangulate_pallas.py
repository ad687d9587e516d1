"""The fused epipolar-match Pallas path of triangulate_batch must produce a
bit-identical MapState to the XLA cand+fused_best_two path (interpret mode;
hardware parity is covered by bench/eval which run cfg.use_pallas)."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD
from orb_slam2_tpu.utils.synthetic import PlateWorld, loop_trajectory
from orb_slam2_tpu.pipeline.system import SlamSystem
from orb_slam2_tpu.pipeline import mapping_ops
from orb_slam2_tpu.mapstate import map as mapstate
from orb_slam2_tpu.ops import pallas_kernels as pk


def test_triangulate_batch_pallas_matches_xla():
    fx = 260.0
    cfg = SlamConfig(fx=fx, fy=fx, cx=160.0, cy=120.0, width=320,
                     height=240, n_features=500, bf=fx * 0.25,
                     sensor=SENSOR_RGBD, fps=10.0, th_depth=40.0,
                     max_keyframes=64, max_map_points=1 << 14,
                     ba_local_cams=16, ba_fixed_cams=16,
                     ba_max_points=1 << 11, ba_max_obs=8,
                     max_local_keyframes=32, max_local_points=1 << 12)
    world = PlateWorld(fx, fx, 160.0, 120.0, 320, 240, z0=5.0)
    gt = loop_trajectory(30, radius=1.4)
    s = SlamSystem(cfg, enable_loop_closing=False)
    for i, T in enumerate(gt):
        img, d = world.render_with_depth(T)
        s.track_rgbd(img, d, i / cfg.fps)
    s.flush()
    m = s.m
    assert int(m.n_keyframes) >= 3
    kf_id = jnp.asarray(int(s.ref_kf), jnp.int32)
    ids, _ = mapstate.covisible_keyframes(m, kf_id, 10)

    # free some features on the current keyframe so triangulation has work
    m = m._replace(kf_obs=m.kf_obs.at[kf_id].set(
        jnp.where(jnp.arange(m.n_feat) % 3 == 0, -1, m.kf_obs[kf_id])))

    m_x, n_x = mapping_ops.triangulate_batch(cfg, m, kf_id, ids)

    cfg_p = dataclasses.replace(cfg, use_pallas=1)
    orig = pk.epi_best_two_pallas
    pk.epi_best_two_pallas = lambda *a, **k: orig(
        *a, **{**k, "interpret": True})
    try:
        m_p, n_p = mapping_ops.triangulate_batch(cfg_p, m, kf_id, ids)
    finally:
        pk.epi_best_two_pallas = orig

    assert int(n_x) == int(n_p)
    assert int(n_x) > 0, "fixture produced no triangulations"
    for name, a, b in zip(m_x._fields, m_x, m_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
