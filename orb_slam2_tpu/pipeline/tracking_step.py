"""The fused per-frame tracking step — ONE device dispatch per frame.

The reference runs tracking as a long single-threaded C++ call chain
(`Tracking::Track`, `src/Tracking.cc:431-767`); the first cut here mirrored
it as ~10 separate jitted calls + scalar reads, which is dispatch-bound (each
host->device round trip costs far more than the math). This module fuses the
entire per-frame pipeline — motion-model matching (with the wide-window
retry), reference-KF fallback, local-map selection, local-map tracking,
counter updates, keyframe statistics, and next-frame state preparation — into
one jitted function with `lax.cond` branches, returning the new MapState, the
pose, and a single scalar bundle the host reads once.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..mapstate import map as mapstate
from ..ops import matching
from ..solvers import pose_opt
from ..utils.config import SlamConfig, SENSOR_MONOCULAR
from .frame import FrameData
from . import tracking_ops

INVALID = -1


class TrackStepResult(NamedTuple):
    m: mapstate.MapState
    frame: FrameData           # the current frame (extracted in-step for the
                               # fused image->pose wrappers; echoed otherwise)
    Tcw: jnp.ndarray           # (4,4)
    T_rel: jnp.ndarray         # (4,4) Tcw * inv(T_ref_kf) for trajectory log
    matched_pt: jnp.ndarray    # (N,) map point per keypoint
    next_pts: jnp.ndarray      # (N,3) 3D points for the next motion step
    next_pts_valid: jnp.ndarray
    ref_kf: jnp.ndarray        # () best-sharing keyframe
    scalars: jnp.ndarray       # (10,) int32: [ok, n_mm_matches, n_mm_inliers,
                               #  n_local_inliers, ref_matches, close_tracked,
                               #  close_untracked, used_fallback, ref_kf,
                               #  pose_ok (motion/ref track succeeded, before
                               #  the local-map inlier gate — the host's
                               #  localization-mode VO fallback reads this)]
    packed: jnp.ndarray        # (42,) f32 = [scalars (10), Tcw.ravel (16),
                               #  T_rel.ravel (16)] — the retire payload read
                               #  with ONE host transfer per frame (three
                               #  separate device_gets each paid a tunnel RTT)
    next_vel: jnp.ndarray      # (4,4) motion model for the NEXT frame
                               # (velocity_step folded in: saves the pipelined
                               #  stream a separate per-frame dispatch)


@jax.jit
def velocity_step(Tcw, T_prev):
    """Device-side motion model update (mVelocity = Tcw * T_prev^-1,
    src/Tracking.cc:680-686) — lets the pipelined stream chain poses without
    a host round trip. Orthonormalized: chained f32 poses drift off SO(3)
    and the transpose-form inverse amplifies that drift exponentially
    (see se3.orthonormalize)."""
    return se3.orthonormalize(Tcw @ se3.inverse(se3.orthonormalize(T_prev)))


def _motion_model(cfg, cam, T_pred, last, last_pts, last_pts_valid,
                  last_matched_pt, cur, th, check_rotation):
    pc = se3.apply(T_pred, last_pts)
    z = pc[..., 2]
    uv = jnp.stack([cam.fx * pc[..., 0] / jnp.maximum(z, 1e-6) + cam.cx,
                    cam.fy * pc[..., 1] / jnp.maximum(z, 1e-6) + cam.cy], -1)
    ur_proj = jnp.where(last.ur >= 0,
                        uv[..., 0] - cam.bf / jnp.maximum(z, 1e-6), -1.0)
    in_img = (z > 0) & (uv[..., 0] >= 0) & (uv[..., 0] < cfg.width) & \
        (uv[..., 1] >= 0) & (uv[..., 1] < cfg.height)
    src_valid = last_pts_valid & in_img
    mm = matching.search_by_projection_frame(
        uv, last.level, last.desc, src_valid, last.angle, ur_proj,
        cur.xy, cur.level, cur.desc, cur.valid, cur.angle, cur.ur,
        cfg.scale_factors, th, forward=False, backward=False,
        check_rotation=check_rotation, use_pallas=cfg.use_pallas_effective)
    N = cur.xy.shape[0]
    kp_last = jnp.full((N,), INVALID, jnp.int32).at[
        jnp.where(mm.valid, mm.idx, N)
    ].set(jnp.arange(last_pts.shape[0], dtype=jnp.int32), mode="drop")
    # map to map-point ids through the last frame's bindings
    matched = jnp.where(kp_last >= 0,
                        last_matched_pt[jnp.clip(kp_last, 0, N - 1)], INVALID)
    has3d = kp_last >= 0
    Xw = last_pts[jnp.clip(kp_last, 0, N - 1)]
    return matched, has3d, Xw, jnp.sum(has3d.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def full_tracking_step(cfg: SlamConfig, m: mapstate.MapState, cur: FrameData,
                       last: FrameData, last_pts, last_pts_valid,
                       last_matched_pt, T_last, velocity, has_velocity,
                       ref_kf_in, min_local_inliers=30) -> TrackStepResult:
    """min_local_inliers: local-map acceptance floor — 30 normally, 50 within
    one second of a relocalization (src/Tracking.cc:1471-1477)."""
    return _step(cfg, m, cur, last, last_pts, last_pts_valid, last_matched_pt,
                 T_last, velocity, has_velocity, ref_kf_in, min_local_inliers)


@functools.partial(jax.jit, static_argnames=("cfg", "sensor"),
                   donate_argnums=(1,))
def full_tracking_step_from_images(cfg: SlamConfig, m: mapstate.MapState,
                                   images, last: FrameData, last_pts,
                                   last_pts_valid, last_matched_pt, T_last,
                                   velocity, has_velocity, ref_kf_in,
                                   min_local_inliers, sensor: str
                                   ) -> TrackStepResult:
    """Frame construction + the full tracking step as ONE dispatch — the
    steady-state per-frame path of the system (the separate make_frame
    dispatch costs a full host round trip per frame). images: (img,) mono /
    (img, depth) rgbd / (imgL, imgR) stereo."""
    from . import frame as frame_mod

    if sensor == "rgbd":
        cur = frame_mod.make_frame_rgbd(images[0], images[1], cfg)
    elif sensor == "stereo":
        cur = frame_mod.make_frame_stereo(images[0], images[1], cfg)
    else:
        cur = frame_mod.make_frame_monocular(images[0], cfg)
    return _step(cfg, m, cur, last, last_pts, last_pts_valid, last_matched_pt,
                 T_last, velocity, has_velocity, ref_kf_in, min_local_inliers)


def _step(cfg: SlamConfig, m: mapstate.MapState, cur: FrameData,
          last: FrameData, last_pts, last_pts_valid,
          last_matched_pt, T_last, velocity, has_velocity,
          ref_kf_in, min_local_inliers) -> TrackStepResult:
    cam = cfg.camera()
    N = cur.xy.shape[0]
    P = m.capacity_pt
    # CheckReplacedInLastFrame (src/Tracking.cc:1135-1163): last-frame
    # bindings may reference points fused away (or culled) by a mapping pass
    # that ran after that frame was tracked — resolve through the forwarding
    # chain, then drop ids that no longer exist. The 3D position snapshot in
    # last_pts stays usable either way (a fused pair is co-located).
    lmp = jnp.where(last_matched_pt >= 0,
                    m.pt_forward[jnp.clip(last_matched_pt, 0, P - 1)], INVALID)
    last_matched_pt = jnp.where(
        (lmp >= 0) & m.pt_valid[jnp.clip(lmp, 0, P - 1)], lmp, INVALID)
    T_pred = jnp.where(has_velocity, velocity @ T_last, T_last)
    th1 = 15.0 if cfg.sensor == SENSOR_MONOCULAR else 7.0

    # --- motion model, with wide-window retry when matches are scarce ---
    matched_a, has_a, Xw_a, n_a = _motion_model(
        cfg, cam, T_pred, last, last_pts, last_pts_valid, last_matched_pt,
        cur, th1, True)

    def retry(_):
        return _motion_model(cfg, cam, T_pred, last, last_pts, last_pts_valid,
                             last_matched_pt, cur, 2.0 * th1, False)

    matched_mm, has_mm, Xw_mm, n_mm = jax.lax.cond(
        n_a < 20, retry, lambda _: (matched_a, has_a, Xw_a, n_a), None)

    obs = jnp.concatenate([cur.xy, cur.ur[:, None]], axis=-1)
    res_mm = pose_opt.optimize_pose(cam, T_pred, Xw_mm, obs, cur.level,
                                    has_mm, cfg.level_sigma2,
                                    use_pallas=cfg.use_pallas_effective)
    mm_ok = (res_mm.n_inliers >= 10) & (n_mm >= 20)
    matched_mm_final = jnp.where(res_mm.inliers & (matched_mm >= 0),
                                 matched_mm, INVALID)

    # --- reference-KF fallback (TrackReferenceKeyFrame) ---
    def ref_track(_):
        k = jnp.clip(ref_kf_in, 0, m.capacity_kf - 1)
        f_ok2 = m.kf_feat_valid[k] & (m.kf_obs[k] >= 0)
        mm2 = matching.search_by_node(
            jnp.where(cur.valid, 0, -1), cur.desc, cur.valid, cur.angle,
            jnp.where(f_ok2, 0, -1), m.kf_desc[k], f_ok2, m.kf_angle[k],
            nn_ratio=0.7, use_pallas=cfg.use_pallas_effective)
        tgt = m.kf_obs[k][jnp.clip(mm2.idx, 0, N - 1)]
        matched = jnp.where(mm2.valid & (tgt >= 0), tgt, INVALID)
        has = matched >= 0
        Xw = m.pt_pos[jnp.clip(matched, 0, m.capacity_pt - 1)]
        res = pose_opt.optimize_pose(cam, T_last, Xw, obs, cur.level, has,
                                     cfg.level_sigma2,
                                     use_pallas=cfg.use_pallas_effective)
        ok = (res.n_inliers >= 10) & (jnp.sum(has.astype(jnp.int32)) >= 15)
        return res.Tcw, jnp.where(res.inliers, matched, INVALID), ok

    Tcw_1, matched_1, ok_1 = jax.lax.cond(
        mm_ok,
        lambda _: (res_mm.Tcw, matched_mm_final, mm_ok),
        ref_track, None)

    # --- local map tracking ---
    local_kf, local_mask, ref_kf, local_pt, pt_mask = \
        tracking_ops.select_local_map(m, matched_1,
                                      max_kf=cfg.max_local_keyframes,
                                      max_pts=cfg.max_local_points)
    # reference search radius: th=1, widened to 3 for RGBD
    # (src/Tracking.cc:1804-1807; the post-reloc th=5 widening lives in the
    # host-side reloc rescue rounds)
    from ..utils.config import SENSOR_RGBD
    th_local = 3.0 if cfg.sensor == SENSOR_RGBD else 1.0
    Tcw_2, matched_2, n_local, vis_ids, fnd_ids = tracking_ops.track_local_map(
        cfg, m, Tcw_1, cur, matched_1, local_pt, pt_mask, th=th_local)
    m = tracking_ops.update_counters(m, vis_ids, matched_2, cfg)
    ok_2 = ok_1 & (n_local >= min_local_inliers)

    # --- keyframe statistics ---
    ref_matches, close_tracked, close_untracked = tracking_ops.keyframe_stats(
        cfg, m, ref_kf, cur, matched_2)

    # --- next-frame 3D points (UpdateLastFrame) ---
    pos = m.pt_pos[jnp.clip(matched_2, 0, m.capacity_pt - 1)]
    has_pt = matched_2 >= 0
    if cfg.sensor != SENSOR_MONOCULAR:
        z = jnp.maximum(cur.depth, 1e-6)
        x = (cur.xy[:, 0] - cam.cx) / cam.fx * z
        y = (cur.xy[:, 1] - cam.cy) / cam.fy * z
        pw = se3.apply(se3.inverse(Tcw_2), jnp.stack([x, y, z], -1))
        close = (cur.depth > 0) & (cur.depth < cfg.th_depth * cfg.baseline)
        temporal = close & ~has_pt & cur.valid
        pos = jnp.where(temporal[:, None], pw, pos)
        next_valid = has_pt | temporal
    else:
        next_valid = has_pt

    scalars = jnp.stack([
        ok_2.astype(jnp.int32), n_mm, res_mm.n_inliers, n_local,
        ref_matches, close_tracked, close_untracked,
        (~mm_ok).astype(jnp.int32), ref_kf.astype(jnp.int32),
        ok_1.astype(jnp.int32)])
    T_rel = Tcw_2 @ se3.inverse(m.kf_pose[jnp.clip(ref_kf, 0, m.capacity_kf - 1)])
    packed = jnp.concatenate([scalars.astype(jnp.float32),
                              Tcw_2.reshape(-1), T_rel.reshape(-1)])
    next_vel = velocity_step(Tcw_2, T_last)
    return TrackStepResult(m=m, frame=cur, Tcw=Tcw_2, T_rel=T_rel,
                           matched_pt=matched_2,
                           next_pts=pos, next_pts_valid=next_valid,
                           ref_kf=ref_kf, scalars=scalars, packed=packed,
                           next_vel=next_vel)
