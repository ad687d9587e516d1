"""Jitted building blocks of local mapping.

Device-side pieces of `LocalMapping::Run` (`src/LocalMapping.cc:71-159`):
keyframe insertion with depth-seeded point creation, recent-point culling,
epipolar triangulation of new points against covisible neighbors, two-way
fusion, local BA wiring, and keyframe culling. The reference runs these on
thread 2; here they are pure MapState -> MapState functions the System calls
in a deterministic staged schedule.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..mapstate import map as mapstate
from ..ops import matching
from ..solvers import schur_ba
from ..utils.config import SlamConfig, SENSOR_MONOCULAR
from .frame import FrameData

INVALID = -1


# ---------------------------------------------------------------------------
# Keyframe insertion (Tracking::CreateNewKeyFrame, src/Tracking.cc:1638-1739)
# ---------------------------------------------------------------------------

def _bump_counts(m: mapstate.MapState, point_ids, mask, weight):
    """Incrementally add observation weights to the cached pt_obs_cnt (one
    small N-sized scatter instead of recounting the K*N incidence)."""
    P = m.capacity_pt
    add = jnp.zeros((P,), jnp.int32).at[
        jnp.where(mask, point_ids, P)].add(jnp.where(mask, weight, 0),
                                           mode="drop")
    return m._replace(pt_obs_cnt=m.pt_obs_cnt + add)


@functools.partial(jax.jit, static_argnames=("cfg", "all_depth",
                                             "update_stats", "table_fresh"))
def insert_keyframe(cfg: SlamConfig, m: mapstate.MapState, cur: FrameData,
                    Tcw, matched_pt, frame_id, timestamp,
                    all_depth: bool = False, update_stats: bool = True,
                    table_fresh: bool = False):
    """Insert the current frame as a keyframe. matched_pt: (N,) map-point ids
    from tracking. For stereo/RGBD, unmatched features with depth spawn new
    map points: all closer than ThDepth*baseline, and if fewer than 100, the
    100 nearest (`src/Tracking.cc:1675-1739`). With all_depth (the
    StereoInitialization case, `src/Tracking.cc:774-860`) every depth
    measurement spawns a point."""
    cam = cfg.camera()
    # the tracked frame may be pipeline-depth frames old: resolve its
    # bindings through the fusion-forwarding chain and drop culled points
    # (CheckReplacedInLastFrame semantics at insertion time)
    P = m.capacity_pt
    fwd = jnp.where(matched_pt >= 0,
                    m.pt_forward[jnp.clip(matched_pt, 0, P - 1)], INVALID)
    matched_pt = jnp.where((fwd >= 0) & m.pt_valid[jnp.clip(fwd, 0, P - 1)],
                           fwd, INVALID)
    m, kf_id = mapstate.add_keyframe(
        m, Tcw, cur.xy, cur.level, cur.angle, cur.desc, cur.ur, cur.depth,
        cur.valid, matched_pt, frame_id, timestamp)

    if cfg.sensor != SENSOR_MONOCULAR:
        eligible = cur.valid & (cur.depth > 0) & (matched_pt < 0)
        close = cur.depth < cfg.th_depth * cfg.baseline
        depth_key = jnp.where(eligible, cur.depth, jnp.inf)
        order = jnp.argsort(depth_key)
        rank = jnp.zeros_like(matched_pt).at[order].set(
            jnp.arange(matched_pt.shape[0], dtype=jnp.int32))
        if all_depth:
            create = eligible
        else:
            create = eligible & (close | (rank < 100))

        # unproject via the undistorted coords + depth
        z = jnp.maximum(cur.depth, 1e-6)
        x = (cur.xy[:, 0] - cam.cx) / cam.fx * z
        y = (cur.xy[:, 1] - cam.cy) / cam.fy * z
        pc = jnp.stack([x, y, z], axis=-1)
        Twc = se3.inverse(Tcw)
        pw = se3.apply(Twc, pc)

        slots = mapstate.allocate_points(m, create)
        m = mapstate.add_points(m, slots, pw, cur.desc, kf_id, m.next_kf - 1)
        m = mapstate.bind_observations(m, kf_id, jnp.arange(matched_pt.shape[0]),
                                       slots, create & (slots >= 0))

    # table_fresh: the caller guarantees the cached obs table reflects every
    # keyframe except this one (keyframe_pass entry invariant) — covisibility
    # then reads it instead of sweeping the (K,N) incidence
    m = mapstate.update_connections(m, kf_id, use_table=table_fresh)
    # keep the cached counts current (weight +1 mono / +2 stereo per binding)
    bound = m.kf_obs[kf_id]
    w = jnp.where(m.kf_ur[kf_id] >= 0, 2, 1)
    m = _bump_counts(m, jnp.clip(bound, 0, m.capacity_pt - 1), bound >= 0, w)
    # ...and the cached table itself (incremental discipline: the mapping
    # pass no longer pays a full rebuild to absorb insertion binds)
    m = mapstate.table_append_keyframe(m, kf_id)
    if update_stats:
        # standalone use (initialization): refresh point stats + the cached
        # observation table now. Inside keyframe_pass this is skipped — the
        # mapping finale refreshes the same points post-fusion.
        mask = jnp.zeros((m.capacity_pt,), bool).at[
            jnp.where(bound >= 0, bound, m.capacity_pt)].set(True, mode="drop")
        obs = mapstate.point_observations(m, 16)
        m = mapstate.refresh_obs_table(m, obs=obs)
        m = mapstate.update_point_descriptors(m, mask, obs=obs)
        m = mapstate.update_point_normals(m, mask, cfg.scale_factors, obs=obs)
    return m, kf_id


# ---------------------------------------------------------------------------
# Map point culling (LocalMapping::MapPointCulling, src/LocalMapping.cc:245-289)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def cull_map_points(cfg: SlamConfig, m: mapstate.MapState, cur_kf=None):
    """Recently-created points must earn their keep: found/visible >= 0.25,
    and >= 2 (mono) / 3 (stereo) weighted observations once 2 keyframes have
    passed since creation. cur_kf: the just-inserted keyframe (its bindings
    postdate the cached observation table — swept directly)."""
    seq_now = m.next_kf - 1
    age = seq_now - m.pt_first_kf
    recent = m.pt_valid & (age <= 2)
    ratio = m.pt_found.astype(jnp.float32) / jnp.maximum(
        m.pt_visible.astype(jnp.float32), 1.0)
    cnt = m.pt_obs_cnt   # cached snapshot (maintained incrementally)
    th_obs = 2 if cfg.sensor == SENSOR_MONOCULAR else 3
    bad = recent & ((ratio < 0.25) | ((age >= 2) & (cnt <= th_obs)))
    if cur_kf is None:
        return mapstate.erase_points(m, bad)
    return mapstate.erase_points_fast(m, bad, extra_row=cur_kf)


# ---------------------------------------------------------------------------
# Triangulating new points (LocalMapping::CreateNewMapPoints,
# src/LocalMapping.cc:295-622)
# ---------------------------------------------------------------------------

def _fundamental_from_poses(cam, T1w, T2w):
    """F12 such that x2^T F12 x1 = 0... matching ComputeF12
    (`src/LocalMapping.cc:749-866`): F = K^-T [t12]x R12 K^-1."""
    T12 = se3.compose(T1w, se3.inverse(T2w))
    R12 = se3.rotation(T12)
    t12 = se3.translation(T12)
    K = jnp.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ se3.hat(t12) @ R12 @ Kinv


def _triangulate_decide(cfg: SlamConfig, m: mapstate.MapState, kf1, kf2,
                        max_new: int = 256, match=None):
    """Match/triangulate/check half of CreateNewMapPoints for ONE neighbor,
    with NO map mutation — vmappable across the covisible neighbor set.
    Returns (create (N,) bool, X (N,3) world points, i2 (N,) matched feature
    in kf2, best (N,) match distance).

    Epipolar-guided matching of UNBOUND features (the reference restricts via
    BoW buckets; here the full masked matrix with the epipolar test does the
    same job), then parallax-gated triangulation with the reference's checks:
    cheirality, reprojection chi2 (<5.991 sigma^2 mono / 7.815 stereo), and
    scale-ratio consistency (`src/LocalMapping.cc:399-622`)."""
    cam = cfg.camera()
    N = m.n_feat
    T1 = m.kf_pose[kf1]
    T2 = m.kf_pose[kf2]

    # baseline gate
    O1 = se3.translation(se3.inverse(T1))
    O2 = se3.translation(se3.inverse(T2))
    baseline = jnp.linalg.norm(O2 - O1)
    if cfg.sensor == SENSOR_MONOCULAR:
        # median scene depth of kf2 (ComputeSceneMedianDepth, q=2)
        obs2 = m.kf_obs[kf2]
        pos = m.pt_pos[jnp.clip(obs2, 0, m.capacity_pt - 1)]
        z2 = se3.apply(T2, pos)[:, 2]
        z2 = jnp.where(obs2 >= 0, z2, jnp.inf)
        z2s = jnp.sort(z2)
        nv = jnp.sum((obs2 >= 0).astype(jnp.int32))
        med = z2s[jnp.clip(nv // 2, 0, N - 1)]
        baseline_ok = baseline / jnp.maximum(med, 1e-9) > 0.01
    else:
        baseline_ok = baseline > cfg.baseline

    # candidates: valid, unbound features on both sides
    un1 = (m.kf_obs[kf1] < 0) & m.kf_feat_valid[kf1]
    xy1 = m.kf_xy[kf1]
    xy2 = m.kf_xy[kf2]
    sigma2 = jnp.asarray(cfg.level_sigma2, jnp.float32)
    lvl2 = jnp.clip(m.kf_level[kf2], 0, cfg.n_levels - 1)

    if match is not None:
        # epipolar gating + Hamming argmin already done in one fused Pallas
        # sweep across the whole neighbor batch (_epi_match_batch)
        best, best_idx = match
    else:
        F12 = _fundamental_from_poses(cam, T1, T2)
        un2 = (m.kf_obs[kf2] < 0) & m.kf_feat_valid[kf2]

        # epipolar distance of kp2 to line F12 [kp1;1]
        la = xy1[:, 0] * F12[0, 0] + xy1[:, 1] * F12[0, 1] + F12[0, 2]
        lb = xy1[:, 0] * F12[1, 0] + xy1[:, 1] * F12[1, 1] + F12[1, 2]
        lc = xy1[:, 0] * F12[2, 0] + xy1[:, 1] * F12[2, 1] + F12[2, 2]
        num = la[:, None] * xy2[None, :, 0] + lb[:, None] * xy2[None, :, 1] + lc[:, None]
        den = jnp.maximum(la * la + lb * lb, 1e-12)[:, None]
        dsqr = num * num / den
        epi_ok = dsqr < 3.84 * sigma2[lvl2][None, :]

        # also require the epipole not too close to kp2 (mono degenerate case)
        e2 = se3.apply(T2, O1)
        ex = cam.fx * e2[0] / jnp.maximum(e2[2], 1e-9) + cam.cx
        ey = cam.fy * e2[1] / jnp.maximum(e2[2], 1e-9) + cam.cy
        d_epi = (xy2[:, 0] - ex) ** 2 + (xy2[:, 1] - ey) ** 2
        sf2 = jnp.asarray(cfg.scale_factors, jnp.float32)[lvl2]
        epi_far = d_epi >= 100.0 * sf2
        cand = un1[:, None] & un2[None, :] & epi_ok & epi_far[None, :]

        # fused masked Hamming top-2 (Pallas on TPU): the XLA path writes and
        # re-reads the (N,N) distance matrix per NEIGHBOR of the vmapped batch
        best, best_idx, _ = matching.fused_best_two(
            m.kf_desc[kf1], m.kf_desc[kf2], cand, cfg.use_pallas_effective)
    accept = (best <= matching.TH_LOW) & un1
    accept = matching.rotation_consistency(
        m.kf_angle[kf1], m.kf_angle[kf2], accept, best_idx)
    keep = matching.resolve_conflicts(best_idx, best, accept, N)

    # --- triangulate matched pairs ---
    i2 = jnp.clip(best_idx, 0, N - 1)
    p1 = xy1
    p2 = xy2[i2]
    # rays in world frame
    K = jnp.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
    Kinv = jnp.linalg.inv(K)
    r1 = (jnp.concatenate([p1, jnp.ones((N, 1))], axis=-1) @ Kinv.T)
    r2 = (jnp.concatenate([p2, jnp.ones((N, 1))], axis=-1) @ Kinv.T)
    R1w, R2w = se3.rotation(T1), se3.rotation(T2)
    ray1 = r1 @ R1w  # = R1w^T r1
    ray2 = r2 @ R2w
    cos_par = jnp.sum(ray1 * ray2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1), 1e-12)

    # stereo parallax alternatives (reference uses atan2(b/2, depth))
    d1 = m.kf_depth[kf1]
    d2 = m.kf_depth[kf2][i2]
    cos_stereo1 = jnp.where(d1 > 0, jnp.cos(2 * jnp.arctan2(cfg.baseline / 2, jnp.maximum(d1, 1e-6))), 2.0)
    cos_stereo2 = jnp.where(d2 > 0, jnp.cos(2 * jnp.arctan2(cfg.baseline / 2, jnp.maximum(d2, 1e-6))), 2.0)
    cos_stereo = jnp.minimum(cos_stereo1, cos_stereo2)

    P1 = K @ T1[:3, :]
    P2 = K @ T2[:3, :]
    from ..geometry.triangulation import triangulate as dlt
    X_dlt = dlt(P1, P2, p1, p2)
    # fallback: unproject from the deeper-parallax stereo measurement
    z1s = jnp.maximum(d1, 1e-6)
    X_s1 = se3.apply(se3.inverse(T1), jnp.stack(
        [(p1[:, 0] - cam.cx) / cam.fx * z1s, (p1[:, 1] - cam.cy) / cam.fy * z1s, z1s], -1))
    z2s_ = jnp.maximum(d2, 1e-6)
    X_s2 = se3.apply(se3.inverse(T2), jnp.stack(
        [(p2[:, 0] - cam.cx) / cam.fx * z2s_, (p2[:, 1] - cam.cy) / cam.fy * z2s_, z2s_], -1))

    good_par = (cos_par > 0) & (cos_par < 0.9998) & (cos_par < cos_stereo)
    use_dlt = good_par
    use_s1 = ~good_par & (cos_stereo1 < cos_stereo2) & (d1 > 0)
    use_s2 = ~good_par & ~use_s1 & (d2 > 0)
    X = jnp.where(use_dlt[:, None], X_dlt,
                  jnp.where(use_s1[:, None], X_s1, X_s2))
    has_X = use_dlt | use_s1 | use_s2

    # cheirality + reprojection checks in both views
    def reproj_ok(T, p_obs, lvl, kf_ur, idx_side):
        pc = se3.apply(T, X)
        z = pc[:, 2]
        u = cam.fx * pc[:, 0] / jnp.maximum(z, 1e-9) + cam.cx
        v = cam.fy * pc[:, 1] / jnp.maximum(z, 1e-9) + cam.cy
        err = (u - p_obs[:, 0]) ** 2 + (v - p_obs[:, 1]) ** 2
        s2 = sigma2[jnp.clip(lvl, 0, cfg.n_levels - 1)]
        ok2d = err < 5.991 * s2
        # stereo obs: include uR residual with 7.8 threshold
        ur_pred = u - cam.bf / jnp.maximum(z, 1e-9)
        err3 = err + (ur_pred - kf_ur) ** 2
        ok3d = err3 < 7.8 * s2
        ok = jnp.where(kf_ur >= 0, ok3d, ok2d)
        return ok & (z > 0), z

    lvl1 = jnp.clip(m.kf_level[kf1], 0, cfg.n_levels - 1)
    ok1, z1w = reproj_ok(T1, p1, lvl1, m.kf_ur[kf1], 0)
    ok2, z2w = reproj_ok(T2, p2, lvl2[i2], m.kf_ur[kf2][i2], 1)

    # scale consistency (src/LocalMapping.cc:575-608)
    dist1 = jnp.linalg.norm(X - O1, axis=-1)
    dist2 = jnp.linalg.norm(X - O2, axis=-1)
    ratio_dist = dist2 / jnp.maximum(dist1, 1e-9)
    sf = jnp.asarray(cfg.scale_factors, jnp.float32)
    ratio_octave = sf[lvl1] / sf[lvl2[i2]]
    ratio_factor = 1.5 * cfg.scale_factor
    scale_ok = (ratio_dist * ratio_factor > ratio_octave) & \
        (ratio_dist < ratio_octave * ratio_factor)

    create = keep & has_X & ok1 & ok2 & scale_ok & baseline_ok & (dist1 > 0) & (dist2 > 0)

    # cap new points per neighbor to max_new by match quality
    order = jnp.argsort(jnp.where(create, best, 1 << 20))
    rank = jnp.zeros((N,), jnp.int32).at[order].set(jnp.arange(N, dtype=jnp.int32))
    create = create & (rank < max_new)
    return create, X, i2, best, cos_par


def _commit_new_points(cfg: SlamConfig, m: mapstate.MapState, kf1,
                       nb_ids, create, X, i2, best):
    """Allocate + write the winning triangulations in ONE batch.

    nb_ids: (B,) neighbor kf per candidate row; create/X/i2/best: (B, ...)
    stacked decide outputs flattened so that each kf1 FEATURE appears at most
    once (the caller dedups by winner) — B == N here. Binds kf1 feature i and
    neighbor feature i2, sets closed-form normals/scale bands, bumps counts."""
    N = m.n_feat
    K = m.capacity_kf
    slots = mapstate.allocate_points(m, create)
    m = mapstate.add_points(m, slots, X, m.kf_desc[kf1], kf1, m.next_kf - 1)
    okc = create & (slots >= 0)
    m = mapstate.bind_observations(m, kf1, jnp.arange(N), slots, okc)
    # neighbor-side binds: one masked 2D scatter (rows differ per winner)
    m = m._replace(kf_obs=m.kf_obs.at[
        jnp.where(okc, jnp.clip(nb_ids, 0, K - 1), K),
        jnp.where(okc, i2, 0)].set(slots, mode="drop"))
    w = jnp.where(m.kf_ur[kf1] >= 0, 2, 1) + \
        jnp.where(m.kf_ur[jnp.clip(nb_ids, 0, K - 1), i2] >= 0, 2, 1)
    m = _bump_counts(m, jnp.clip(slots, 0, m.capacity_pt - 1), okc, w)
    # cached-table rows of the new points: exactly the two creating
    # observations (rows were blanked by add_points; incremental discipline)
    sic = jnp.where(okc, slots, m.capacity_pt)
    kf1b = jnp.broadcast_to(jnp.asarray(kf1, jnp.int32), slots.shape)
    m = m._replace(
        obs_kf=m.obs_kf.at[sic, 0].set(kf1b, mode="drop")
                       .at[sic, 1].set(jnp.clip(nb_ids, 0, K - 1),
                                       mode="drop"),
        obs_ft=m.obs_ft.at[sic, 0].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop")
                       .at[sic, 1].set(i2, mode="drop"))

    # normal + scale band in closed form — both observations are known right
    # here, so the full point-major observation rebuild is unnecessary
    centers = se3.translation(se3.inverse(m.kf_pose))
    O1 = centers[kf1]
    O2 = centers[jnp.clip(nb_ids, 0, K - 1)]
    n1 = X - O1
    n2 = X - O2
    n1 = n1 / jnp.maximum(jnp.linalg.norm(n1, axis=-1, keepdims=True), 1e-9)
    n2 = n2 / jnp.maximum(jnp.linalg.norm(n2, axis=-1, keepdims=True), 1e-9)
    normal = 0.5 * (n1 + n2)
    sf = jnp.asarray(cfg.scale_factors, jnp.float32)
    lvl1 = jnp.clip(m.kf_level[kf1], 0, cfg.n_levels - 1)
    dist1 = jnp.linalg.norm(X - O1, axis=-1)
    max_dist = dist1 * sf[lvl1]
    min_dist = max_dist / sf[cfg.n_levels - 1]
    si = jnp.where(okc, slots, m.capacity_pt)
    m = m._replace(
        pt_normal=m.pt_normal.at[si].set(normal, mode="drop"),
        pt_max_dist=m.pt_max_dist.at[si].set(max_dist, mode="drop"),
        pt_min_dist=m.pt_min_dist.at[si].set(min_dist, mode="drop"))
    return m, jnp.sum(okc.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg", "max_new"))
def triangulate_with_neighbor(cfg: SlamConfig, m: mapstate.MapState,
                              kf1, kf2, max_new: int = 256):
    """Create new map points between keyframe kf1 (current) and covisible
    kf2 (single-neighbor form; the mapping pass uses the batched
    triangulate_batch)."""
    create, X, i2, best, _ = _triangulate_decide(cfg, m, kf1, kf2, max_new)
    nb = jnp.broadcast_to(jnp.asarray(kf2, jnp.int32), create.shape)
    return _commit_new_points(cfg, m, kf1, nb, create, X, i2, best)


def _epi_match_batch(cfg: SlamConfig, m: mapstate.MapState, kf1,
                     neighbor_ids, interpret: bool = False):
    """Epipolar-gated Hamming match of kf1 against the whole covisible
    neighbor batch in ONE fused Pallas sweep (pallas_kernels.
    epi_best_two_pallas): per-neighbor epipolar lines, unbound masks, and
    the epipole-distance gate are O(B*N) vectors computed here; the O(B*N^2)
    point-line test + distance argmin never touch HBM. Semantically equal to
    the per-neighbor cand + fused_best_two path of _triangulate_decide."""
    from ..ops import pallas_kernels as pk
    cam = cfg.camera()
    K = jnp.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
    kf2 = jnp.clip(jnp.maximum(neighbor_ids, 0), 0, m.capacity_kf - 1)
    T1 = m.kf_pose[kf1]
    T2b = m.kf_pose[kf2]
    F12b = jax.vmap(lambda T2: _fundamental_from_poses(cam, T1, T2))(T2b)
    xy1 = m.kf_xy[kf1]
    N = m.n_feat
    h1 = jnp.concatenate([xy1, jnp.ones((N, 1), xy1.dtype)], axis=-1)
    lines = jnp.einsum("bij,nj->bin", F12b, h1)          # (B, 3, N)
    un1 = (m.kf_obs[kf1] < 0) & m.kf_feat_valid[kf1]
    un2_b = (m.kf_obs[kf2] < 0) & m.kf_feat_valid[kf2]
    xy2_b = m.kf_xy[kf2]
    sigma2 = jnp.asarray(cfg.level_sigma2, jnp.float32)
    lvl2_b = jnp.clip(m.kf_level[kf2], 0, cfg.n_levels - 1)
    sig_b = 3.84 * sigma2[lvl2_b]
    O1 = se3.translation(se3.inverse(T1))
    e2b = jax.vmap(lambda T2: se3.apply(T2, O1[None, :])[0])(T2b)
    ex = cam.fx * e2b[:, 0] / jnp.maximum(e2b[:, 2], 1e-9) + cam.cx
    ey = cam.fy * e2b[:, 1] / jnp.maximum(e2b[:, 2], 1e-9) + cam.cy
    d_epi = (xy2_b[..., 0] - ex[:, None]) ** 2 + \
        (xy2_b[..., 1] - ey[:, None]) ** 2
    sf2 = jnp.asarray(cfg.scale_factors, jnp.float32)[lvl2_b]
    far_b = d_epi >= 100.0 * sf2
    return pk.epi_best_two_pallas(
        m.kf_desc[kf1], un1, lines[:, 0, :], lines[:, 1, :], lines[:, 2, :],
        m.kf_desc[kf2], xy2_b, un2_b, sig_b, far_b, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("cfg", "max_new"))
def triangulate_batch(cfg: SlamConfig, m: mapstate.MapState, kf1,
                      neighbor_ids, max_new: int = 256):
    """CreateNewMapPoints against ALL covisible neighbors in one batch: the
    per-neighbor decide phase is vmapped (the reference's sequential loop,
    `src/LocalMapping.cc:300-336`, became a 10-20-iteration lax.scan in
    round 2 — each iteration paying its own allocation sort and scatter
    writes); each kf1 feature then takes its best-scoring neighbor match
    (the sequential loop's first-come binding exclusion, resolved by match
    quality instead of covisibility order) and everything commits in ONE
    allocation + scatter round. neighbor_ids: (nn,), -1 padded.

    Winner rule: a kf1 feature proposed by several neighbors takes the FIRST
    in covisibility order — exactly the reference's sequential loop, which
    binds with the highest-covisibility neighbor first and skips the feature
    afterwards (src/LocalMapping.cc:300-336). A/B on the monocular circle:
    picking by best descriptor distance or by largest parallax instead
    produced measurably noisier points (wide-baseline matches triangulate
    wrong matches confidently) until tracking collapsed mid-sequence."""
    if cfg.use_pallas_effective and m.n_feat % 128 == 0 and m.n_feat <= 8192:
        best_all, idx_all = _epi_match_batch(cfg, m, kf1, neighbor_ids)
        decide = lambda nb, bb, ii: _triangulate_decide(
            cfg, m, kf1, jnp.maximum(nb, 0), max_new, match=(bb, ii))
        create_b, X_b, i2_b, best_b, cos_b = jax.vmap(decide)(
            neighbor_ids, best_all, idx_all)
    else:
        decide = lambda nb: _triangulate_decide(
            cfg, m, kf1, jnp.maximum(nb, 0), max_new)
        create_b, X_b, i2_b, best_b, cos_b = jax.vmap(decide)(neighbor_ids)
    create_b = create_b & (neighbor_ids >= 0)[:, None]
    N = m.n_feat
    winner = jnp.argmax(create_b, axis=0)   # first True = covis order
    rows = jnp.arange(N)
    create = create_b[winner, rows]
    X = X_b[winner, rows]
    i2 = i2_b[winner, rows]
    best = best_b[winner, rows]
    nb_ids = neighbor_ids[winner]
    return _commit_new_points(cfg, m, kf1, nb_ids, create, X, i2, best)


# ---------------------------------------------------------------------------
# Fusion (LocalMapping::SearchInNeighbors + ORBmatcher::Fuse,
# src/LocalMapping.cc:623-749, src/ORBmatcher.cc:1472-1740)
# ---------------------------------------------------------------------------

def _fuse_decide(cfg: SlamConfig, m: mapstate.MapState, cnt, kf_id, pt_ids,
                 pt_sel, use_pallas=None):
    """Match/decide half of ORBmatcher::Fuse without map mutation: project
    pt_ids into keyframe kf_id, match, and classify each hit as a bind (the
    keypoint is unbound) or a replacement pair. cnt: (P,) observation counts.
    Returns (feat_idx, bind_mask, src, tgt, both_mask, src_wins)."""
    cam = cfg.camera()
    Tcw = m.kf_pose[kf_id]
    pos = m.pt_pos[jnp.clip(pt_ids, 0, m.capacity_pt - 1)]
    pc = se3.apply(Tcw, pos)
    z = pc[:, 2]
    uv = jnp.stack([cam.fx * pc[:, 0] / jnp.maximum(z, 1e-6) + cam.cx,
                    cam.fy * pc[:, 1] / jnp.maximum(z, 1e-6) + cam.cy], axis=-1)
    Ow = se3.translation(se3.inverse(Tcw))
    po = pos - Ow
    dist3 = jnp.linalg.norm(po, axis=-1)
    normal = m.pt_normal[jnp.clip(pt_ids, 0, m.capacity_pt - 1)]
    view_cos = jnp.sum(po * normal, axis=-1) / jnp.maximum(dist3, 1e-9)
    max_d = m.pt_max_dist[jnp.clip(pt_ids, 0, m.capacity_pt - 1)]
    min_d = m.pt_min_dist[jnp.clip(pt_ids, 0, m.capacity_pt - 1)]
    valid = pt_sel & m.pt_valid[jnp.clip(pt_ids, 0, m.capacity_pt - 1)] & \
        (z > 0) & (uv[:, 0] >= 0) & (uv[:, 0] < cfg.width) & \
        (uv[:, 1] >= 0) & (uv[:, 1] < cfg.height) & \
        (dist3 >= 0.8 * min_d) & (dist3 <= 1.2 * max_d) & (view_cos > 0.5)
    # don't re-fuse points this KF already observes
    already = jnp.zeros((m.capacity_pt,), bool).at[
        jnp.where(m.kf_obs[kf_id] >= 0, m.kf_obs[kf_id], m.capacity_pt)
    ].set(True, mode="drop")
    valid = valid & ~already[jnp.clip(pt_ids, 0, m.capacity_pt - 1)]

    log_sf = math.log(cfg.scale_factor)
    ratio = max_d / jnp.maximum(dist3, 1e-9)
    pred_level = jnp.clip(
        jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_sf).astype(jnp.int32),
        0, cfg.n_levels - 1)
    ur_proj = jnp.where(cfg.bf > 0, uv[:, 0] - cam.bf / jnp.maximum(z, 1e-6), -1.0)

    mm = matching.search_by_projection_points(
        uv, pred_level, view_cos,
        m.pt_desc[jnp.clip(pt_ids, 0, m.capacity_pt - 1)], valid, ur_proj,
        m.kf_xy[kf_id], m.kf_level[kf_id], m.kf_desc[kf_id],
        m.kf_feat_valid[kf_id], m.kf_ur[kf_id],
        cfg.scale_factors, th=3.0, nn_ratio=1.0,
        use_pallas=cfg.use_pallas_effective if use_pallas is None else use_pallas)

    tgt_pt = m.kf_obs[kf_id][jnp.clip(mm.idx, 0, m.n_feat - 1)]
    src = jnp.clip(pt_ids, 0, m.capacity_pt - 1)
    # case A: keypoint already bound -> Replace the less-observed point
    both = mm.valid & (tgt_pt >= 0) & (tgt_pt != src)
    src_wins = cnt[src] > cnt[jnp.clip(tgt_pt, 0, m.capacity_pt - 1)]
    # case B: keypoint unbound -> bind source point
    bind = mm.valid & (tgt_pt < 0)
    return mm.idx, bind, src, tgt_pt, both, src_wins


def _fuse_mapping_update(mapping, src, tgt, both, src_wins, P):
    """Fold one decide round's replacement pairs into the (P,) mapping."""
    mapping = mapping.at[jnp.where(both & src_wins, tgt, P)].set(
        src, mode="drop")
    mapping = mapping.at[jnp.where(both & ~src_wins, src, P)].set(
        jnp.clip(tgt, 0, P - 1), mode="drop")
    return mapping


@functools.partial(jax.jit, static_argnames=("cfg",))
def fuse_into_keyframe(cfg: SlamConfig, m: mapstate.MapState, kf_id, pt_ids,
                       pt_sel):
    """Project the given map points into keyframe kf_id; for each good match:
    if the keypoint is bound to another point, keep the better-observed one
    (Replace); else bind the point. pt_ids: (B,) candidate ids; pt_sel: (B,).

    Standalone form (loop-closure SearchAndFuse): refreshes the cached
    observation table first so the replacement bookkeeping sees every
    binding, including ones a previous fuse round just made."""
    P = m.capacity_pt
    m = mapstate.refresh_obs_table(m)
    cnt = m.pt_obs_cnt
    idx, bind, src, tgt, both, src_wins = _fuse_decide(
        cfg, m, cnt, kf_id, pt_ids, pt_sel)
    mapping = _fuse_mapping_update(
        jnp.arange(P, dtype=jnp.int32), src, tgt, both, src_wins, P)
    m = mapstate.replace_points_fast(m, mapping)
    m = mapstate.bind_observations(m, kf_id, idx, src, bind)
    # a bind whose point lost a replacement duel in this same call would
    # dangle: mask by validity (the caller refreshes the table after its
    # last fuse round — each call's ENTRY refresh covers chains of calls)
    row = m.kf_obs[kf_id]
    row = jnp.where((row >= 0) & m.pt_valid[jnp.clip(row, 0, P - 1)],
                    row, INVALID)
    m = m._replace(kf_obs=m.kf_obs.at[kf_id].set(row))
    return m


# ---------------------------------------------------------------------------
# Local bundle adjustment wiring (Optimizer::LocalBundleAdjustment,
# src/Optimizer.cc:646-1067)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "n_local", "n_fixed", "max_pts", "max_obs"))
def local_ba(cfg: SlamConfig, m: mapstate.MapState, kf_id,
             n_local: int = 32, n_fixed: int = 32, max_pts: int = 4096,
             max_obs: int = 12, obs=None):
    """Build the local BA problem around kf_id and solve it.

    Local cameras = kf_id + covisible keyframes; fixed cameras = other
    observers of the local points; landmark slots capped at max_pts. Outlier
    observations (chi2 classification from the solver) are erased, matching
    the reference's post-BA cleanup."""
    cam = cfg.camera()
    K = m.capacity_kf
    C = n_local + n_fixed

    w = jnp.where(m.kf_valid, m.covis[kf_id], 0).at[kf_id].set(1 << 20)
    lw, local_kf = jax.lax.top_k(w, n_local)
    local_is = lw > 0                                    # (n_local,)
    is_local = jnp.zeros((K,), bool).at[
        jnp.where(local_is, local_kf, K)].set(True, mode="drop")

    # local points: union of local KF observations, capped
    rows = m.kf_obs[jnp.clip(local_kf, 0, K - 1)]
    rows = jnp.where(local_is[:, None], rows, INVALID)
    present = jnp.zeros((m.capacity_pt,), bool).at[
        jnp.where(rows.reshape(-1) >= 0, rows.reshape(-1), m.capacity_pt)
    ].set(True, mode="drop") & m.pt_valid
    sel_pt, sel_ok = mapstate.compact_mask(present, max_pts)

    # observations of selected points (reuse a precomputed wider table when
    # given — the per-(kf,feat)-ascending order makes a [:max_obs] slice
    # identical to recomputing at the narrower width)
    if obs is None:
        obs_kf, obs_ft, obs_on = mapstate.point_observations(m, max_obs=max_obs)
    else:
        obs_kf, obs_ft, obs_on = (o[:, :max_obs] for o in obs)
    okf = obs_kf[sel_pt]                                 # (Q,O)
    oft = obs_ft[sel_pt]
    oon = obs_on[sel_pt] & sel_ok[:, None]

    # fixed cameras: observers that are not local
    obs_is_local = is_local[jnp.clip(okf, 0, K - 1)] & oon
    fixed_need = jnp.zeros((K,), bool).at[
        jnp.where(oon & ~obs_is_local, okf, K)].set(True, mode="drop")
    fixed_need = fixed_need & m.kf_valid & ~is_local
    forder = jnp.argsort(~fixed_need, stable=True)
    fixed_kf = forder[:n_fixed]
    fixed_is = fixed_need[fixed_kf]

    # camera slot table: K -> slot in [0, C) or -1
    slot_of = jnp.full((K,), INVALID, jnp.int32)
    slot_of = slot_of.at[jnp.where(local_is, local_kf, K)].set(
        jnp.arange(n_local, dtype=jnp.int32), mode="drop")
    slot_of = slot_of.at[jnp.where(fixed_is, fixed_kf, K)].set(
        jnp.arange(n_local, n_local + n_fixed, dtype=jnp.int32), mode="drop")

    cam_ids = jnp.concatenate([local_kf, fixed_kf])
    cam_used = jnp.concatenate([local_is, fixed_is])
    cam_fixed = jnp.concatenate([jnp.zeros(n_local, bool), jnp.ones(n_fixed, bool)])
    # gauge: fix kf0-equivalent — the reference fixes KFs with id 0; we fix
    # the oldest local KF when there are no fixed observers
    any_fixed = jnp.any(cam_fixed & cam_used)
    oldest = jnp.argmin(jnp.where(
        cam_used & ~cam_fixed, m.kf_frame_id[jnp.clip(cam_ids, 0, K - 1)], 1 << 30))
    cam_fixed = cam_fixed.at[oldest].set(
        jnp.where(any_fixed, cam_fixed[oldest], True))
    # also always fix the very first keyframe if present (reference behavior)
    is_first = m.kf_frame_id[jnp.clip(cam_ids, 0, K - 1)] == 0
    cam_fixed = cam_fixed | (is_first & cam_used)

    poses = m.kf_pose[jnp.clip(cam_ids, 0, K - 1)]

    ocam = jnp.where(oon, slot_of[jnp.clip(okf, 0, K - 1)], INVALID)
    kfc = jnp.clip(okf, 0, K - 1)
    ftc = jnp.clip(oft, 0, m.n_feat - 1)
    xy = m.kf_xy[kfc, ftc]
    ur = m.kf_ur[kfc, ftc]
    lvl = m.kf_level[kfc, ftc]
    obs_uvr = jnp.concatenate([xy, ur[..., None]], axis=-1)

    prob = schur_ba.BAProblem(
        poses=poses, cam_valid=cam_used, cam_fixed=cam_fixed,
        points=m.pt_pos[sel_pt], pt_valid=sel_ok,
        obs_cam=ocam, obs_uvr=obs_uvr, obs_level=lvl)
    res = schur_ba.solve_ba(cam, prob, cfg.level_sigma2,
                            iters_a=cfg.ba_iters_a, iters_b=cfg.ba_iters_b,
                            use_pallas=cfg.use_pallas_effective)

    # write back poses + points
    wb = cam_used & ~cam_fixed
    m = m._replace(
        kf_pose=m.kf_pose.at[jnp.where(wb, cam_ids, K)].set(res.poses, mode="drop"),
        pt_pos=m.pt_pos.at[jnp.where(sel_ok, sel_pt, m.capacity_pt)].set(
            res.points, mode="drop"),
    )
    # erase outlier observations, then revalidate the affected points'
    # cached table rows in place (the pass-exit full rebuild is gone)
    outlier = (ocam >= 0) & ~res.edge_inlier
    m = m._replace(kf_obs=m.kf_obs.at[
        jnp.where(outlier, kfc, K), jnp.where(outlier, ftc, 0)
    ].set(INVALID, mode="drop"))
    aff = jnp.zeros((m.capacity_pt,), bool).at[
        jnp.where(jnp.any(outlier, axis=1), sel_pt, m.capacity_pt)
    ].set(True, mode="drop")
    m = mapstate.table_revalidate_points(m, aff)
    return m


# ---------------------------------------------------------------------------
# Fused per-keyframe mapping pass — ONE device dispatch per keyframe
# ---------------------------------------------------------------------------

def _fusion_targets(m: mapstate.MapState, kf_id, nn: int, cap: int):
    """Two-level neighbor set for SearchInNeighbors
    (`src/LocalMapping.cc:637-661`): the top-nn covisible keyframes plus 5 of
    each neighbor's best covisible neighbors, deduplicated, excluding kf_id,
    capped at `cap`. Returns (ids (cap,), valid (cap,))."""
    K = m.capacity_kf
    ids1, w1 = mapstate.covisible_keyframes(m, kf_id, nn)
    lvl1_ok = ids1 >= 0
    rows = m.covis[jnp.clip(ids1, 0, K - 1)]            # (nn,K)
    rows = jnp.where(lvl1_ok[:, None], rows, 0) * m.kf_valid[None, :]
    w2, ids2 = jax.lax.top_k(rows, 5)                   # (nn,5)
    lvl2_ok = (w2 > 0) & lvl1_ok[:, None]
    cand = jnp.concatenate([jnp.where(lvl1_ok, ids1, K),
                            jnp.where(lvl2_ok, ids2, K).reshape(-1)])
    cand = jnp.where(cand == kf_id, K, cand)            # exclude self
    # first-occurrence dedup
    T0 = cand.shape[0]
    idx = jnp.arange(T0, dtype=jnp.int32)
    first = jnp.full((K + 1,), T0, jnp.int32).at[cand].min(idx)
    keep = (cand < K) & (first[cand] == idx)
    order = jnp.argsort(~keep, stable=True)[:cap]
    return jnp.where(keep[order], cand[order], INVALID), keep[order]


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def mapping_pass(cfg: SlamConfig, m: mapstate.MapState, kf_id):
    """The complete local-mapping work for one new keyframe, fused into one
    jitted call (the reference's LocalMapping thread iteration,
    `src/LocalMapping.cc:71-159`): map-point culling, triangulation against
    the top covisible neighbors (lax.scan), two-way fusion with the two-level
    neighbor set, point-stat refresh, local BA, and keyframe culling. The
    host previously sequenced ~45 separate dispatches per keyframe — each a
    tunnel round trip — for the same math.

    Returns (m, culled_mask (K,)).

    Observation-table discipline: the table is CLEAN at pass entry (every
    pass exits through a rebuild). Within the pass it goes stale exactly
    where noted — insert/triangulation binds (rebuilt before fusion),
    fusion-phase binds (redirected through the final replacement mapping),
    BA outlier erasures and keyframe culling (covered by the exit rebuild)."""
    m = cull_map_points(cfg, m, cur_kf=kf_id)

    nn = 20 if cfg.sensor == SENSOR_MONOCULAR else 10
    ids, _ = mapstate.covisible_keyframes(m, kf_id, nn)
    m, _ = triangulate_batch(cfg, m, kf_id, ids)
    # no table rebuild here (round 5): insertion appends its bindings and
    # triangulation writes its two observations per new point directly, so
    # fusion's replacement bookkeeping reads a current table already

    # fuse with the two-level neighbor set, both directions
    # (SearchInNeighbors: current points -> each target KF, then the union
    # of all target KFs' points -> current KF). All match/decide rounds run
    # against ONE map snapshot, accumulating binds (disjoint keyframe rows)
    # and a single (P,) replacement mapping that is applied ONCE at the end —
    # the sequential per-target replace_points materialized a (K,P) dedup
    # matrix ~30x per keyframe and dominated the mapping-pass device time.
    tgt_ids, tgt_ok = _fusion_targets(m, kf_id, nn, cap=3 * nn)
    cur_pts = m.kf_obs[kf_id]
    P = m.capacity_pt
    cnt = m.pt_obs_cnt   # cached snapshot (kept current by insert/triangulate)

    # Sequential decide rounds per target (the reference's SearchInNeighbors
    # order). A chunk-vmapped batch was tried (saves ~40 ms/keyframe): the
    # decides are snapshot-identical, but the flattened replacement-mapping
    # composition measurably degraded monocular maps until tracking lost —
    # the sequential fold stays until the duel composition is made
    # order-independent.
    def fuse_body(carry, nb):
        kf_obs, mapping = carry

        def run(args):
            kf_obs, mapping = args
            nbs = jnp.maximum(nb, 0)
            mloc = m._replace(kf_obs=kf_obs)
            idx, bind, src, tgt, both, src_wins = _fuse_decide(
                cfg, mloc, cnt, nbs, cur_pts, cur_pts >= 0)
            mapping = _fuse_mapping_update(mapping, src, tgt, both,
                                           src_wins, P)
            row = kf_obs[nbs]
            row = row.at[jnp.where(bind, idx, m.n_feat)].set(src, mode="drop")
            return kf_obs.at[nbs].set(row), mapping

        carry = jax.lax.cond(nb >= 0, run, lambda a: a, (kf_obs, mapping))
        return carry, ()

    mapping0 = jnp.arange(P, dtype=jnp.int32)
    (kf_obs, mapping), _ = jax.lax.scan(fuse_body, (m.kf_obs, mapping0),
                                        tgt_ids)
    m = m._replace(kf_obs=kf_obs)

    # union of target KFs' points (vpFuseCandidates) -> fuse into current
    rows = m.kf_obs[jnp.clip(tgt_ids, 0, m.capacity_kf - 1)]
    rows = jnp.where((tgt_ids >= 0)[:, None], rows, INVALID).reshape(-1)
    present = jnp.zeros((P,), bool).at[
        jnp.where(rows >= 0, rows, P)].set(True, mode="drop")
    fuse_pts, fuse_ok = mapstate.compact_mask(present, cfg.max_local_points)
    idx, bind, src, tgt, both, src_wins = _fuse_decide(
        cfg, m, cnt, kf_id, fuse_pts, fuse_ok)
    mapping = _fuse_mapping_update(mapping, src, tgt, both, src_wins, P)
    m = mapstate.bind_observations(m, kf_id, idx, src, bind)

    # resolve replacement chains (a->b, b->c => a->c), then apply once
    mapping = mapping[mapping]
    mapping = mapping[mapping]
    m = mapstate.replace_points_fast(m, mapping)
    # fusion-phase binds postdate the table replace_points_fast patched:
    # redirect the touched rows (fusion targets + the current KF) through
    # the final mapping so no row keeps a replaced id
    touched = jnp.concatenate([jnp.clip(tgt_ids, 0, m.capacity_kf - 1),
                               jnp.asarray(kf_id, jnp.int32)[None]])
    rows = m.kf_obs[touched]
    rows = jnp.where(rows >= 0, mapping[jnp.clip(rows, 0, P - 1)], INVALID)
    rows = jnp.where(m.pt_valid[jnp.clip(rows, 0, P - 1)] & (rows >= 0),
                     rows, INVALID)
    m = m._replace(kf_obs=m.kf_obs.at[touched].set(rows))

    # refresh point stats after fusion — ONE shared observation rebuild for
    # descriptors/normals, the cached counts, local BA wiring AND keyframe
    # culling (each previously rebuilt its own point-major view: 3-4 K*N
    # sorts+scatters per keyframe event)
    bound = m.kf_obs[kf_id]
    pmask = jnp.zeros((P,), bool).at[
        jnp.where(bound >= 0, bound, P)].set(True, mode="drop")
    obs = mapstate.point_observations(m, 16)
    m = mapstate.refresh_obs_table(m, obs=obs)
    m = mapstate.update_point_descriptors(m, pmask, obs=obs)
    m = mapstate.update_point_normals(m, pmask, cfg.scale_factors, obs=obs)
    m = mapstate.update_connections(m, kf_id, use_table=True)

    def ba_and_cull(m):
        m = local_ba(cfg, m, kf_id,
                     n_local=cfg.ba_local_cams, n_fixed=cfg.ba_fixed_cams,
                     max_pts=cfg.ba_max_points, max_obs=cfg.ba_max_obs,
                     obs=obs)
        # culling reuses the pre-BA table: BA's outlier erasures are a
        # handful of observations — redundancy counts tolerate it
        m, culled = cull_keyframes(cfg, m, kf_id, obs=obs)
        # a fired cull orphans every table entry naming the culled keyframe
        # (and frees its slot for reuse): full rebuild, paid only when it
        # actually happens. With no cull, local_ba's in-place revalidation
        # already left the table clean — the pass-exit invariant holds
        # without the unconditional ~31 ms rebuild (PERF.md r5).
        m = jax.lax.cond(jnp.any(culled), mapstate.refresh_obs_table,
                         lambda m: m, m)
        return m, culled

    m, culled = jax.lax.cond(
        m.n_keyframes > 2, ba_and_cull,
        lambda m: (m, jnp.zeros((m.capacity_kf,), bool)), m)
    return m, culled


# ---------------------------------------------------------------------------
# Keyframe event: insertion + the whole mapping pass, ONE dispatch
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def keyframe_pass(cfg: SlamConfig, m: mapstate.MapState, cur: FrameData,
                  Tcw, matched_pt, frame_id, timestamp):
    """CreateNewKeyFrame + the complete LocalMapping iteration fused into a
    single device dispatch, with a packed int32 summary so the host reads
    everything it needs about the event in ONE transfer:

      summary = [kf_id, n_keyframes, next_kf, any_culled]

    Returns (m, culled (K,) bool, summary (4,) i32). The culled mask is only
    transferred when summary says any_culled (keyframe culling is rare)."""
    m, kf_id = insert_keyframe(cfg, m, cur, Tcw, matched_pt, frame_id,
                               timestamp, update_stats=False,
                               table_fresh=True)
    m, culled = mapping_pass(cfg, m, kf_id)
    summary = jnp.stack([
        jnp.asarray(kf_id, jnp.int32), m.n_keyframes, m.next_kf,
        jnp.any(culled).astype(jnp.int32)])
    return m, culled, summary


# ---------------------------------------------------------------------------
# Keyframe culling (LocalMapping::KeyFrameCulling, src/LocalMapping.cc:868-963)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "max_obs", "max_cand"))
def cull_keyframes(cfg: SlamConfig, m: mapstate.MapState, kf_id,
                   max_obs: int = 12, max_cand: int = 32, obs=None):
    """A covisible keyframe of kf_id is redundant if >=90% of its points are
    seen by >=3 other keyframes at the same or finer scale. The first
    keyframe is never culled. Returns (map, culled_mask (K,)).

    Only the top-`max_cand` covisible keyframes are evaluated (the reference
    also only checks GetVectorCovisibleKeyFrames of the new KF,
    src/LocalMapping.cc:875; evaluating all K slots gathered ~25M elements
    per pass). obs: optional precomputed point_observations table to reuse
    (its width may exceed max_obs; sliced)."""
    K = m.capacity_kf
    if obs is None:
        # standalone use: build the view (and true counts) fresh
        obs = mapstate.point_observations(m, max_obs=max_obs)
        obs_kf, obs_ft, obs_on = obs
    else:
        obs_kf, obs_ft, obs_on = (o[:, :max_obs] for o in obs)
    kfc = jnp.clip(obs_kf, 0, K - 1)
    ftc = jnp.clip(obs_ft, 0, m.n_feat - 1)
    levels = jnp.where(obs_on, m.kf_level[kfc, ftc], 1 << 10)   # (P,O)
    cnt = mapstate.obs_table_counts(m, (obs_kf, obs_ft, obs_on))
    # per-point cumulative level histogram: cnt_le[p, l] = observations at
    # octave <= l. The per-candidate redundancy check below then gathers ONE
    # scalar per (candidate, feature) instead of the full (N, O) obs rows —
    # the vmapped row gathers were ~25 ms/pass at 32 candidates (PERF.md r5)
    n_lv = len(cfg.scale_factors)
    cnt_le = jnp.stack(
        [jnp.sum((levels <= l).astype(jnp.int32), axis=1)
         for l in range(n_lv)], axis=1)                          # (P,L)

    first_fid = jnp.min(jnp.where(m.kf_valid, m.kf_frame_id, 1 << 30))
    candidates = (m.covis[kf_id] > 0) & m.kf_valid & (m.kf_frame_id > first_fid)
    # keyframes holding a persisted loop edge are never erased (the
    # reference's mbNotErase/mspLoopEdges guard, src/KeyFrame.cc:591-649)
    candidates &= ~mapstate.loop_protected_keyframes(m)

    cw, cand_ids = jax.lax.top_k(jnp.where(candidates, m.covis[kf_id], 0),
                                 min(max_cand, K))
    cand_ok = cw > 0

    def redundancy(k):
        row = m.kf_obs[k]                                # (N,)
        pt = jnp.clip(row, 0, m.capacity_pt - 1)
        mine = (row >= 0) & (cnt[pt] >= 3)
        my_level = m.kf_level[k]
        # observations of these points by other KFs at level <= mine+1:
        # the cumulative histogram includes this KF's own observation
        # (always <= my_level+1), so subtract 1. A point whose own entry
        # was truncated out of the table loses one count here — strictly
        # conservative (less culling), and only possible above max_obs
        # observations where the point is redundant regardless.
        lv1 = jnp.clip(my_level + 1, 0, n_lv - 1)
        n_others = cnt_le[pt, lv1] - 1
        redundant = mine & (n_others >= 3)
        nm = jnp.sum(mine.astype(jnp.int32))
        return jnp.sum(redundant.astype(jnp.int32)), nm

    red_c, tot_c = jax.vmap(redundancy)(jnp.clip(cand_ids, 0, K - 1))
    cull_c = cand_ok & (red_c.astype(jnp.float32) >
                        0.9 * tot_c.astype(jnp.float32)) & (tot_c > 0)
    cull = jnp.zeros((K,), bool).at[
        jnp.where(cull_c, cand_ids, K)].set(True, mode="drop") & candidates

    # erase culled keyframes: clear obs, covis, validity; reparent children
    def apply_cull(m):
        obs_cleared = jnp.where(cull[:, None], INVALID, m.kf_obs)
        covis = jnp.where(cull[:, None] | cull[None, :], 0, m.covis)
        new_parent = m.parent
        parent_culled = cull[jnp.clip(m.parent, 0, K - 1)] & (m.parent >= 0)
        grand = m.parent[jnp.clip(m.parent, 0, K - 1)]
        new_parent = jnp.where(parent_culled, grand, new_parent)
        # decrement cached counts for the cleared observations (masked K*N
        # scatter — only paid when a cull actually fires)
        gone = cull[:, None] & (m.kf_obs >= 0)
        w = jnp.where(m.kf_ur >= 0, 2, 1)
        dec = jnp.zeros((m.capacity_pt,), jnp.int32).at[
            jnp.where(gone, m.kf_obs, m.capacity_pt).reshape(-1)
        ].add(jnp.where(gone, w, 0).reshape(-1), mode="drop")
        return m._replace(kf_obs=obs_cleared, covis=covis,
                          kf_valid=m.kf_valid & ~cull, parent=new_parent,
                          pt_obs_cnt=m.pt_obs_cnt - dec)

    m = jax.lax.cond(jnp.any(cull), apply_cull, lambda m: m, m)
    return m, cull
