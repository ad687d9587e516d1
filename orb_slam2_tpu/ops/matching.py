"""Descriptor matching kernels — dense, masked, fixed-shape.

TPU-native replacement for ORBmatcher (`src/ORBmatcher.cc`). The reference
avoids O(N*M) work on CPU via a 64x48 feature grid and BoW buckets; at
N,M <= 4096 a full masked Hamming matrix (XOR + popcount over 8 uint32 words)
is a few MFLOP-equivalents on the VPU, so every search variant here is one
distance matrix + candidate mask + (best, second-best) reduction. The grid
and the FeatureVector buckets disappear entirely.

Thresholds: TH_HIGH=100, TH_LOW=50, HISTO_LENGTH=30 (`src/ORBmatcher.cc:56-58`).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

TH_HIGH = 100
TH_LOW = 50
HISTO_LENGTH = 30
BIG = 512  # > max possible Hamming distance (256)


def hamming_matrix(desc_a, desc_b):
    """(N,8) uint32 x (M,8) uint32 -> (N,M) int32 Hamming distances.

    Replaces `ORBmatcher::DescriptorDistance` (`src/ORBmatcher.cc:2123-2143`)
    in batched form: one XOR + population_count per word pair.
    """
    x = jnp.bitwise_xor(desc_a[:, None, :], desc_b[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def best_two(dist, cand_mask):
    """Per row of (N,M): best and second-best distances + best index among
    candidates. Masked-out entries count as BIG."""
    d = jnp.where(cand_mask, dist, BIG)
    best = jnp.min(d, axis=1)
    best_idx = jnp.argmin(d, axis=1)
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(BIG)
    second = jnp.min(d2, axis=1)
    return best, best_idx, second


def fused_best_two(desc_a, desc_b, cand_mask, use_pallas: bool = False):
    """Hamming + masked top-2 in one step. With use_pallas (TPU backends),
    runs the fused VMEM kernel (ops/pallas_kernels.py) that never writes the
    (N,M) distance matrix to HBM; otherwise the XLA path."""
    if use_pallas and desc_b.shape[0] <= 8192:
        from .pallas_kernels import masked_best_two_pallas

        return masked_best_two_pallas(desc_a, desc_b, cand_mask)
    return best_two(hamming_matrix(desc_a, desc_b), cand_mask)


def resolve_conflicts(best_idx, best_dist, accept, n_targets):
    """Keep, for each target, only the accepted source with minimal distance.

    Mirrors the reference's overwrite-previous-match behavior (e.g.
    `SearchForInitialization`'s vnMatches21 bookkeeping,
    `src/ORBmatcher.cc:700-720`) deterministically: lowest distance wins,
    ties -> lowest source index.
    """
    n = best_idx.shape[0]
    key = jnp.where(accept, best_dist * n + jnp.arange(n), BIG * n + n)
    target_best = jnp.full((n_targets,), BIG * n + n, dtype=key.dtype).at[best_idx].min(key)
    keep = accept & (key == target_best[best_idx])
    return keep


def rotation_consistency(angle_src, angle_dst, matched_mask, best_idx):
    """Keep matches whose angle difference falls in the 3 dominant bins of a
    30-bin rotation histogram (`ORBmatcher::ComputeThreeMaxima`,
    `src/ORBmatcher.cc:2076-2118`, incl. the <0.1x pruning of bins 2,3)."""
    rot = angle_src - angle_dst[best_idx]
    rot = jnp.where(rot < 0, rot + 360.0, rot)
    factor = 1.0 / (360.0 / HISTO_LENGTH)
    bin_ = jnp.round(rot * factor).astype(jnp.int32)
    bin_ = jnp.where(bin_ == HISTO_LENGTH, 0, bin_)
    counts = jnp.zeros((HISTO_LENGTH,), jnp.int32).at[bin_].add(matched_mask.astype(jnp.int32))
    top3_val, top3_idx = jax.lax.top_k(counts, 3)
    keep_bin = jnp.zeros((HISTO_LENGTH,), bool)
    keep_bin = keep_bin.at[top3_idx[0]].set(True)
    keep_bin = keep_bin.at[top3_idx[1]].set(top3_val[1] >= 0.1 * top3_val[0])
    keep_bin = keep_bin.at[top3_idx[2]].set(top3_val[2] >= 0.1 * top3_val[0])
    return matched_mask & keep_bin[bin_]


class Matches(NamedTuple):
    """Fixed-shape match result: for each of N sources, a target index and a
    validity flag."""
    idx: jnp.ndarray    # (N,) int32 into targets
    dist: jnp.ndarray   # (N,) int32
    valid: jnp.ndarray  # (N,) bool


def search_by_projection_points(
    uv, pred_level, view_cos, point_desc, point_valid, point_ur,
    kp_xy, kp_level, kp_desc, kp_valid, kp_ur,
    scale_factors, th: float, nn_ratio: float = 0.8,
    already_matched=None, use_pallas: bool = False,
):
    """Local-map point -> current frame search
    (`ORBmatcher::SearchByProjection(Frame&, vector<MapPoint*>&, th)`,
    `src/ORBmatcher.cc:78-191`).

    uv: (P,2) projected pixel coords of map points; pred_level: (P,) predicted
    octave; view_cos: (P,); point_ur: (P,) projected right-x or -1;
    kp_ur: (N,) frame keypoint right-x or -1. Returns Matches over P sources.

    With use_pallas (TPU), the candidate mask, Hamming distances and the
    level-aware best/second reduction run in ONE fused VMEM kernel — the XLA
    path writes several (P,N) intermediates through HBM.
    """
    sf = jnp.asarray(scale_factors)
    r = jnp.where(view_cos > 0.998, 2.5, 4.0) * th
    radius = r * sf[jnp.clip(pred_level, 0, sf.shape[0] - 1)]        # (P,)
    kv = kp_valid if already_matched is None else kp_valid & ~already_matched

    if use_pallas and kp_xy.shape[0] <= 8192:
        from .pallas_kernels import projection_best_two_pallas

        best, best_idx, second_same_lvl = projection_best_two_pallas(
            uv, radius, pred_level, point_ur, point_valid, point_desc,
            kp_xy, kp_level, kp_ur, kv, kp_desc)
    else:
        # Chebyshev window like GetFeaturesInArea uses a square window
        win = (jnp.abs(uv[:, None, 0] - kp_xy[None, :, 0]) < radius[:, None]) & (
            jnp.abs(uv[:, None, 1] - kp_xy[None, :, 1]) < radius[:, None]
        )
        lvl_ok = (kp_level[None, :] >= pred_level[:, None] - 1) & (
            kp_level[None, :] <= pred_level[:, None]
        )
        stereo_ok = jnp.where(
            (point_ur[:, None] >= 0) & (kp_ur[None, :] >= 0),
            jnp.abs(point_ur[:, None] - kp_ur[None, :]) < radius[:, None],
            True,
        )
        cand = win & lvl_ok & stereo_ok & point_valid[:, None] & kv[None, :]

        dist = hamming_matrix(point_desc, kp_desc)
        best, best_idx, _ = best_two(dist, cand)

        # level-aware second best: only keypoints sharing the best's octave
        best_lvl = kp_level[best_idx]
        d_masked = jnp.where(cand, dist, BIG)
        same_lvl = jnp.where(kp_level[None, :] == best_lvl[:, None],
                             d_masked, BIG)
        same_lvl = same_lvl.at[jnp.arange(dist.shape[0]), best_idx].set(BIG)
        second_same_lvl = jnp.min(same_lvl, axis=1)

    # ratio test only fires when a second candidate shares the best's level
    ratio_ok = jnp.where(
        second_same_lvl < BIG, best <= nn_ratio * second_same_lvl, True
    )
    accept = (best <= TH_HIGH) & ratio_ok & point_valid
    keep = resolve_conflicts(best_idx, best, accept, kp_xy.shape[0])
    return Matches(best_idx.astype(jnp.int32), best, keep)


def search_by_projection_reloc(
    uv, pred_level, point_desc, point_valid, point_angle,
    kp_xy, kp_level, kp_desc, kp_valid, kp_angle, already_matched,
    scale_factors, th: float, orb_dist: int, check_rotation: bool = True,
):
    """Relocalization rescue search (`ORBmatcher::SearchByProjection(Frame&,
    KeyFrame*, set&, th, ORBdist)`, `src/ORBmatcher.cc:1922-2075`): project
    the candidate keyframe's map points at the current pose estimate; square
    window th*scale(predicted level), candidate octaves [pred-1, pred+1],
    accept at distance <= ORBdist (100 wide round / 64 narrow round), rotation
    histogram vs the keyframe's keypoint angles; no best/second ratio test.

    uv: (P,2) projections; point_angle: (P,) the point's keypoint angle in the
    candidate KF; already_matched: (N,) keypoints already bound to a point.
    """
    sf = jnp.asarray(scale_factors)
    radius = th * sf[jnp.clip(pred_level, 0, sf.shape[0] - 1)]
    win = (jnp.abs(uv[:, None, 0] - kp_xy[None, :, 0]) < radius[:, None]) & (
        jnp.abs(uv[:, None, 1] - kp_xy[None, :, 1]) < radius[:, None]
    )
    lvl_ok = (kp_level[None, :] >= pred_level[:, None] - 1) & (
        kp_level[None, :] <= pred_level[:, None] + 1
    )
    cand = (win & lvl_ok & point_valid[:, None] & kp_valid[None, :]
            & (~already_matched)[None, :])
    dist = hamming_matrix(point_desc, kp_desc)
    best, best_idx, _ = best_two(dist, cand)
    accept = (best <= orb_dist) & point_valid
    if check_rotation:
        accept = rotation_consistency(point_angle, kp_angle, accept, best_idx)
    keep = resolve_conflicts(best_idx, best, accept, kp_xy.shape[0])
    return Matches(best_idx.astype(jnp.int32), best, keep)


def search_by_projection_frame(
    uv, src_level, src_desc, src_valid, src_angle, src_ur,
    kp_xy, kp_level, kp_desc, kp_valid, kp_angle, kp_ur,
    scale_factors, th: float, forward: bool, backward: bool,
    check_rotation: bool = True, use_pallas: bool = False,
):
    """Last-frame -> current-frame projection search for the motion model
    (`ORBmatcher::SearchByProjection(Frame&, Frame&, th, bMono)`,
    `src/ORBmatcher.cc:1741-1921`). Search radius th*scale(src level); the
    candidate octave window follows the forward/backward camera motion rule.
    """
    sf = jnp.asarray(scale_factors)
    radius = th * sf[jnp.clip(src_level, 0, sf.shape[0] - 1)]

    win = (jnp.abs(uv[:, None, 0] - kp_xy[None, :, 0]) < radius[:, None]) & (
        jnp.abs(uv[:, None, 1] - kp_xy[None, :, 1]) < radius[:, None]
    )
    if forward:
        lvl_ok = kp_level[None, :] >= src_level[:, None]
    elif backward:
        lvl_ok = kp_level[None, :] <= src_level[:, None]
    else:
        lvl_ok = (kp_level[None, :] >= src_level[:, None] - 1) & (
            kp_level[None, :] <= src_level[:, None] + 1
        )
    stereo_ok = jnp.where(
        (src_ur[:, None] >= 0) & (kp_ur[None, :] >= 0),
        jnp.abs(src_ur[:, None] - kp_ur[None, :]) < radius[:, None],
        True,
    )
    cand = win & lvl_ok & stereo_ok & src_valid[:, None] & kp_valid[None, :]

    best, best_idx, _ = fused_best_two(src_desc, kp_desc, cand, use_pallas)
    accept = (best <= TH_HIGH) & src_valid
    if check_rotation:
        accept = rotation_consistency(src_angle, kp_angle, accept, best_idx)
    keep = resolve_conflicts(best_idx, best, accept, kp_xy.shape[0])
    return Matches(best_idx.astype(jnp.int32), best, keep)


def search_for_initialization(
    kp1_xy, kp1_level, kp1_desc, kp1_valid, kp1_angle,
    kp2_xy, kp2_level, kp2_desc, kp2_valid, kp2_angle,
    window: float = 100.0, nn_ratio: float = 0.9, check_rotation: bool = True,
):
    """Monocular-initialization wide-window search
    (`ORBmatcher::SearchForInitialization`, `src/ORBmatcher.cc:580-759`):
    level-0 only, TH_LOW, best/second ratio, rotation histogram."""
    win = (jnp.abs(kp1_xy[:, None, 0] - kp2_xy[None, :, 0]) < window) & (
        jnp.abs(kp1_xy[:, None, 1] - kp2_xy[None, :, 1]) < window
    )
    lvl_ok = (kp1_level[:, None] == 0) & (kp2_level[None, :] == 0)
    cand = win & lvl_ok & kp1_valid[:, None] & kp2_valid[None, :]

    dist = hamming_matrix(kp1_desc, kp2_desc)
    best, best_idx, second = best_two(dist, cand)
    accept = (best <= TH_LOW) & (best < nn_ratio * second) & kp1_valid
    if check_rotation:
        accept = rotation_consistency(kp1_angle, kp2_angle, accept, best_idx)
    keep = resolve_conflicts(best_idx, best, accept, kp2_xy.shape[0])
    return Matches(best_idx.astype(jnp.int32), best, keep)


def search_by_sim3(
    pc1, uv1, lvl1, desc1, valid1,
    pc2, uv2, lvl2, desc2, valid2,
    g12, scale_factors, fx: float, fy: float, cx: float, cy: float,
    th: float = 7.5, max_dist: int = TH_HIGH,
):
    """Guided mutual Sim3 search (`ORBmatcher::SearchBySim3`,
    `src/ORBmatcher.cc:1139-1320`): project KF2's points into KF1's image via
    g12 and KF1's into KF2 via g12^-1, window th*scale per source feature,
    accept pairs where both directions pick each other at distance <= TH_HIGH.

    pc1/pc2: (N,3) bound map points in each camera frame; uv1/uv2 their
    keypoint pixels; g12 maps cam-2 points into cam 1. Returns Matches over
    KF1 features (idx into KF2 features)."""
    from ..geometry import sim3 as sim3_mod

    sf = jnp.asarray(scale_factors)

    def project(p):
        z = jnp.maximum(p[..., 2], 1e-9)
        return jnp.stack([fx * p[..., 0] / z + cx,
                          fy * p[..., 1] / z + cy], axis=-1), p[..., 2]

    uv2in1, z21 = project(sim3_mod.apply(g12, pc2))        # (N2,2)
    uv1in2, z12 = project(sim3_mod.apply(sim3_mod.inverse(g12), pc1))
    r2 = th * sf[jnp.clip(lvl2, 0, sf.shape[0] - 1)]       # window for 2->1
    r1 = th * sf[jnp.clip(lvl1, 0, sf.shape[0] - 1)]

    # direction 2->1: candidate KF1 keypoints near each projected KF2 point
    win21 = (jnp.abs(uv2in1[:, None, 0] - uv1[None, :, 0]) < r2[:, None]) & (
        jnp.abs(uv2in1[:, None, 1] - uv1[None, :, 1]) < r2[:, None])
    cand21 = win21 & (z21 > 0)[:, None] & valid2[:, None] & valid1[None, :]
    dist21 = hamming_matrix(desc2, desc1)                  # (N2,N1)
    best21, idx21, _ = best_two(dist21, cand21)            # per KF2 feature

    # direction 1->2
    win12 = (jnp.abs(uv1in2[:, None, 0] - uv2[None, :, 0]) < r1[:, None]) & (
        jnp.abs(uv1in2[:, None, 1] - uv2[None, :, 1]) < r1[:, None])
    cand12 = win12 & (z12 > 0)[:, None] & valid1[:, None] & valid2[None, :]
    best12, idx12, _ = best_two(hamming_matrix(desc1, desc2), cand12)

    # mutual agreement (the reference's final check, :1300-1318)
    j = idx12                                              # (N1,)
    mutual = (idx21[jnp.clip(j, 0, idx21.shape[0] - 1)] ==
              jnp.arange(idx12.shape[0]))
    accept = mutual & (best12 <= max_dist) & \
        (best21[jnp.clip(j, 0, best21.shape[0] - 1)] <= max_dist) & valid1
    return Matches(idx12.astype(jnp.int32), best12, accept)


def search_by_node(
    node_a, desc_a, valid_a, angle_a,
    node_b, desc_b, valid_b, angle_b,
    nn_ratio: float = 0.7, check_rotation: bool = True, max_dist: int = TH_LOW,
    use_pallas: bool = False,
):
    """BoW-bucket matching (`ORBmatcher::SearchByBoW`, `src/ORBmatcher.cc:255-579`):
    the FeatureVector's level-4 node buckets become an equality mask on
    per-feature vocabulary node ids."""
    cand = (node_a[:, None] == node_b[None, :]) & (node_a[:, None] >= 0)
    cand = cand & valid_a[:, None] & valid_b[None, :]
    best, best_idx, second = fused_best_two(desc_a, desc_b, cand, use_pallas)
    accept = (best <= max_dist) & (best < nn_ratio * second) & valid_a
    if check_rotation:
        accept = rotation_consistency(angle_a, angle_b, accept, best_idx)
    keep = resolve_conflicts(best_idx, best, accept, desc_b.shape[0])
    return Matches(best_idx.astype(jnp.int32), best, keep)
