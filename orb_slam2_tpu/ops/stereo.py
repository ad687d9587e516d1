"""Row-banded stereo matching with SAD sub-pixel refinement.

TPU-native `Frame::ComputeStereoMatches` (`src/Frame.cc:831-1128`):
1. coarse: masked Hamming matrix with a row band |vR - vL| <= 2*scale(levelR),
   octave window +-1, disparity window [uL-maxD, uL], best < (TH_HIGH+TH_LOW)/2;
2. fine: 11x11 center-normalized SAD slid +-5 px on the keypoint's pyramid
   level, parabola sub-pixel fit;
3. cull: SAD > 1.5*1.4*median rejected.

The reference's per-row candidate lists become one dense mask; the per-point
sliding window becomes a vmapped dynamic-slice + 11 shifted reductions.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .matching import hamming_matrix, TH_HIGH, TH_LOW, BIG

SAD_W = 5   # window radius -> 11x11 patch
SAD_L = 5   # slide range +-5


def compute_stereo_matches(
    kpL_xy, kpL_level, kpL_desc, kpL_valid,
    kpR_xy, kpR_level, kpR_desc, kpR_valid,
    pyr_left: Sequence[jnp.ndarray], pyr_right: Sequence[jnp.ndarray],
    scale_factors: Sequence[float], bf: float, max_disparity: float,
):
    """Returns (u_right, depth), each (N,) float32 with -1 for unmatched.

    max_disparity: the reference's maxD = mbf/minZ with minZ = baseline,
    i.e. fx (`src/Frame.cc:900-906`).
    """
    sf = jnp.asarray(scale_factors, dtype=jnp.float32)
    inv_sf = 1.0 / sf
    n = kpL_xy.shape[0]

    uL = kpL_xy[:, 0]
    vL = kpL_xy[:, 1]
    uR = kpR_xy[:, 0]
    vR = kpR_xy[:, 1]

    # --- coarse match -----------------------------------------------------
    band = 2.0 * sf[jnp.clip(kpR_level, 0, sf.shape[0] - 1)]           # (M,)
    row_ok = jnp.abs(vL[:, None] - vR[None, :]) <= band[None, :]
    lvl_ok = (kpR_level[None, :] >= kpL_level[:, None] - 1) & (
        kpR_level[None, :] <= kpL_level[:, None] + 1
    )
    max_d = max_disparity
    disp_ok = (uR[None, :] >= uL[:, None] - max_d) & (uR[None, :] <= uL[:, None])
    cand = row_ok & lvl_ok & disp_ok & kpL_valid[:, None] & kpR_valid[None, :]

    dist = hamming_matrix(kpL_desc, kpR_desc)
    d = jnp.where(cand, dist, BIG)
    best = jnp.min(d, axis=1)
    best_idx = jnp.argmin(d, axis=1)
    th_orb = (TH_HIGH + TH_LOW) // 2
    coarse_ok = (best < th_orb) & kpL_valid

    # --- fine SAD refinement per pyramid level ---------------------------
    uR0 = uR[best_idx]
    level = jnp.clip(kpL_level, 0, sf.shape[0] - 1)
    scaled_uL = jnp.round(uL * inv_sf[level]).astype(jnp.int32)
    scaled_vL = jnp.round(vL * inv_sf[level]).astype(jnp.int32)
    scaled_uR0 = jnp.round(uR0 * inv_sf[level]).astype(jnp.int32)

    best_inc = jnp.zeros((n,), jnp.int32)
    delta_r = jnp.zeros((n,), jnp.float32)
    sad_best = jnp.full((n,), jnp.inf, jnp.float32)
    fine_ok = jnp.zeros((n,), bool)

    size = 2 * SAD_W + 1
    strip_w = size + 2 * SAD_L

    for lvl, (im_l, im_r) in enumerate(zip(pyr_left, pyr_right)):
        h, w = im_l.shape
        sel = (level == lvl) & coarse_ok
        in_bounds = (
            (scaled_vL >= SAD_W) & (scaled_vL < h - SAD_W)
            & (scaled_uL >= SAD_W) & (scaled_uL < w - SAD_W)
            & (scaled_uR0 - SAD_L - SAD_W >= 0)
            & (scaled_uR0 + SAD_L + SAD_W + 1 < w)
        )
        sel = sel & in_bounds

        yc = jnp.clip(scaled_vL - SAD_W, 0, h - size)
        xl = jnp.clip(scaled_uL - SAD_W, 0, w - size)
        xr = jnp.clip(scaled_uR0 - SAD_W - SAD_L, 0, w - strip_w)

        def slice_l(y0, x0):
            return jax.lax.dynamic_slice(im_l, (y0, x0), (size, size))

        def slice_r(y0, x0):
            return jax.lax.dynamic_slice(im_r, (y0, x0), (size, strip_w))

        patch_l = jax.vmap(slice_l)(yc, xl)            # (N,11,11)
        strip_r = jax.vmap(slice_r)(yc, xr)            # (N,11,21)

        patch_l = patch_l - patch_l[:, SAD_W, SAD_W][:, None, None]
        sads = []
        for inc in range(2 * SAD_L + 1):
            pr = strip_r[:, :, inc : inc + size]
            pr = pr - pr[:, SAD_W, SAD_W][:, None, None]
            sads.append(jnp.sum(jnp.abs(patch_l - pr), axis=(1, 2)))
        sads = jnp.stack(sads, axis=1)                 # (N, 11)

        bi = jnp.argmin(sads, axis=1)
        bd = jnp.min(sads, axis=1)
        interior = (bi > 0) & (bi < 2 * SAD_L)
        i0 = jnp.clip(bi, 1, 2 * SAD_L - 1)
        d1 = sads[jnp.arange(n), i0 - 1]
        d2 = sads[jnp.arange(n), i0]
        d3 = sads[jnp.arange(n), i0 + 1]
        denom = d1 + d3 - 2.0 * d2
        dr = jnp.where(jnp.abs(denom) > 1e-9, (d1 - d3) / (2.0 * denom), 2.0)
        ok = sel & interior & (dr >= -1.0) & (dr <= 1.0)

        best_inc = jnp.where(ok, bi - SAD_L, best_inc)
        delta_r = jnp.where(ok, dr, delta_r)
        sad_best = jnp.where(ok, bd, sad_best)
        fine_ok = fine_ok | ok

    best_u_r = sf[level] * (
        scaled_uR0.astype(jnp.float32) + best_inc.astype(jnp.float32) + delta_r
    )
    disparity = uL - best_u_r
    disp_valid = (disparity >= 0.0) & (disparity < max_d)
    neg = disparity <= 0.0
    disparity = jnp.where(neg, 0.01, disparity)
    best_u_r = jnp.where(neg, uL - 0.01, best_u_r)

    ok = fine_ok & disp_valid

    # --- median-based outlier cull ---------------------------------------
    sorted_sad = jnp.sort(jnp.where(ok, sad_best, jnp.inf))
    n_ok = jnp.sum(ok.astype(jnp.int32))
    median = sorted_sad[jnp.clip(n_ok // 2, 0, n - 1)]
    ok = ok & (sad_best < 1.5 * 1.4 * median)

    u_right = jnp.where(ok, best_u_r, -1.0)
    depth = jnp.where(ok, bf / jnp.maximum(disparity, 1e-6), -1.0)
    return u_right, depth


def stereo_from_rgbd(kp_xy_raw, kp_xy_und, kp_valid, depth_img, bf: float,
                     depth_factor: float = 1.0):
    """RGB-D pseudo-stereo (`Frame::ComputeStereoFromRGBD`,
    `src/Frame.cc:1131-1183`): depth looked up at the RAW keypoint pixel,
    virtual right coord computed from the UNDISTORTED one."""
    h, w = depth_img.shape
    xi = jnp.clip(jnp.round(kp_xy_raw[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(kp_xy_raw[:, 1]).astype(jnp.int32), 0, h - 1)
    d = depth_img[yi, xi] * depth_factor
    ok = (d > 0) & kp_valid
    u_right = jnp.where(ok, kp_xy_und[:, 0] - bf / jnp.maximum(d, 1e-9), -1.0)
    depth = jnp.where(ok, d, -1.0)
    return u_right, depth
