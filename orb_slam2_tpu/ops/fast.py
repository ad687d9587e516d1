"""Vectorized FAST-9-16 corner detection.

TPU-native replacement for the reference's per-cell cv::FAST calls
(`src/ORBextractor.cc:1122-1135`): instead of looping over ~30px cells with a
threshold fallback, we compute a dense corner *score map* once per pyramid
level. The score of a pixel is the maximum threshold t for which it would
still pass the FAST test (exists an arc of >=9 contiguous circle pixels all
brighter than p+t or all darker than p-t), so:

  corner at threshold t  <=>  score > t

which yields the reference's dual-threshold (iniThFAST=20 -> minThFAST=7)
per-cell fallback from ONE map: use high-threshold corners in cells that have
any, low-threshold corners otherwise (`compute_candidates`). Non-max
suppression is a global 3x3 window (the reference suppresses per-cell, which
differs only at cell borders).

Everything is dense (H,W) arithmetic: 16 circle shifts + log-step circular
min-windows — pure VPU work that XLA fuses into a handful of elementwise
passes.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Bresenham circle of radius 3, 16 pixels, OpenCV order (starting at
# (0,-3) going clockwise). (dx, dy) pairs.
CIRCLE = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1),
        (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1),
        (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)

BORDER = 3  # circle radius: no valid score within 3px of the image edge


def fast_score_map(img, valid_mask=None):
    """(..., H, W) float image -> (..., H, W) float score map (leading batch
    dims pass through — the batched extractor scores all pyramid levels at
    once).

    score = max over the 16 arcs of length 9 of
            max( min_arc(x_i - p), min_arc(p - x_i) )
    Negative/zero score means not a corner at any positive threshold.
    Border pixels (3px) get score 0; `valid_mask` (broadcastable to img)
    overrides the default whole-image 3px-border mask (per-level borders of
    the batched canvas)."""
    h, w = img.shape[-2], img.shape[-1]
    p = img
    # circle values via static rolls (cheap: XLA turns these into slices)
    circ = jnp.stack(
        [jnp.roll(img, shift=(-int(dy), -int(dx)), axis=(-2, -1))
         for dx, dy in CIRCLE],
        axis=0,
    )  # (16, ..., H, W): circ[k] at pixel (y,x) = img[y+dy_k, x+dx_k]
    d_bright = circ - p[None]          # x_i - p
    d_dark = -d_bright                  # p - x_i

    def min9_max(d):
        # circular windowed min of length 9 over axis 0, then max over windows
        m2 = jnp.minimum(d, jnp.roll(d, -1, axis=0))
        m4 = jnp.minimum(m2, jnp.roll(m2, -2, axis=0))
        m8 = jnp.minimum(m4, jnp.roll(m4, -4, axis=0))
        m9 = jnp.minimum(m8, jnp.roll(d, -8, axis=0))
        return jnp.max(m9, axis=0)

    score = jnp.maximum(min9_max(d_bright), min9_max(d_dark))
    if valid_mask is None:
        # zero out the 3px border (rolled values wrap around there)
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]
        valid_mask = (ys >= BORDER) & (ys < h - BORDER) & \
            (xs >= BORDER) & (xs < w - BORDER)
    return jnp.where(valid_mask, score, 0.0)


def nms3x3(score):
    """Keep pixels that are the maximum of their 3x3 neighborhood (ties kept).
    Works on (..., H, W); the window spans the last two axes only."""
    window = (1,) * (score.ndim - 2) + (3, 3)
    strides = (1,) * score.ndim
    neigh_max = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, window, strides, "SAME"
    )
    return score >= neigh_max


def compute_candidates(score, ini_th: float, min_th: float,
                       min_border_x: int, max_border_x: int,
                       min_border_y: int, max_border_y: int,
                       cell: int = 30):
    """Dual-threshold candidate mask with per-cell fallback.

    Mirrors `ComputeKeyPointsOctTree` (`src/ORBextractor.cc:1046-1160`): the
    valid detection region is [min_border+3, max_border-3) in both axes; the
    region is divided into ~`cell`-px cells; a cell that has any corner at
    ini_th uses only those, otherwise falls back to corners at min_th.

    Returns (candidate_mask, masked_score) as (H,W) arrays. The per-cell
    any-high-corner reduction is a reshape max-pool over pixel-aligned cells
    (scatter-free — TPU scatters serialize).
    """
    h, w = score.shape
    width = max_border_x - min_border_x
    height = max_border_y - min_border_y
    n_cols = max(int(width / cell), 1)
    n_rows = max(int(height / cell), 1)
    w_cell = int(np.ceil(width / n_cols))
    h_cell = int(np.ceil(height / n_rows))
    R, C = n_rows * h_cell, n_cols * w_cell

    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    in_region = (
        (ys >= min_border_y + BORDER) & (ys < max_border_y - BORDER)
        & (xs >= min_border_x + BORDER) & (xs < max_border_x - BORDER)
    )

    hi = (score > ini_th) & in_region
    lo = (score > min_th) & in_region

    # per-cell "has a high-threshold corner": slice the cell region, pad to
    # the cell grid, pool, broadcast back
    hi_reg = jnp.pad(hi[min_border_y:max_border_y, min_border_x:max_border_x],
                     ((0, R - height), (0, C - width)))
    cell_has_hi = hi_reg.reshape(n_rows, h_cell, n_cols, w_cell).max(axis=(1, 3))
    use_lo_reg = ~jnp.repeat(jnp.repeat(cell_has_hi, h_cell, axis=0),
                             w_cell, axis=1)[:height, :width]
    use_lo = jnp.pad(use_lo_reg,
                     ((min_border_y, h - max_border_y),
                      (min_border_x, w - max_border_x)))

    keep = nms3x3(jnp.where(lo, score, 0.0))
    cand = lo & keep & (hi | use_lo)
    return cand, jnp.where(cand, score, -jnp.inf)
