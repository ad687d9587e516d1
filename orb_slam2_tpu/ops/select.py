"""Spatially-uniform keypoint selection to a fixed budget.

Replaces the reference's recursive quadtree `DistributeOctTree`
(`src/ORBextractor.cc:696-1042`) with an equivalent fixed-depth form: the
quadtree splits occupied nodes until the node count reaches the budget, then
keeps the max-response keypoint per leaf. Here we evaluate a geometric ladder
of uniform grids (4x cells per step, starting from ~round(W/H) root cells like
the reference's nIni), pick the coarsest depth whose occupied-cell count
reaches the budget, keep the best-scoring pixel per occupied cell at that
depth, and trim to the budget by response with top_k. Data-dependent recursion
becomes a constant number of scatter-max passes — fully jittable, fixed
shapes.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

MAX_DEPTH = 7  # 4^7 * nIni cells — beyond any per-level budget


def select_uniform(score, budget: int,
                   min_border_x: int, max_border_x: int,
                   min_border_y: int, max_border_y: int,
                   per_cell: int = 1):
    """score: (H,W) map with -inf at non-candidates.

    Returns (ys, xs, resp, valid) each of shape (budget,):
    integer pixel coords of the selected keypoints (level-image frame),
    their scores, and a validity mask.

    per_cell=2 keeps the best AND second-best per cell before the top-k trim
    (repeatability aid: when equal-contrast cell winners flip with subpixel
    phase, both contenders stay available to the matcher — the reference's
    quadtree keeps 1 per leaf, `src/ORBextractor.cc:1030-1037`).
    """
    h, w = score.shape
    width = max_border_x - min_border_x
    height = max_border_y - min_border_y
    n_ini = max(int(round(width / height)), 1)

    flat = score.reshape(-1)
    cand = flat > -jnp.inf
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]

    best_per_depth = []
    occupied = []
    for d in range(MAX_DEPTH):
        n_cols = n_ini * (2 ** d)
        n_rows = 2 ** d
        cw = width / n_cols
        ch = height / n_rows
        cj = jnp.clip(((xs - min_border_x) / cw).astype(jnp.int32), 0, n_cols - 1)
        ci = jnp.clip(((ys - min_border_y) / ch).astype(jnp.int32), 0, n_rows - 1)
        cid = (ci * n_cols + cj).reshape(-1)
        n_cells = n_rows * n_cols

        cell_max = jnp.full((n_cells,), -jnp.inf).at[cid].max(flat)
        occ = jnp.sum(cell_max > -jnp.inf)
        # winner per cell: the candidate matching its cell max, dedup by
        # smallest linear index
        lin = jnp.arange(h * w, dtype=jnp.int32)

        def cell_winner(values):
            is_w = cand & (values == cell_max_of(values)[cid]) & \
                (values > -jnp.inf)
            first = jnp.full((n_cells,), h * w, dtype=jnp.int32).at[cid].min(
                jnp.where(is_w, lin, h * w))
            return is_w & (lin == first[cid])

        def cell_max_of(values):
            return jnp.full((n_cells,), -jnp.inf).at[cid].max(values)

        winner_mask = cell_winner(flat)
        if per_cell >= 2:
            flat2 = jnp.where(winner_mask, -jnp.inf, flat)
            winner_mask = winner_mask | cell_winner(flat2)
        best_per_depth.append(winner_mask)
        occupied.append(occ)

    occ_arr = jnp.stack(occupied)                       # (D,)
    reaches = occ_arr >= budget
    # coarsest depth reaching the budget; if none, the deepest grid
    depth = jnp.where(jnp.any(reaches), jnp.argmax(reaches), MAX_DEPTH - 1)
    masks = jnp.stack(best_per_depth)                   # (D, H*W)
    sel_mask = masks[depth]

    sel_score = jnp.where(sel_mask, flat, -jnp.inf)
    resp, idx = jax.lax.top_k(sel_score, budget)
    valid = resp > -jnp.inf
    ys_out = (idx // w).astype(jnp.int32)
    xs_out = (idx % w).astype(jnp.int32)
    return ys_out, xs_out, resp, valid
