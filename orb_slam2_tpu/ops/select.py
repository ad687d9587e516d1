"""Spatially-uniform keypoint selection to a fixed budget.

Replaces the reference's recursive quadtree `DistributeOctTree`
(`src/ORBextractor.cc:696-1042`) with an equivalent fixed-depth form: the
quadtree splits occupied nodes until the node count reaches the budget, then
keeps the max-response keypoint per leaf. Here we evaluate a geometric ladder
of uniform grids (4x cells per step, starting from ~round(W/H) root cells like
the reference's nIni), pick the coarsest depth whose occupied-cell count
reaches the budget, keep the best-scoring pixel per occupied cell at that
depth, and trim to the budget by response with top_k.

TPU-native formulation: cells are pixel-aligned (ceil cell sizes) and NESTED
across depths, so every per-cell reduction is a reshape + max/min pool — zero
scatters. (The first cut scattered per-cell maxima with `.at[cid].max`, which
serializes on TPU: ~53 ms per VGA level, ~175 ms of a 193 ms extraction.
Pooling runs the same ladder in well under a millisecond of VPU work.)
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
    D = MAX_DEPTH

    # pixel-aligned nested cell grid: finest depth has (2^(D-1)) rows and
    # (n_ini * 2^(D-1)) cols; every coarser depth is a 2x2 merge
    nrf = 1 << (D - 1)
    ncf = n_ini << (D - 1)
    ch = -(-height // nrf)       # ceil
    cw = -(-width // ncf)
    R, C = nrf * ch, ncf * cw

    sl = score[min_border_y:max_border_y, min_border_x:max_border_x]
    sl = jnp.pad(sl, ((0, R - height), (0, C - width)),
                 constant_values=-jnp.inf)
    cand = sl > -jnp.inf
    lin = jnp.arange(R * C, dtype=jnp.int32).reshape(R, C)
    NOIDX = jnp.int32(R * C)
    F = nrf * ncf                   # finest cell count — per-depth grids are
                                    # padded to this so depths stack

    def pool(a, nr, nc, op):
        return op(a.reshape(nr, R // nr, nc, C // nc), axis=(1, 3))

    def up(g, nr, nc):
        return jnp.repeat(jnp.repeat(g, R // nr, axis=0), C // nc, axis=1)

    def winners_at(values, vcand, nr, nc):
        """Per-cell (winner value, winner pixel index, winner pixel mask)."""
        gmax = pool(values, nr, nc, jnp.max)
        is_max = vcand & (values == up(gmax, nr, nc))
        first = pool(jnp.where(is_max, lin, NOIDX), nr, nc, jnp.min)
        win_mask = is_max & (lin == up(first, nr, nc))
        return gmax, first, win_mask

    # Per depth, collect the winner (value, index) PER CELL — top_k then runs
    # over <= F (+F for per_cell=2) entries instead of the whole image
    # (R*C ~ 300k): the full-image top_k was the next-largest term after the
    # scatters in the original formulation.
    val_rows, idx_rows, occupied = [], [], []
    for d in range(D):
        nr, nc = 1 << d, n_ini << d
        gmax, first, winner = winners_at(sl, cand, nr, nc)
        occupied.append(jnp.sum(gmax > -jnp.inf))
        vals = [jnp.pad(gmax.reshape(-1), (0, F - nr * nc),
                        constant_values=-jnp.inf)]
        idxs = [jnp.pad(first.reshape(-1), (0, F - nr * nc),
                        constant_values=NOIDX)]
        if per_cell >= 2:
            sl2 = jnp.where(winner, -jnp.inf, sl)
            gmax2, first2, _ = winners_at(sl2, sl2 > -jnp.inf, nr, nc)
            vals.append(jnp.pad(gmax2.reshape(-1), (0, F - nr * nc),
                                constant_values=-jnp.inf))
            idxs.append(jnp.pad(first2.reshape(-1), (0, F - nr * nc),
                                constant_values=NOIDX))
        val_rows.append(jnp.concatenate(vals))
        idx_rows.append(jnp.concatenate(idxs))

    occ_arr = jnp.stack(occupied)                       # (D,)
    reaches = occ_arr >= budget
    # coarsest depth reaching the budget; if none, the deepest grid
    depth = jnp.where(jnp.any(reaches), jnp.argmax(reaches), D - 1)
    sel_val = jnp.stack(val_rows)[depth]                # (F or 2F,)
    sel_idx = jnp.stack(idx_rows)[depth]

    resp, k = jax.lax.top_k(sel_val, budget)
    idx = sel_idx[k]
    valid = (resp > -jnp.inf) & (idx < NOIDX)
    idxc = jnp.minimum(idx, NOIDX - 1)
    ys_out = jnp.minimum((idxc // C).astype(jnp.int32) + min_border_y, h - 1)
    xs_out = jnp.minimum((idxc % C).astype(jnp.int32) + min_border_x, w - 1)
    return ys_out, xs_out, resp, valid
