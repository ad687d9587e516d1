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
across depths, so the image-resolution work happens exactly ONCE — the finest
grid's per-cell (winner value, first-pixel index) via a reshape + max/min
pool — and every coarser depth is a 2x2 merge of tiny (<=64 x 64*nIni) winner
grids with the same (value desc, pixel-index asc) tie-break. Zero scatters.
(History: the first cut scattered per-cell maxima with `.at[cid].max`, which
serializes on TPU: ~53 ms per VGA level. The second cut pooled every depth
from full resolution: ~7 image-scale pool+broadcast passes per level. The
nested merge keeps one.)
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

MAX_DEPTH = 7  # 4^7 * nIni cells — beyond any per-level budget


def _better(va, ia, vb, ib):
    """Strict (value desc, pixel index asc) order: is entry a before b?"""
    return (va > vb) | ((va == vb) & (ia < ib))


def _fold_best(entries):
    """Best (v, i) of a list of entry pairs under `_better`."""
    v, i = entries[0]
    for vn, inn in entries[1:]:
        take = _better(vn, inn, v, i)
        v = jnp.where(take, vn, v)
        i = jnp.where(take, inn, i)
    return v, i


def _top2_of(entries, noidx):
    """Top-2 entries of a list of (v, i) pairs under `_better`, removing the
    chosen first entry exactly once (indices are unique except padded noidx
    rows, which are interchangeable)."""
    v1, i1 = _fold_best(entries)
    rest = []
    taken = None
    for v, i in entries:
        match = (v == v1) & (i == i1)
        if taken is None:
            remove = match
            taken = match
        else:
            remove = match & ~taken
            taken = taken | match
        rest.append((jnp.where(remove, -jnp.inf, v),
                     jnp.where(remove, noidx, i)))
    v2, i2 = _fold_best(rest)
    return v1, i1, v2, i2


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

    def pool(a, op):
        return op(a.reshape(nrf, ch, ncf, cw), axis=(1, 3))

    def up(g):
        return jnp.repeat(jnp.repeat(g, ch, axis=0), cw, axis=1)

    # ---- the ONLY image-resolution pass: finest-depth per-cell winners ----
    v1 = pool(sl, jnp.max)                              # (nrf, ncf)
    is_max = cand & (sl == up(v1))
    i1 = pool(jnp.where(is_max, lin, NOIDX), jnp.min)
    if per_cell >= 2:
        win_mask = is_max & (lin == up(i1))
        sl2 = jnp.where(win_mask, -jnp.inf, sl)
        v2 = pool(sl2, jnp.max)
        is_max2 = (sl2 > -jnp.inf) & (sl2 == up(v2))
        i2 = pool(jnp.where(is_max2, lin, NOIDX), jnp.min)
    else:
        v2 = i2 = None

    # ---- coarser depths: 2x2 merges of tiny winner grids ----
    def quads(a):
        q = a.reshape(a.shape[0] // 2, 2, a.shape[1] // 2, 2)
        return [q[:, 0, :, 0], q[:, 0, :, 1], q[:, 1, :, 0], q[:, 1, :, 1]]

    states = [(v1, i1, v2, i2)]                         # index: D-1-d
    for _ in range(D - 1):
        pv1, pi1, pv2, pi2 = states[-1]
        e1 = list(zip(quads(pv1), quads(pi1)))
        if per_cell >= 2:
            ents = e1 + list(zip(quads(pv2), quads(pi2)))
            states.append(_top2_of(ents, NOIDX))
        else:
            nv, ni = _fold_best(e1)
            states.append((nv, ni, None, None))
    states = states[::-1]                               # index by depth d

    val_rows, idx_rows, occupied = [], [], []
    for d in range(D):
        gv1, gi1, gv2, gi2 = states[d]
        n_cells = gv1.size
        occupied.append(jnp.sum(gv1 > -jnp.inf))
        vals = [jnp.pad(gv1.reshape(-1), (0, F - n_cells),
                        constant_values=-jnp.inf)]
        idxs = [jnp.pad(gi1.reshape(-1), (0, F - n_cells),
                        constant_values=NOIDX)]
        if per_cell >= 2:
            vals.append(jnp.pad(gv2.reshape(-1), (0, F - n_cells),
                                constant_values=-jnp.inf))
            idxs.append(jnp.pad(gi2.reshape(-1), (0, F - n_cells),
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
