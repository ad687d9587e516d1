"""ORB feature extraction pipeline — fixed-shape, jittable.

The TPU-native `ORBextractor::operator()` (`src/ORBextractor.cc:1543-1658`):
8-level pyramid -> dense FAST score maps with dual-threshold cell fallback ->
uniform-grid budget selection (quadtree-equivalent) -> intensity-centroid
orientation -> 9x9/sigma=2 blur -> steered BRIEF. Output is a fixed-capacity
`Keypoints` pytree: every dynamic count of the reference becomes a validity
mask. All per-level work is traced at static shapes; levels unroll at trace
time.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.config import SlamConfig
from . import fast as fast_ops
from . import image as image_ops
from . import select as select_ops
from . import orient_brief

EDGE_THRESHOLD = 19  # src/ORBextractor.cc:81
PATCH_SIZE = 31


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set for one image (capacity = sum of per-level
    budgets, padded to config.max_keypoints)."""

    xy: jnp.ndarray       # (N, 2) float32 — level-0 (raw image) pixel coords
    level: jnp.ndarray    # (N,) int32 — pyramid octave
    angle: jnp.ndarray    # (N,) float32 — degrees [0, 360)
    response: jnp.ndarray # (N,) float32 — FAST score
    desc: jnp.ndarray     # (N, 8) uint32 — packed 256-bit rBRIEF
    valid: jnp.ndarray    # (N,) bool

    @property
    def n(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def pyramid_sizes(height: int, width: int, n_levels: int, scale_factor: float):
    """Per-level (h, w) with cvRound of the ORIGINAL size each level
    (src/ORBextractor.cc:1664-1684)."""
    sizes = []
    for lvl in range(n_levels):
        inv = 1.0 / (scale_factor ** lvl)
        # cvRound = half-to-even
        sizes.append((int(np.round(height * inv + 0.0)), int(np.round(width * inv))))
    return sizes


def build_pyramid(img, cfg: SlamConfig):
    """(H,W) float32 -> list of per-level images (cascaded bilinear resize).
    With cfg.use_pallas (the TPU-optimized build) the resize matmuls run at
    the MXU's native bf16 rate; the CPU/oracle path stays f32-exact."""
    sizes = pyramid_sizes(img.shape[0], img.shape[1], cfg.n_levels, cfg.scale_factor)
    pyr = [img]
    for lvl in range(1, cfg.n_levels):
        h, w = sizes[lvl]
        pyr.append(image_ops.resize_bilinear(pyr[-1], h, w,
                                             fast=cfg.use_pallas))
    return pyr


@functools.lru_cache(maxsize=None)
def _level_masks(height: int, width: int, n_levels: int, scale_factor: float):
    """Static per-level masks on the common (n_levels, H, W) canvas:
    (score_valid, region, level_hw). score_valid = the 3px FAST border of
    each level; region = the keypoint detection region
    [min_border+3, max_border-3) of each level (`src/ORBextractor.cc:1046-1160`)."""
    sizes = pyramid_sizes(height, width, n_levels, scale_factor)
    min_b = EDGE_THRESHOLD - 3
    sv = np.zeros((n_levels, height, width), bool)
    rg = np.zeros((n_levels, height, width), bool)
    for l, (h, w) in enumerate(sizes):
        sv[l, 3:h - 3, 3:w - 3] = True
        rg[l, min_b + 3:h - min_b - 3, min_b + 3:w - min_b - 3] = True
    return sv, rg, np.asarray(sizes, np.int32)


def _cell_has_hi(hi, cell: int = 32):
    """(L,H,W) bool -> broadcast 'any high-threshold corner in this cell'
    over canvas-aligned `cell`-px cells (the reference's ~30px per-level
    cells, `src/ORBextractor.cc:1090-1140`; canvas alignment lets one grid
    serve every level — reshape max-pool, zero scatters)."""
    L, H, W = hi.shape
    nH, nW = -(-H // cell), -(-W // cell)
    p = jnp.pad(hi, ((0, 0), (0, nH * cell - H), (0, nW * cell - W)))
    g = p.reshape(L, nH, cell, nW, cell).max(axis=(2, 4))
    up = jnp.repeat(jnp.repeat(g, cell, axis=1), cell, axis=2)
    return up[:, :H, :W]


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract(img, cfg: SlamConfig) -> Keypoints:
    """Full ORB extraction. img: (H,W) float32 grayscale in [0,255].

    ALL pyramid levels are processed BATCHED on one (L,H,W) canvas (levels
    anchored at the origin, 4px reflect-101 aprons beyond each level's
    extent so the canvas-wide blur matches the per-level cv::GaussianBlur
    exactly): FAST scoring, dual-threshold candidates, uniform selection,
    IC angles, blur and steered BRIEF each launch ONCE instead of once per
    level. The per-level unrolled pipeline was ~8x the op count for the
    same math — pure dispatch latency on TPU (PERF.md round 3: extraction
    6-9 ms of op-count latency vs ~0.1 ms of HBM traffic)."""
    budgets = cfg.features_per_level()
    scale_factors = cfg.scale_factors
    L = cfg.n_levels
    H, W = img.shape
    pyr = build_pyramid(img, cfg)
    sv_np, rg_np, level_hw = _level_masks(H, W, L, cfg.scale_factor)

    canvas = jnp.zeros((L, H, W), jnp.float32)
    canvas = canvas.at[0].set(pyr[0])
    for l in range(1, L):
        h, w = int(level_hw[l, 0]), int(level_hw[l, 1])
        apron = jnp.pad(pyr[l], ((0, 4), (0, 4)), mode="reflect")
        canvas = canvas.at[l, :h + 4, :w + 4].set(apron)

    score = fast_ops.fast_score_map(canvas, valid_mask=jnp.asarray(sv_np))
    region = jnp.asarray(rg_np)
    hi = (score > cfg.ini_th_fast) & region
    lo = (score > cfg.min_th_fast) & region
    use_lo = ~_cell_has_hi(hi)
    keep = fast_ops.nms3x3(jnp.where(lo, score, 0.0))
    cand = lo & keep & (hi | use_lo)

    min_b = EDGE_THRESHOLD - 3
    sreg = jnp.where(cand, score, -jnp.inf)[:, min_b:H - min_b, min_b:W - min_b]
    ys, xs, resp, valid = select_ops.select_uniform_batched(
        sreg, tuple(budgets), per_cell=2 if cfg.select_top2 else 1)
    ys = ys + min_b                                  # region -> level coords
    xs = xs + min_b

    B = ys.shape[1]
    lvl2 = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[:, None], (L, B))
    # flatten; clamp padded slots to a safe interior pixel for the gathers
    ys_f = jnp.where(valid, ys, EDGE_THRESHOLD).reshape(-1)
    xs_f = jnp.where(valid, xs, EDGE_THRESHOLD).reshape(-1)
    lvl_f = lvl2.reshape(-1)
    angle = orient_brief.ic_angles_canvas(canvas, lvl_f, ys_f, xs_f)
    blurred = image_ops.gaussian_blur(canvas)
    desc = orient_brief.steered_brief_canvas(blurred, lvl_f, ys_f, xs_f,
                                             angle, level_hw)

    # per-level exact-budget slices, concatenated — identical layout to the
    # original per-level pipeline (top_k rows are response-sorted, so the
    # first budget[l] entries ARE that level's top-k)
    sf = jnp.asarray(np.asarray(scale_factors, np.float32))
    xy_lvl = jnp.stack([xs.astype(jnp.float32) * sf[:, None],
                        ys.astype(jnp.float32) * sf[:, None]], axis=-1)
    ang2 = angle.reshape(L, B)
    desc2 = desc.reshape(L, B, 8)
    xy = jnp.concatenate([xy_lvl[l, :budgets[l]] for l in range(L)])
    lvl = jnp.concatenate([lvl2[l, :budgets[l]] for l in range(L)])
    ang = jnp.concatenate([ang2[l, :budgets[l]] for l in range(L)])
    resp = jnp.concatenate([resp[l, :budgets[l]] for l in range(L)])
    desc = jnp.concatenate([desc2[l, :budgets[l]] for l in range(L)])
    valid = jnp.concatenate([valid[l, :budgets[l]] for l in range(L)])

    n_total = xy.shape[0]
    pad = cfg.max_keypoints - n_total
    if pad < 0:
        raise ValueError(f"max_keypoints {cfg.max_keypoints} < total budget {n_total}")
    if pad:
        xy = jnp.pad(xy, ((0, pad), (0, 0)))
        lvl = jnp.pad(lvl, (0, pad))
        ang = jnp.pad(ang, (0, pad))
        resp = jnp.pad(resp, (0, pad), constant_values=-np.inf)
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))

    resp = jnp.where(valid, resp, 0.0)
    return Keypoints(xy=xy, level=lvl, angle=ang, response=resp, desc=desc, valid=valid)
