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
    With cfg.use_pallas_effective (the TPU-optimized build) the whole cascade
    runs as ONE fused Pallas launch of bf16-input/f32-accum MXU matmuls
    (measured: the XLA chain of 14 small matmuls costs ~2.4 ms of pure
    per-op overhead); the CPU/oracle path stays f32-exact."""
    if cfg.use_pallas_effective:
        from . import pallas_extract
        return pallas_extract.pyramid_pallas(img, cfg)
    sizes = pyramid_sizes(img.shape[0], img.shape[1], cfg.n_levels, cfg.scale_factor)
    pyr = [img]
    for lvl in range(1, cfg.n_levels):
        h, w = sizes[lvl]
        pyr.append(image_ops.resize_bilinear(pyr[-1], h, w,
                                             fast=cfg.use_pallas_effective))
    return pyr


def extract_level(img, budget: int, ini_th: float, min_th: float,
                  per_cell: int = 1, use_pallas: bool = False,
                  interpret: bool = False):
    """One pyramid level -> (ys, xs, resp, valid, angle, desc), all (budget,...).

    use_pallas routes the dense stage (FAST score + NMS + threshold masks +
    blur) through the fused Pallas kernel (`ops/pallas_extract.py`) — one
    launch instead of the ~40-60-op XLA chain; bit-identical outputs
    (tests/test_pallas_extract.py)."""
    h, w = img.shape
    min_b = EDGE_THRESHOLD - 3
    max_bx = w - EDGE_THRESHOLD + 3
    max_by = h - EDGE_THRESHOLD + 3

    if use_pallas:
        from . import pallas_extract
        score_nms, hi, blurred = pallas_extract.dense_stage_pallas(
            img, ini_th, min_th, min_b, max_bx, min_b, max_by,
            interpret=interpret)
        cand_score = pallas_extract.candidates_from_dense(
            score_nms, hi, min_b, max_bx, min_b, max_by)
    else:
        score = fast_ops.fast_score_map(img)
        cand, cand_score = fast_ops.compute_candidates(
            score, ini_th, min_th, min_b, max_bx, min_b, max_by)
        blurred = image_ops.gaussian_blur(img)
    ys, xs, resp, valid = select_ops.select_uniform(
        cand_score, budget, min_b, max_bx, min_b, max_by, per_cell=per_cell)

    # clamp padded slots to a safe interior pixel so gathers stay in bounds
    ys_safe = jnp.where(valid, ys, EDGE_THRESHOLD)
    xs_safe = jnp.where(valid, xs, EDGE_THRESHOLD)

    angle = orient_brief.ic_angles(img, ys_safe, xs_safe)
    desc = orient_brief.steered_brief(blurred, ys_safe, xs_safe, angle,
                                      use_pallas=use_pallas,
                                      interpret=interpret)
    return ys, xs, resp, valid, angle, desc


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract(img, cfg: SlamConfig) -> Keypoints:
    """Full ORB extraction. img: (H,W) float32 grayscale in [0,255]."""
    budgets = cfg.features_per_level()
    scale_factors = cfg.scale_factors
    pyr = build_pyramid(img, cfg)

    xy_all, lvl_all, ang_all, resp_all, desc_all, valid_all = [], [], [], [], [], []
    for lvl in range(cfg.n_levels):
        ys, xs, resp, valid, angle, desc = extract_level(
            pyr[lvl], budgets[lvl], cfg.ini_th_fast, cfg.min_th_fast,
            per_cell=2 if cfg.select_top2 else 1,
            use_pallas=cfg.use_pallas_effective)
        s = scale_factors[lvl]
        xy = jnp.stack([xs.astype(jnp.float32) * s, ys.astype(jnp.float32) * s], axis=-1)
        xy_all.append(xy)
        lvl_all.append(jnp.full((budgets[lvl],), lvl, dtype=jnp.int32))
        ang_all.append(angle)
        resp_all.append(resp)
        desc_all.append(desc)
        valid_all.append(valid)

    xy = jnp.concatenate(xy_all)
    lvl = jnp.concatenate(lvl_all)
    ang = jnp.concatenate(ang_all)
    resp = jnp.concatenate(resp_all)
    desc = jnp.concatenate(desc_all)
    valid = jnp.concatenate(valid_all)

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
