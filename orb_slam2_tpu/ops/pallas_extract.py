"""Fused Pallas TPU kernel for the dense stage of ORB extraction.

One kernel pass per pyramid level replaces the XLA chain of
`fast.fast_score_map` (16 circle diffs + log-step circular min-windows) +
`fast.nms3x3` + the dual-threshold masks of `fast.compute_candidates` +
`image.gaussian_blur` (9x9 sigma=2). The XLA path runs as ~40-60 image-scale
op launches per level; the extraction step is latency-bound on TPU (PERF.md:
~6 ms of pure op-count latency against a ~0.1 ms HBM-traffic floor), so the
win is collapsing launches, not FLOPs.

The kernel tiles the image into row strips (grid over sublane strips; the
padded input stays resident in VMEM across grid steps) and emits three
per-pixel maps:

- `score_nms`: FAST-9-16 corner score where the pixel is a low-threshold
  corner inside the detection region AND survives 3x3 non-max suppression
  (the same masked-score NMS as the XLA path), else -inf;
- `hi`: 1.0 where the score clears the high threshold inside the region
  (input to the per-cell dual-threshold fallback, pooled outside);
- `blur`: the 9x9 sigma=2 Gaussian with BORDER_REFLECT_101, bit-identical
  accumulation order to `image.gaussian_blur`.

Reference behavior: `src/ORBextractor.cc:1046-1160` (dual-threshold cell
FAST) and `src/ORBextractor.cc:1609-1615` (the descriptor blur).

Hardware notes (the repo's accumulated Mosaic pitfalls apply): scalar params
enter via static Python closure (SMEM inputs read zeros when inlined on the
axon backend); boolean selects stay in logical-op form; all stores are
full-tile.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fast as fast_ops
from .image import _gaussian_kernel_1d

PAD = 5          # input halo: blur needs 4, FAST circle 3, NMS +1
NEG = -jnp.inf


def _dense_kernel(x_ref, score_ref, hi_ref, blur_ref, *,
                  S: int, ini_th: float, min_th: float,
                  min_bx: int, max_bx: int, min_by: int, max_by: int):
    """One row strip. x_ref: full padded image (Hp, Wp) resident in VMEM;
    image pixel (y, x) lives at x_ref[y+PAD, x+PAD]. Outputs are (S, Wp)
    strips aligned so out[s, c] = image pixel (row0+s, c)."""
    i = pl.program_id(0)
    # Mosaic requires dynamic sublane offsets provably 8-aligned: load ONE
    # aligned tall block per strip (S is a multiple of 8), then every halo
    # offset is a static value slice
    row0 = pl.multiple_of(i * S, 8)
    Wp = x_ref.shape[1]
    blk = x_ref[pl.ds(row0, S + 16), :]

    def lsh(v, k: int):
        # lane left-shift by k: out[c] = v[c + k]; pltpu.roll only accepts
        # non-negative shifts, and the wrapped lanes land beyond the valid
        # image columns where every consumer is masked
        return pltpu.roll(v, Wp - k, 1) if k else v

    def shifted(dy: int, dx: int, rows: int, base_row: int):
        """(rows, Wp) with [s, c] = image(base_row + s + dy, c - 1 + dx)
        where base_row is in image coords of local row s=0."""
        r = base_row + PAD + dy          # in [1, 9] for every caller
        v = blk[r:r + rows, :]
        return lsh(v, PAD - 1 + dx)

    # ---- FAST score on the extended strip (rows -1 .. S, cols -1 ..) ----
    SE = S + 2
    p = shifted(0, 0, SE, -1)
    circ = [shifted(int(dy), int(dx), SE, -1) for dx, dy in fast_ops.CIRCLE]
    d = [c - p for c in circ]

    def min9_max(sign):
        m2 = [jnp.minimum(sign * d[k], sign * d[(k + 1) % 16])
              for k in range(16)]
        m4 = [jnp.minimum(m2[k], m2[(k + 2) % 16]) for k in range(16)]
        m8 = [jnp.minimum(m4[k], m4[(k + 4) % 16]) for k in range(16)]
        m9 = [jnp.minimum(m8[k], sign * d[(k + 8) % 16]) for k in range(16)]
        out = m9[0]
        for k in range(1, 16):
            out = jnp.maximum(out, m9[k])
        return out

    score_ext = jnp.maximum(min9_max(1.0), min9_max(-1.0))   # (SE, Wp)

    # detection-region mask on the extended strip (image row row0-1+s, col c-1)
    rr = jax.lax.broadcasted_iota(jnp.int32, (SE, Wp), 0) + (row0 - 1)
    cc = jax.lax.broadcasted_iota(jnp.int32, (SE, Wp), 1) - 1
    B = fast_ops.BORDER
    in_reg_ext = ((rr >= min_by + B) & (rr < max_by - B)
                  & (cc >= min_bx + B) & (cc < max_bx - B))
    lo_ext = (score_ext > min_th) & in_reg_ext
    t = jnp.where(lo_ext, score_ext, 0.0)

    # 3x3 NMS over the masked score, aligned to the output strip
    def win(a, dr: int, dc: int):
        return lsh(a[dr:dr + S, :], dc)
    neigh = win(t, 0, 0)
    for dr in range(3):
        for dc in range(3):
            if dr == 0 and dc == 0:
                continue
            neigh = jnp.maximum(neigh, win(t, dr, dc))
    t_c = win(t, 1, 1)
    keep = t_c >= neigh

    score_c = win(score_ext, 1, 1)
    lo_c = win(lo_ext.astype(jnp.float32), 1, 1) > 0.5
    in_reg_c = win(in_reg_ext.astype(jnp.float32), 1, 1) > 0.5
    score_ref[...] = jnp.where(lo_c & keep, score_c, NEG)
    hi_ref[...] = jnp.where((score_c > ini_th) & in_reg_c, 1.0, 0.0)

    # ---- 9x9 sigma=2 Gaussian, same left-fold order as image.gaussian_blur
    k9 = [float(v) for v in _gaussian_kernel_1d(9, 2.0)]
    rows_acc = k9[0] * blk[1:1 + S, :]
    for j in range(1, 9):
        rows_acc = rows_acc + k9[j] * blk[1 + j:1 + j + S, :]
    out = k9[0] * lsh(rows_acc, 1)
    for j in range(1, 9):
        out = out + k9[j] * lsh(rows_acc, 1 + j)
    blur_ref[...] = out


def _rnd(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=(
    "ini_th", "min_th", "min_bx", "max_bx", "min_by", "max_by", "interpret"))
def dense_stage_pallas(img, ini_th: float, min_th: float,
                       min_bx: int, max_bx: int, min_by: int, max_by: int,
                       interpret: bool = False):
    """img: (H, W) float32. Returns (score_nms (H,W) with -inf at
    non-candidates, hi (H,W) float 0/1, blurred (H,W)). The dual-threshold
    per-cell fallback is applied by the caller (`candidates_from_dense`)."""
    H, W = img.shape
    S = 64 if H >= 256 else 32
    nS = -(-H // S)
    Hout = nS * S
    Hp = _rnd(Hout + 16, 8)          # last strip's aligned block needs S+16
    Wp = _rnd(W + 2 * PAD, 128)
    xpad = jnp.pad(img, ((PAD, PAD), (PAD, PAD)), mode="reflect")
    xpad = jnp.pad(xpad, ((0, Hp - (H + 2 * PAD)), (0, Wp - (W + 2 * PAD))))

    kern = functools.partial(
        _dense_kernel, S=S, ini_th=float(ini_th), min_th=float(min_th),
        min_bx=min_bx, max_bx=max_bx, min_by=min_by, max_by=max_by)
    ospec = pl.BlockSpec((S, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    score, hi, blur = pl.pallas_call(
        kern,
        grid=(nS,),
        in_specs=[pl.BlockSpec((Hp, Wp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(ospec, ospec, ospec),
        out_shape=(jax.ShapeDtypeStruct((Hout, Wp), jnp.float32),
                   jax.ShapeDtypeStruct((Hout, Wp), jnp.float32),
                   jax.ShapeDtypeStruct((Hout, Wp), jnp.float32)),
        interpret=interpret,
    )(xpad)
    return score[:H, :W], hi[:H, :W], blur[:H, :W]


def candidates_from_dense(score_nms, hi, min_bx: int, max_bx: int,
                          min_by: int, max_by: int, cell: int = 30):
    """Apply the reference's per-cell dual-threshold fallback to the fused
    kernel's outputs: cells (~30 px over the detection region,
    `src/ORBextractor.cc:1092-1138`) that contain a high-threshold corner
    keep only those; others fall back to low-threshold corners. Returns the
    (H, W) masked score for `select.select_uniform` (-inf elsewhere)."""
    h, w = score_nms.shape
    width = max_bx - min_bx
    height = max_by - min_by
    n_cols = max(int(width / cell), 1)
    n_rows = max(int(height / cell), 1)
    w_cell = int(np.ceil(width / n_cols))
    h_cell = int(np.ceil(height / n_rows))
    R, C = n_rows * h_cell, n_cols * w_cell

    hi_reg = jnp.pad(hi[min_by:max_by, min_bx:max_bx] > 0.5,
                     ((0, R - height), (0, C - width)))
    cell_has_hi = hi_reg.reshape(n_rows, h_cell, n_cols, w_cell).max(axis=(1, 3))
    use_lo_reg = ~jnp.repeat(jnp.repeat(cell_has_hi, h_cell, axis=0),
                             w_cell, axis=1)[:height, :width]
    use_lo = jnp.pad(use_lo_reg,
                     ((min_by, h - max_by), (min_bx, w - max_bx)))
    keep = (hi > 0.5) | use_lo
    return jnp.where(keep, score_nms, NEG)


# ---------------------------------------------------------------------------
# Fused pyramid cascade: all per-level bilinear resizes in one kernel
# ---------------------------------------------------------------------------

def _pyramid_kernel(x_ref, *refs, sizes, n_levels):
    """Cascaded bilinear resize, levels 1..n_levels-1 in one launch.

    refs = (Ry_1, RxT_1, ..., Ry_L, RxT_L, out_1, ..., out_L). Each level is
    two MXU matmuls (out = Ry @ cur @ Rx^T) with bf16 inputs / f32
    accumulation — the same numeric contract as `image.resize_bilinear
    (fast=True)`. Every dimension (including the contraction dims) is padded
    to a 128 multiple: with ragged shapes Mosaic lowers these dots to VPU
    reductions (~170 us each — the measured f32 VPU rate exactly), with
    aligned tiles they run on the MXU."""
    L = n_levels - 1
    w_refs = refs[:2 * L]
    out_refs = refs[2 * L:]
    cur = x_ref[...].astype(jnp.bfloat16)
    for l in range(L):
        ry = w_refs[2 * l][...]
        rxt = w_refs[2 * l + 1][...]
        # precision=DEFAULT: the package-wide f32 matmul pin would otherwise
        # request an fp32 contract on bf16 operands, which Mosaic rejects
        # ("Bad lhs type"); bf16-in/f32-accum is this kernel's contract
        tmp = jnp.dot(ry, cur, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)
        out = jnp.dot(tmp.astype(jnp.bfloat16), rxt,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)
        out_refs[l][...] = out
        cur = out.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def pyramid_pallas(img, cfg, interpret: bool = False):
    """(H, W) float32 -> tuple of n_levels images (level 0 = img itself).
    Wrapper around the fused cascade kernel; per-level interpolation
    matrices are the same `image._resize_matrix` constants as the XLA path."""
    from . import extractor as _ex
    from .image import _resize_matrix
    sizes = _ex.pyramid_sizes(img.shape[0], img.shape[1], cfg.n_levels,
                              cfg.scale_factor)
    L = cfg.n_levels - 1
    H, W = img.shape
    Hp, Wp = _rnd(H, 128), _rnd(W, 128)
    xp = jnp.pad(img, ((0, Hp - H), (0, Wp - W)))

    ins = [xp]
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    out_shapes, out_specs = [], []
    prev_hp, prev_wp = Hp, Wp
    for l in range(1, cfg.n_levels):
        h, w = sizes[l]
        ph, pw = sizes[l - 1]
        hp, wp = _rnd(h, 128), _rnd(w, 128)
        ry = np.zeros((hp, prev_hp), np.float32)
        ry[:h, :ph] = _resize_matrix(ph, h)
        rxt = np.zeros((prev_wp, wp), np.float32)
        rxt[:pw, :w] = _resize_matrix(pw, w).T
        ins += [jnp.asarray(ry, jnp.bfloat16), jnp.asarray(rxt, jnp.bfloat16)]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        out_shapes.append(jax.ShapeDtypeStruct((hp, wp), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        prev_hp, prev_wp = hp, wp

    outs = pl.pallas_call(
        functools.partial(_pyramid_kernel, sizes=tuple(sizes),
                          n_levels=cfg.n_levels),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(*ins)
    pyr = [img]
    for l in range(1, cfg.n_levels):
        h, w = sizes[l]
        pyr.append(outs[l - 1][:h, :w])
    return pyr


# ---------------------------------------------------------------------------
# Fused steered-BRIEF sampler: per-keypoint patch + exact one-hot selection
# ---------------------------------------------------------------------------

BRIEF_G = 8           # keypoints per grid step (one (8,512) lr/lc block)
BRIEF_PR = 48         # patch rows loaded per keypoint (8-aligned, covers +-19)
BRIEF_PC = 256        # patch cols loaded per keypoint (128-aligned window)


def _brief_kernel(rbase_ref, cbase_ref, img_ref, lr_ref, lc_ref, out_ref):
    """One group of 8 keypoints. For each: load the (48, 256) aligned patch
    window around the keypoint from the blurred level image (dynamic starts
    are 8/128-aligned by construction), then select its 512 rotated BRIEF
    samples with an EXACT one-hot fp32 matmul over the patch columns and a
    masked sublane reduction over the rows — zero gathers (the XLA flat
    `jnp.take` of N x 512 scattered pixels costs ~3.5 ms/frame, ~65% of the
    extraction step; TPU has no vector gather).

    Exactness: one-hot fp32 matmuls reproduce the selected f32 value
    bit-exactly (a single nonzero term per output; the multi-pass fp32
    contraction reconstructs the full 24-bit mantissa), so descriptors match
    the XLA path wherever the blur input matches."""
    g = pl.program_id(0)
    lr = lr_ref[...]                        # (8, 512) int32 patch-row coords
    lc = lc_ref[...]                        # (8, 512) int32 patch-col coords
    rows = []
    for m in range(BRIEF_G):
        rb = pl.multiple_of(rbase_ref[g * BRIEF_G + m], 8)
        cb = pl.multiple_of(cbase_ref[g * BRIEF_G + m], 128)
        patch = img_ref[pl.ds(rb, BRIEF_PR), pl.ds(cb, BRIEF_PC)]
        # column one-hot: sel[r, k] = patch[r, lc[m, k]] via MXU
        cidx = jax.lax.broadcasted_iota(jnp.int32, (BRIEF_PC, 512), 0)
        coloh = (cidx == lc[m:m + 1, :]).astype(jnp.float32)
        sel = jax.lax.dot_general(
            patch, coloh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)        # (48, 512)
        # row pick: vals[k] = sel[lr[m, k], k] via masked sublane reduction
        ridx = jax.lax.broadcasted_iota(jnp.int32, (BRIEF_PR, 512), 0)
        rowmask = (ridx == lr[m:m + 1, :]).astype(jnp.float32)
        rows.append(jnp.sum(sel * rowmask, axis=0, keepdims=True))
    out_ref[...] = jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def brief_sample_pallas(img_blur, ys, xs, dx, dy, interpret: bool = False):
    """Sample img_blur at (ys + dy, xs + dx) for each keypoint: ys/xs (N,)
    int32 interior keypoints (>= 19 px from every border — guaranteed by the
    extractor's EDGE_THRESHOLD region and safe-slot clamping); dx/dy (N, 512)
    int32 rotated pattern offsets, |.| <= 19. Returns (N, 512) float32."""
    H, W = img_blur.shape
    N = ys.shape[0]
    Np = _rnd(N, BRIEF_G)
    Hp = _rnd(H + 9, 8)
    cb_max = ((W - 39) // 128) * 128
    Wp = cb_max + BRIEF_PC
    imgp = jnp.pad(img_blur, ((0, Hp - H), (0, Wp - W)))
    padn = lambda a: jnp.pad(a, ((0, Np - N),) + ((0, 0),) * (a.ndim - 1))
    ys, xs, dx, dy = padn(ys), padn(xs), padn(dx), padn(dy)
    # clamp padded slots (zeros) into the valid interior like the extractor
    ys = jnp.clip(ys, 19, H - 20)
    xs = jnp.clip(xs, 19, W - 20)

    rbase = ((ys - 19) // 8) * 8
    cbase = ((xs - 19) // 128) * 128
    lr = (ys - rbase)[:, None] + dy                    # in [0, 45]
    lc = (xs - cbase)[:, None] + dx                    # in [0, 165]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Np // BRIEF_G,),
        in_specs=[
            pl.BlockSpec((Hp, Wp), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BRIEF_G, 512), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BRIEF_G, 512), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BRIEF_G, 512), lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    vals = pl.pallas_call(
        _brief_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Np, 512), jnp.float32),
        interpret=interpret,
    )(rbase, cbase, imgp, lr, lc)
    return vals[:N]
