"""Image primitives replacing the reference's OpenCV calls.

- grayscale conversion (`src/Tracking.cc:252-278` / cv::cvtColor weights)
- 9x9 sigma=2 Gaussian blur with BORDER_REFLECT_101 (`src/ORBextractor.cc:1609-1615`)
- bilinear resize with OpenCV's pixel-center convention (`src/ORBextractor.cc:1686-1691`)

All float32, shapes static. Convolution runs as an XLA conv (fused on TPU);
these are bandwidth-bound ops XLA already schedules well, so no hand-written
Pallas is needed here.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def rgb_to_gray(img, bgr: bool = False):
    """(H,W,3) -> (H,W) with OpenCV weights 0.299/0.587/0.114 (RGB order)."""
    w = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)
    if bgr:
        w = w[::-1]
    return jnp.tensordot(img.astype(jnp.float32), w, axes=([-1], [0]))


@functools.lru_cache(maxsize=None)
def _gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv::getGaussianKernel for ksize>=7 (computed, not table-based)."""
    half = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _reflect101_pad(img, pad_h: int, pad_w: int):
    """BORDER_REFLECT_101 on the LAST TWO axes: gfedcb|abcdefgh|gfedcba."""
    cfg = [(0, 0)] * (img.ndim - 2) + [(pad_h, pad_h), (pad_w, pad_w)]
    return jnp.pad(img, cfg, mode="reflect")


def gaussian_blur(img, ksize: int = 9, sigma: float = 2.0):
    """Separable Gaussian on a (..., H, W) float image, reflect-101 borders
    (batch dims pass through — the batched extractor blurs all pyramid
    levels in one canvas).

    Implemented as shift-and-add (static slices of the padded image times
    scalar taps): a 1-channel spatial conv is MXU-hostile and measured ~5 ms
    on VGA via lax.conv; the same math as 18 fused VPU FMAs is ~0.2 ms."""
    k = _gaussian_kernel_1d(ksize, sigma)
    pad = ksize // 2
    h, w = img.shape[-2], img.shape[-1]
    lead = img.shape[:-2]
    x = _reflect101_pad(img, pad, pad)
    lead0 = (0,) * len(lead)
    rows = sum(float(k[i]) * jax.lax.slice(x, lead0 + (i, 0),
                                           lead + (i + h, w + 2 * pad))
               for i in range(ksize))
    out = sum(float(k[i]) * jax.lax.slice(rows, lead0 + (0, i),
                                          lead + (h, i + w))
              for i in range(ksize))
    return out


@functools.lru_cache(maxsize=None)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix, OpenCV pixel-center
    convention: src = (dst+0.5)*scale - 0.5, clamped."""
    scale = n_in / n_out
    s = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    i0 = np.clip(np.floor(s), 0, n_in - 1)
    w1 = np.clip(s - i0, 0.0, 1.0)
    i0 = i0.astype(np.int64)
    i1 = np.minimum(i0 + 1, n_in - 1)
    M = np.zeros((n_out, n_in), dtype=np.float32)
    M[np.arange(n_out), i0] += (1.0 - w1).astype(np.float32)
    M[np.arange(n_out), i1] += w1.astype(np.float32)
    return M


def resize_bilinear(img, out_h: int, out_w: int, fast: bool = False):
    """cv::resize INTER_LINEAR on float, as two dense matmuls (out = Ry @ img
    @ Rx^T): separable bilinear weights are constant per static shape pair,
    and a pair of MXU matmuls beats gather-based interpolation on TPU.

    fast=True feeds the MXU bf16 inputs with f32 accumulation — the native
    v5e matmul rate (f32 matmuls run at 1/4 speed via multi-pass). Gray
    values 0..255 are EXACT in bf16 (8-bit mantissa); only the interpolation
    weights round (<=0.4% relative -> <=~0.5 gray of error), far below the
    FAST threshold (7..20) and BRIEF's pairwise comparisons' noise floor."""
    in_h, in_w = img.shape
    Ry = jnp.asarray(_resize_matrix(in_h, out_h))
    Rx = jnp.asarray(_resize_matrix(in_w, out_w))
    if fast:
        # precision=DEFAULT: the package-wide f32 matmul pin
        # (orb_slam2_tpu/__init__.py) would otherwise run these DELIBERATE
        # bf16 matmuls as multi-pass f32 — measured 2.4-2.9 ms of the
        # extraction step for the 14 cascade matmuls vs well under 1 ms at
        # the native bf16 rate. The bf16 rounding here is audited (gray
        # values exact in bf16; weights round <=0.4%).
        tmp = jnp.dot(Ry.astype(jnp.bfloat16), img.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)
        return jnp.dot(tmp.astype(jnp.bfloat16), Rx.T.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)
    tmp = jnp.dot(Ry, img, precision=jax.lax.Precision.HIGHEST)
    return jnp.dot(tmp, Rx.T, precision=jax.lax.Precision.HIGHEST)
