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
    """BORDER_REFLECT_101: gfedcb|abcdefgh|gfedcba."""
    return jnp.pad(img, ((pad_h, pad_h), (pad_w, pad_w)), mode="reflect")


def gaussian_blur(img, ksize: int = 9, sigma: float = 2.0):
    """Separable Gaussian on a (H,W) float image, reflect-101 borders."""
    k = jnp.asarray(_gaussian_kernel_1d(ksize, sigma))
    pad = ksize // 2
    x = _reflect101_pad(img, pad, pad)
    # rows then cols via 1D convs (XLA fuses these efficiently)
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :], k[None, None, :, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x, k[None, None, None, :],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return x[0, 0]


def resize_bilinear(img, out_h: int, out_w: int):
    """cv::resize INTER_LINEAR on float: src = (dst+0.5)*scale - 0.5, clamped."""
    in_h, in_w = img.shape
    scale_y = in_h / out_h
    scale_x = in_w / out_w
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * scale_y - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * scale_x - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, in_h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, in_w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, in_h - 1)
    x1i = jnp.minimum(x0i + 1, in_w - 1)

    rows0 = jnp.take(img, y0i, axis=0)
    rows1 = jnp.take(img, y1i, axis=0)
    row = rows0 * (1.0 - wy)[:, None] + rows1 * wy[:, None]
    c0 = jnp.take(row, x0i, axis=1)
    c1 = jnp.take(row, x1i, axis=1)
    return c0 * (1.0 - wx)[None, :] + c1 * wx[None, :]
