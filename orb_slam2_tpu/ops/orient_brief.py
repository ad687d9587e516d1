"""Keypoint orientation (intensity centroid) and steered-BRIEF descriptors.

Batched device kernels replacing `IC_Angle` (`src/ORBextractor.cc:94-141`) and
`computeOrbDescriptor` (`src/ORBextractor.cc:153-204`). Each keypoint gathers a
small patch with `dynamic_slice` (vmapped), then all arithmetic is dense
(N, patch) work. Descriptors are packed into 8 uint32 words per keypoint so
Hamming distance is 8 XOR+popcounts.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

HALF_PATCH = 15  # intensity-centroid patch radius (src/ORBextractor.cc:80)
BRIEF_RADIUS = 19  # max |rotated pattern offset| ~ 18.4 -> slice radius


@functools.lru_cache(maxsize=None)
def umax_table() -> np.ndarray:
    """Row extents of the radius-15 circular patch, symmetric cvRound
    construction (`src/ORBextractor.cc:550-576`)."""
    umax = np.zeros(HALF_PATCH + 1, dtype=np.int32)
    vmax = int(np.floor(HALF_PATCH * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF_PATCH * np.sqrt(2.0) / 2))
    hp2 = HALF_PATCH * HALF_PATCH
    for v in range(vmax + 1):
        # cvRound = round-half-to-even
        umax[v] = int(np.round(np.sqrt(hp2 - v * v)))
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax


@functools.lru_cache(maxsize=None)
def _circular_mask() -> np.ndarray:
    """(31,31) mask of the IC patch, and u-extent per row from umax."""
    umax = umax_table()
    mask = np.zeros((2 * HALF_PATCH + 1, 2 * HALF_PATCH + 1), dtype=np.float32)
    for v in range(-HALF_PATCH, HALF_PATCH + 1):
        d = umax[abs(v)]
        mask[v + HALF_PATCH, HALF_PATCH - d : HALF_PATCH + d + 1] = 1.0
    return mask


def ic_angles(img, ys, xs):
    """Intensity-centroid orientation for keypoints at integer (ys, xs).

    img: (H,W) float; ys/xs: (N,) int32. Returns angles in DEGREES [0,360)
    (the reference stores degrees; rotation histograms bin them directly).
    """
    mask = jnp.asarray(_circular_mask())
    us = jnp.arange(-HALF_PATCH, HALF_PATCH + 1, dtype=jnp.float32)
    wu = us[None, :] * mask  # weight of each pixel for m10
    wv = us[:, None] * mask  # for m01

    def one(y, x):
        patch = jax.lax.dynamic_slice(
            img, (y - HALF_PATCH, x - HALF_PATCH),
            (2 * HALF_PATCH + 1, 2 * HALF_PATCH + 1))
        m10 = jnp.sum(patch * wu)
        m01 = jnp.sum(patch * wv)
        return m10, m01

    m10, m01 = jax.vmap(one)(ys, xs)
    ang = jnp.degrees(jnp.arctan2(m01, m10))
    return jnp.where(ang < 0, ang + 360.0, ang)


@functools.lru_cache(maxsize=None)
def brief_pattern() -> np.ndarray:
    """(256, 4) int32 sampling offsets (x0,y0,x1,y1) — the fixed learned ORB
    pattern (data constant; reference `src/ORBextractor.cc:209-467`)."""
    path = os.path.join(os.path.dirname(__file__), "..", "data", "brief_pattern.npy")
    return np.load(os.path.abspath(path))


def steered_brief(img_blur, ys, xs, angles_deg, use_pallas: bool = False,
                  interpret: bool = False):
    """256-bit steered BRIEF descriptors packed as (N, 8) uint32.

    img_blur: (H,W) float (9x9 sigma=2 blurred level image); keypoints at
    integer (ys, xs) with orientation in degrees. Rotation uses
    round-half-to-even on the rotated offsets, matching cvRound in
    `computeOrbDescriptor` (`src/ORBextractor.cc:170`).
    """
    pat = jnp.asarray(brief_pattern())                 # (256,4)
    px = jnp.concatenate([pat[:, 0], pat[:, 2]]).astype(jnp.float32)  # (512,)
    py = jnp.concatenate([pat[:, 1], pat[:, 3]]).astype(jnp.float32)

    theta = jnp.radians(angles_deg)
    ca, sa = jnp.cos(theta), jnp.sin(theta)            # (N,)

    # rotated integer offsets, per keypoint x pattern point
    dx = jnp.round(px[None, :] * ca[:, None] - py[None, :] * sa[:, None]).astype(jnp.int32)
    dy = jnp.round(px[None, :] * sa[:, None] + py[None, :] * ca[:, None]).astype(jnp.int32)

    if use_pallas:
        # zero-gather Pallas sampler: aligned patch windows + exact one-hot
        # fp32 MXU selection (the flat take below costs ~3.5 ms/frame on
        # TPU — 65% of extraction; TPU has no vector gather)
        from . import pallas_extract
        vals = pallas_extract.brief_sample_pallas(
            img_blur, ys, xs, dx, dy, interpret=interpret)
    else:
        # one flat gather from the blurred image (a per-keypoint
        # dynamic_slice patch + in-patch gather measured ~6 ms on VGA; this
        # is one batched take of N*512 elements)
        H, W = img_blur.shape
        gy = jnp.clip(ys[:, None] + dy, 0, H - 1)
        gx = jnp.clip(xs[:, None] + dx, 0, W - 1)
        vals = jnp.take(img_blur.reshape(-1), gy * W + gx)  # (N, 512)
    t0 = vals[:, :256]
    t1 = vals[:, 256:]
    bits = (t0 < t1)                                   # (N, 256) bool

    # pack little-endian within each uint32 word: bit b of word w is pattern
    # index w*32+b (word 0 bits 0..7 = reference desc byte 0 bits, etc.)
    bits = bits.reshape(-1, 8, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = jnp.sum(bits << shifts[None, None, :], axis=-1)
    return words.astype(jnp.uint32)                    # (N, 8)
