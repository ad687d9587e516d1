"""Pinhole camera model with radial-tangential distortion.

Replicates the behavior the reference gets from OpenCV: projection with
(fx, fy, cx, cy), distortion (k1, k2, p1, p2, k3) loaded from YAML
(reference `src/Tracking.cc:93-217`), `cv::undistortPoints` semantics via a
fixed-iteration Newton solve (reference `src/Frame.cc:725-781`), and the
stereo model u_r = u - bf/z (reference `src/Frame.cc:1185-1200`).
All functions are batched over leading axes of the point arrays.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    k3: jnp.ndarray
    bf: jnp.ndarray      # baseline * fx (0 for monocular)
    width: int
    height: int

    @staticmethod
    def make(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0, bf=0.0,
             width=640, height=480, dtype=jnp.float32):
        f = lambda v: jnp.asarray(v, dtype=dtype)
        return Camera(f(fx), f(fy), f(cx), f(cy), f(k1), f(k2), f(p1), f(p2), f(k3),
                      f(bf), int(width), int(height))

    @property
    def baseline(self):
        return self.bf / self.fx

    @property
    def has_distortion(self):
        return bool(self.k1 != 0) or bool(self.k2 != 0) or bool(self.p1 != 0) \
            or bool(self.p2 != 0) or bool(self.k3 != 0)


def distort_normalized(cam: Camera, xn):
    """Apply distortion to normalized coords xn=(...,2) -> distorted normalized."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xy = x * y
    dx = 2.0 * cam.p1 * xy + cam.p2 * (r2 + 2.0 * x * x)
    dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * xy
    return jnp.stack([x * radial + dx, y * radial + dy], axis=-1)


def undistort_pixels(cam: Camera, uv, iters: int = 10):
    """cv::undistortPoints equivalent: distorted pixels -> undistorted pixels.

    Fixed-point iteration identical in spirit to OpenCV's (compensate distortion
    by iterating x = (xd - dx(x)) / radial(x)).
    """
    xd = jnp.stack([(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1)
    x = xd

    for _ in range(iters):
        xx, yy = x[..., 0], x[..., 1]
        r2 = xx * xx + yy * yy
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        xy = xx * yy
        dx = 2.0 * cam.p1 * xy + cam.p2 * (r2 + 2.0 * xx * xx)
        dy = cam.p1 * (r2 + 2.0 * yy * yy) + 2.0 * cam.p2 * xy
        inv = 1.0 / jnp.maximum(radial, 1e-8)
        x = jnp.stack([(xd[..., 0] - dx) * inv, (xd[..., 1] - dy) * inv], axis=-1)

    return jnp.stack([x[..., 0] * cam.fx + cam.cx, x[..., 1] * cam.fy + cam.cy], axis=-1)


def project(cam: Camera, pc):
    """Camera-frame 3D points (...,3) -> undistorted pixel coords (...,2).

    (The reference matches against *undistorted* keypoints, so projection for
    matching/BA never applies distortion — see `Frame::isInFrustum`,
    `src/Frame.cc:490-580`.)
    """
    z = pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = pc[..., 0] * inv_z * cam.fx + cam.cx
    v = pc[..., 1] * inv_z * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: Camera, pc):
    """(...,3) -> (...,3) of (uL, vL, uR) with uR = uL - bf/z."""
    uv = project(cam, pc)
    z = pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    ur = uv[..., 0] - cam.bf * inv_z
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def backproject(cam: Camera, uv, depth):
    """Undistorted pixels + depth -> camera-frame 3D (reference `Frame::UnprojectStereo`,
    `src/Frame.cc:1185-1222`)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def image_bounds(cam: Camera):
    """Undistorted image bounds (minX, maxX, minY, maxY) from warping the 4
    corners, matching `Frame::ComputeImageBounds` (`src/Frame.cc:783-829`)."""
    corners = jnp.array(
        [[0.0, 0.0], [cam.width, 0.0], [0.0, cam.height], [cam.width, cam.height]],
        dtype=jnp.float32,
    )
    und = undistort_pixels(cam, corners)
    min_x = jnp.minimum(und[0, 0], und[2, 0])
    max_x = jnp.maximum(und[1, 0], und[3, 0])
    min_y = jnp.minimum(und[0, 1], und[1, 1])
    max_y = jnp.maximum(und[2, 1], und[3, 1])
    return min_x, max_x, min_y, max_y
