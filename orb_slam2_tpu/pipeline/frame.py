"""Per-frame data record construction.

TPU-native `Frame` (`src/Frame.cc:119-205`): ORB extraction, undistortion,
stereo / RGB-D depth association — as one jitted function per sensor type.
The reference's 64x48 search grid (`AssignFeaturesToGrid`) is intentionally
absent: all searches are dense masked distance matrices (see ops/matching.py).
The stereo L/R extraction that the reference runs in two std::threads
(`src/Frame.cc:144-153`) is here a single traced program — XLA overlaps the
two independent extraction subgraphs on its own.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry import camera as camera_mod
from ..ops import extractor, stereo as stereo_ops
from ..utils.config import SlamConfig, SENSOR_MONOCULAR, SENSOR_STEREO, SENSOR_RGBD


class FrameData(NamedTuple):
    xy: jnp.ndarray        # (N,2) undistorted keypoint coords
    xy_raw: jnp.ndarray    # (N,2) raw (distorted) coords
    level: jnp.ndarray     # (N,)
    angle: jnp.ndarray     # (N,)
    response: jnp.ndarray  # (N,)
    desc: jnp.ndarray      # (N,8) uint32
    valid: jnp.ndarray     # (N,)
    ur: jnp.ndarray        # (N,) stereo right-x or -1
    depth: jnp.ndarray     # (N,) stereo/RGBD depth or -1

    @property
    def n(self):
        return jnp.sum(self.valid.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg", "init"))
def make_frame_monocular(img, cfg: SlamConfig, init: bool = False) -> FrameData:
    """init=True doubles the extraction budget (capped at max_keypoints so
    array shapes are unchanged) — the reference's dedicated initialization
    extractor `mpIniORBextractor = ORBextractor(2*nFeatures, ...)`
    (`src/Tracking.cc:188-190`); without it the 100-match monocular-init
    gate is unreachable at low feature budgets (level-0-only matching)."""
    cam = cfg.camera()
    img = img.astype(jnp.float32)   # accept uint8 uploads (4x less transfer)
    if init:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, n_features=min(2 * cfg.n_features, cfg.max_keypoints),
            max_keypoints=cfg.max_keypoints)
    kps = extractor.extract(img, cfg)
    xy_und = camera_mod.undistort_pixels(cam, kps.xy) if cfg.k1 or cfg.k2 else kps.xy
    n = kps.xy.shape[0]
    neg = jnp.full((n,), -1.0, jnp.float32)
    return FrameData(xy=xy_und, xy_raw=kps.xy, level=kps.level, angle=kps.angle,
                     response=kps.response, desc=kps.desc, valid=kps.valid,
                     ur=neg, depth=neg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def make_frame_stereo(img_left, img_right, cfg: SlamConfig) -> FrameData:
    """Stereo pairs are assumed rectified (reference requirement), so raw ==
    undistorted coordinates."""
    img_left = img_left.astype(jnp.float32)
    img_right = img_right.astype(jnp.float32)
    kl = extractor.extract(img_left, cfg)
    kr = extractor.extract(img_right, cfg)
    pyl = extractor.build_pyramid(img_left, cfg)
    pyr = extractor.build_pyramid(img_right, cfg)
    ur, depth = stereo_ops.compute_stereo_matches(
        kl.xy, kl.level, kl.desc, kl.valid,
        kr.xy, kr.level, kr.desc, kr.valid,
        pyl, pyr, cfg.scale_factors, cfg.bf, max_disparity=cfg.fx)
    return FrameData(xy=kl.xy, xy_raw=kl.xy, level=kl.level, angle=kl.angle,
                     response=kl.response, desc=kl.desc, valid=kl.valid,
                     ur=ur, depth=depth)


@functools.partial(jax.jit, static_argnames=("cfg",))
def make_frame_rgbd(img, depth_img, cfg: SlamConfig) -> FrameData:
    cam = cfg.camera()
    img = img.astype(jnp.float32)
    depth_img = depth_img.astype(jnp.float32)  # uint16 depth maps upload raw;
    # cfg.depth_map_factor rescales on device (stereo_from_rgbd)
    kps = extractor.extract(img, cfg)
    xy_und = camera_mod.undistort_pixels(cam, kps.xy) if cfg.k1 or cfg.k2 else kps.xy
    ur, depth = stereo_ops.stereo_from_rgbd(
        kps.xy, xy_und, kps.valid, depth_img, cfg.bf, cfg.depth_map_factor)
    return FrameData(xy=xy_und, xy_raw=kps.xy, level=kps.level, angle=kps.angle,
                     response=kps.response, desc=kps.desc, valid=kps.valid,
                     ur=ur, depth=depth)


def make_frame(cfg: SlamConfig, img, img_right=None, depth_img=None) -> FrameData:
    if cfg.sensor == SENSOR_STEREO:
        return make_frame_stereo(img, img_right, cfg)
    if cfg.sensor == SENSOR_RGBD:
        return make_frame_rgbd(img, depth_img, cfg)
    return make_frame_monocular(img, cfg)
