"""Stereo rectification maps (geometry/rectify.py) vs closed-form checks.

The reference gets this from cv::initUndistortRectifyMap + cv::remap
(`Examples/Stereo/stereo_euroc.cc:121-176`).
"""
import os
import textwrap

import numpy as np

from orb_slam2_tpu.geometry import camera as cam_mod
from orb_slam2_tpu.geometry.rectify import (
    StereoRectifier, init_undistort_rectify_map, remap_bilinear)

W, H = 64, 48
K = np.array([[100.0, 0.0, 32.0],
              [0.0, 102.0, 24.0],
              [0.0, 0.0, 1.0]])
D = np.array([-0.28, 0.07, 1e-4, -2e-5, 0.0])


def test_identity_maps():
    mx, my = init_undistort_rectify_map(K, np.zeros(5), np.eye(3), K, W, H)
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    assert np.allclose(mx, u, atol=1e-4)
    assert np.allclose(my, v, atol=1e-4)


def test_undistort_roundtrip():
    """For every rectified pixel (u,v), the map gives the distorted source
    pixel; undistorting that source pixel (camera.undistort_pixels, itself
    tested against closed form) must return (u,v)."""
    mx, my = init_undistort_rectify_map(K, D, np.eye(3), K, W, H)
    cam = cam_mod.Camera.make(K[0, 0], K[1, 1], K[0, 2], K[1, 2],
                              D[0], D[1], D[2], D[3], D[4],
                              width=W, height=H, dtype=np.float64)
    src = np.stack([mx, my], axis=-1).reshape(-1, 2)
    back = np.asarray(cam_mod.undistort_pixels(cam, src, iters=30))
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    expect = np.stack([u, v], axis=-1).reshape(-1, 2)
    assert np.abs(back - expect).max() < 0.05


def test_rectifying_rotation_changes_maps():
    th = 0.01
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1.0]])
    mx0, _ = init_undistort_rectify_map(K, D, np.eye(3), K, W, H)
    mx1, _ = init_undistort_rectify_map(K, D, R, K, W, H)
    assert np.abs(mx0 - mx1).max() > 0.1


def test_remap_bilinear():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(H, W)).astype(np.float32)
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    assert np.allclose(remap_bilinear(img, u, v), img)
    # half-pixel shift right = average of horizontal neighbors
    out = remap_bilinear(img, u + 0.5, v)
    mid = 0.5 * (img[:, :-1] + img[:, 1:])
    assert np.allclose(out[:, :-1], mid, atol=1e-4)
    # out of range -> fill
    out = remap_bilinear(img, u + W, v, fill=7.0)
    assert np.all(out == 7.0)


def test_stereo_rectifier_from_settings(tmp_path):
    def mat(a):
        a = np.asarray(a, np.float64)
        return ("!!opencv-matrix\n   rows: %d\n   cols: %d\n   dt: d\n"
                "   data: [%s]" % (a.shape[0], a.shape[1],
                                   ", ".join(repr(float(x)) for x in a.ravel())))

    blocks = []
    for side in ("LEFT", "RIGHT"):
        blocks.append(f"{side}.height: {H}")
        blocks.append(f"{side}.width: {W}")
        blocks.append(f"{side}.D: {mat(D[None, :])}")
        blocks.append(f"{side}.K: {mat(K)}")
        blocks.append(f"{side}.R: {mat(np.eye(3))}")
        P = np.hstack([K, np.zeros((3, 1))])
        blocks.append(f"{side}.P: {mat(P)}")
    yml = "%YAML:1.0\n\n" + "\n".join(blocks) + "\n"
    p = os.path.join(tmp_path, "euroc.yaml")
    with open(p, "w") as f:
        f.write(yml)

    assert StereoRectifier.available(p)
    rect = StereoRectifier.from_settings(p)
    assert rect.maps_left[0].shape == (H, W)
    img = np.zeros((H, W), np.float32)
    l, r = rect(img, img)
    assert l.shape == (H, W) and r.shape == (H, W)
