"""AR plane detection + overlay (orb_slam2_tpu/ar.py) vs closed form.

Reference behavior: `ViewerAR::DetectPlane` / `Plane::Recompute`
(`Examples/ROS/ORB_SLAM2/src/AR/ViewerAR.cc:393-603`).
"""
import numpy as np

from orb_slam2_tpu import ar


def make_plane_points(rng, n=200, n_out=30, normal=(0.0, 0.0, 1.0), d=4.0):
    normal = np.asarray(normal) / np.linalg.norm(normal)
    # basis in the plane
    a = np.array([1.0, 0.0, 0.0])
    if abs(normal @ a) > 0.9:
        a = np.array([0.0, 1.0, 0.0])
    e1 = np.cross(normal, a)
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(normal, e1)
    s = rng.uniform(-2, 2, (n, 2))
    pts = normal * d + s[:, :1] * e1 + s[:, 1:] * e2
    pts += rng.normal(0, 0.003, pts.shape)
    out = rng.uniform(-3, 3, (n_out, 3)) + normal * d
    out += normal * rng.uniform(0.5, 2.0, (n_out, 1))
    return np.concatenate([pts, out]), normal


def test_detect_plane_recovers_normal(rng):
    pts, normal = make_plane_points(rng)
    Tcw = np.eye(4)       # camera at origin looking at the plane (z=+4)
    plane = ar.detect_plane(pts, Tcw, iterations=80, seed=1)
    assert plane is not None
    # normal up to orientation convention
    assert abs(abs(plane.normal @ normal) - 1.0) < 5e-3
    # normal faces the camera: camera center is at origin; reference flips so
    # (Oc - o) . n < 0
    assert (np.zeros(3) - plane.origin) @ plane.normal <= 0
    # the reference's inlier threshold is 1.4x the 20th-percentile distance
    # (ViewerAR.cc:461-474) — tight by construction; what matters is that the
    # selected inliers come from the plane, not the outlier cloud
    assert plane.inliers[:200].sum() > 30
    assert plane.inliers[200:].mean() < 0.1
    # Tpw maps +y to the plane normal and its origin onto the plane
    y_axis = plane.Tpw[:3, 1]
    assert abs(abs(y_axis @ normal) - 1.0) < 5e-3
    assert abs((plane.Tpw[:3, 3] - normal * 4.0) @ normal) < 0.01


def test_detect_plane_too_few_points(rng):
    pts = rng.uniform(-1, 1, (20, 3))
    assert ar.detect_plane(pts, np.eye(4)) is None


def test_draw_cube_marks_pixels(rng):
    pts, _ = make_plane_points(rng)
    plane = ar.detect_plane(pts, np.eye(4), iterations=50)
    img = np.zeros((240, 320), np.float32)
    out = ar.draw_cube(img, plane, np.eye(4), size=0.5,
                       fx=300.0, fy=300.0, cx=160.0, cy=120.0)
    assert (out == 255.0).sum() > 50          # wireframe rendered
    assert (img == 0).all()                   # input untouched


def test_min_obs_mask_filter(rng):
    pts, normal = make_plane_points(rng, n=100, n_out=0)
    mask = np.zeros(100, bool)
    mask[:60] = True
    plane = ar.detect_plane(pts, np.eye(4), min_obs_mask=mask,
                            min_points=50, iterations=50)
    assert plane is not None
    assert not plane.inliers[60:].any()
