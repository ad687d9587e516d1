"""Offline map/trajectory visualization.

Replaces the Pangolin GUI stack (Viewer/FrameDrawer/MapDrawer,
`src/Viewer.cc:95-214`, `src/MapDrawer.cc`) with a headless matplotlib
renderer: map points, keyframe frusta, covisibility graph and the frame
trajectory are drawn to a PNG. The reference's viewer is explicitly off the
metric path (SURVEY §2.2); this keeps the observability without a GL stack.
"""
from __future__ import annotations

import os

import numpy as np


def plot_map(m, trajectory=None, path="map.png", max_points=20000,
             show_covisibility=True, title=None):
    """m: MapState; trajectory: optional list of (ts, T_wc)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from .geometry import se3
    import jax.numpy as jnp

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(111, projection="3d")

    pts = np.asarray(m.pt_pos)[np.asarray(m.pt_valid)]
    if len(pts) > max_points:
        pts = pts[np.random.default_rng(0).choice(len(pts), max_points, False)]
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 2], -pts[:, 1], s=0.5, c="k", alpha=0.4,
                   label=f"{len(pts)} map points")

    valid = np.asarray(m.kf_valid)
    poses = np.asarray(m.kf_pose)
    centers = []
    for k in np.nonzero(valid)[0]:
        T = poses[k]
        c = -T[:3, :3].T @ T[:3, 3]
        centers.append((k, c))
    if centers:
        cs = np.array([c for _, c in centers])
        ax.scatter(cs[:, 0], cs[:, 2], -cs[:, 1], s=20, c="tab:blue",
                   marker="s", label=f"{len(cs)} keyframes")

    if show_covisibility and centers:
        covis = np.asarray(m.covis)
        idx = {k: c for k, c in centers}
        drawn = 0
        for k, c in centers:
            for j in np.nonzero(covis[k] >= 15)[0]:
                if j > k and j in idx and drawn < 500:
                    c2 = idx[j]
                    ax.plot([c[0], c2[0]], [c[2], c2[2]], [-c[1], -c2[1]],
                            "g-", lw=0.3, alpha=0.5)
                    drawn += 1

    if trajectory:
        tr = np.array([T[:3, 3] for _, T in trajectory])
        ax.plot(tr[:, 0], tr[:, 2], -tr[:, 1], "r-", lw=1.0, label="trajectory")

    ax.set_xlabel("x")
    ax.set_ylabel("z")
    ax.set_zlabel("-y")
    ax.legend(loc="upper right", fontsize=8)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def draw_frame(img, frame_data, matched_mask=None, path="frame.png",
               status=None):
    """FrameDrawer equivalent (`FrameDrawer::DrawFrame` +
    `DrawTextInfo`, src/FrameDrawer.cc:33-208): keypoints over the image
    (green = tracked map-point matches, blue = unmatched detections), with
    the reference's status banner (tracking state, KFs, MPs, matches) when
    `status` (e.g. SlamSystem.get_map_stats()) is given."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(np.asarray(img), cmap="gray", vmin=0, vmax=255)
    xy = np.asarray(frame_data.xy)
    valid = np.asarray(frame_data.valid)
    n_match = 0
    if matched_mask is not None:
        matched = np.asarray(matched_mask) & valid
        n_match = int(matched.sum())
        ax.plot(xy[valid & ~matched, 0], xy[valid & ~matched, 1], "b.", ms=2)
        ax.plot(xy[matched, 0], xy[matched, 1], "g.", ms=3)
        ax.set_title(f"{n_match} matches / {int(valid.sum())} keypoints")
    else:
        ax.plot(xy[valid, 0], xy[valid, 1], "g.", ms=2)
    if status is not None:
        banner = (f"{status.get('state', '?')} | KFs: {status.get('n_keyframes', 0)} "
                  f"MPs: {status.get('n_map_points', 0)} "
                  f"Matches: {n_match or status.get('last_inliers', 0)} "
                  f"Loops: {status.get('n_loops_closed', 0)}")
        ax.text(0.01, 0.02, banner, transform=ax.transAxes, color="yellow",
                fontsize=9, family="monospace",
                bbox=dict(facecolor="black", alpha=0.6, pad=2))
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


class LiveViewer:
    """Live observability thread — the reference's Viewer (`src/Viewer.cc:95-214`)
    without the GL stack: a daemon thread renders the map view and the
    current-frame overlay at ~`fps` while tracking runs. On a headless
    machine it streams PNGs into `out_dir` (map_live.png / frame_live.png,
    atomically replaced so a file watcher or browser can follow along); with
    a display + interactive matplotlib backend it shows live windows.

    Protocol mirrors the reference: the tracker (or driver) calls
    `update(img)` after each tracked frame (FrameDrawer::Update,
    src/Tracking.cc:463,652); `request_finish()` + `join()` shut it down
    (Viewer::RequestFinish). `follow_camera` recentres the map view on the
    latest pose each redraw (the menuFollowCamera toggle).
    """

    def __init__(self, system, out_dir=".", fps=2.0, follow_camera=True,
                 show_covisibility=True, interactive=None):
        import threading
        self.s = system
        self.out_dir = out_dir
        self.period = 1.0 / max(fps, 1e-3)
        self.follow_camera = follow_camera
        self.show_covisibility = show_covisibility
        self._img = None
        self._frame = None
        self._matched = None
        self._lock = threading.Lock()
        self._finish = threading.Event()
        self.n_renders = 0
        if interactive is None:
            interactive = bool(os.environ.get("DISPLAY"))
        self.interactive = interactive
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="viewer")
        self._thread.start()

    def update(self, img=None):
        """Snapshot the current frame for the overlay (cheap: host refs only;
        MapState/FrameData are immutable pytrees swapped atomically)."""
        with self._lock:
            if img is not None:
                self._img = np.asarray(img)
            self._frame = self.s.last_frame
            lm = getattr(self.s, "last_matched_pt", None)
            self._matched = None if lm is None else np.asarray(lm) >= 0

    def request_finish(self):
        self._finish.set()

    def join(self, timeout=10.0):
        self._finish.set()
        self._thread.join(timeout)

    # -- render loop -------------------------------------------------------
    def _run(self):
        import time as _time
        while not self._finish.wait(self.period):
            try:
                self._render_once()
            except Exception:       # rendering must never kill tracking
                _time.sleep(self.period)

    def _render_once(self):
        with self._lock:
            img, frame, matched = self._img, self._frame, self._matched
        s = self.s
        if img is not None and frame is not None:
            draw_frame(img, frame, matched_mask=matched,
                       path=self._atomic(os.path.join(self.out_dir,
                                                      "frame_live.png")),
                       status=s.get_map_stats())
        m = s.m
        if m is not None and int(m.n_keyframes) > 0:
            title = None
            if self.follow_camera and s.last_Tcw is not None:
                c = -np.asarray(s.last_Tcw)[:3, :3].T @ np.asarray(
                    s.last_Tcw)[:3, 3]
                title = f"cam ({c[0]:.2f}, {c[1]:.2f}, {c[2]:.2f})"
            plot_map(m, trajectory=s.get_trajectory(),
                     path=self._atomic(os.path.join(self.out_dir,
                                                    "map_live.png")),
                     show_covisibility=self.show_covisibility, title=title)
        self.n_renders += 1
        self._promote()

    def _atomic(self, path):
        # render to a temp name; _promote moves it in place
        self._pending = getattr(self, "_pending", [])
        tmp = path + ".tmp.png"
        self._pending.append((tmp, path))
        return tmp

    def _promote(self):
        for tmp, path in getattr(self, "_pending", []):
            if os.path.exists(tmp):
                os.replace(tmp, path)
        self._pending = []
