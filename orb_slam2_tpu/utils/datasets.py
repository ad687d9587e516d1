"""Dataset loaders: TUM RGB-D, KITTI odometry, EuRoC MAV.

Replaces the reference's example-driver loading code (`Examples/Monocular/
mono_tum.cc:38-97` LoadImages + per-frame cv::imread, `Examples/Stereo/
stereo_kitti.cc`, `Examples/RGB-D/rgbd_tum.cc` association files) with
iterator classes backed by the native prefetching decoder
(native/libslamloader.so) — PIL fallback when the .so isn't built.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libslamloader.so"))
_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.slam_loader_create.restype = ctypes.c_void_p
    lib.slam_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.slam_loader_next.restype = ctypes.c_int
    lib.slam_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint16), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.slam_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class ImageStream:
    """In-order prefetched image stream over a list of paths. Yields float32
    grayscale (or raw uint16 for depth) numpy arrays."""

    def __init__(self, paths: List[str], gray: bool = True, window: int = 8,
                 threads: int = 2, max_pixels: int = 4096 * 3072):
        self.paths = paths
        self.gray = gray
        self.lib = _load_native()
        self._buf = np.zeros(max_pixels * 3, dtype=np.uint16)
        if self.lib is not None:
            arr = (ctypes.c_char_p * len(paths))(
                *[p.encode() for p in paths])
            self._handle = self.lib.slam_loader_create(
                arr, len(paths), window, threads)
        else:
            self._handle = None
        self._i = 0

    def __len__(self):
        return len(self.paths)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._i >= len(self.paths):
            raise StopIteration
        self._i += 1
        if self._handle is not None:
            w = ctypes.c_int(); h = ctypes.c_int()
            c = ctypes.c_int(); bits = ctypes.c_int()
            ok = self.lib.slam_loader_next(
                self._handle,
                self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                self._buf.size, ctypes.byref(w), ctypes.byref(h),
                ctypes.byref(c), ctypes.byref(bits))
            if not ok:
                raise StopIteration
            n = w.value * h.value * c.value
            img = self._buf[:n].reshape(h.value, w.value, c.value).copy()
        else:
            from PIL import Image
            pil = Image.open(self.paths[self._i - 1])
            img = np.asarray(pil)
            if img.ndim == 2:
                img = img[:, :, None]
        if self.gray:
            if img.shape[2] == 3:
                img = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
                       + 0.114 * img[:, :, 2])
            else:
                img = img[:, :, 0]
            return img.astype(np.float32)
        return img[:, :, 0] if img.shape[2] == 1 else img

    def close(self):
        if self._handle is not None and self.lib is not None:
            self.lib.slam_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# Dataset front ends
# ---------------------------------------------------------------------------

class TumMonocular:
    """TUM rgb.txt-listed sequence (`mono_tum.cc` LoadImages)."""

    def __init__(self, seq_dir: str):
        self.dir = seq_dir
        self.timestamps: List[float] = []
        paths: List[str] = []
        with open(os.path.join(seq_dir, "rgb.txt")) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                ts, rel = line.split()[:2]
                self.timestamps.append(float(ts))
                paths.append(os.path.join(seq_dir, rel))
        self.stream = ImageStream(paths)

    def __len__(self):
        return len(self.timestamps)

    def __iter__(self) -> Iterator[Tuple[float, np.ndarray]]:
        for ts, img in zip(self.timestamps, self.stream):
            yield ts, img


def associate_tum(seq_dir: str, max_dt: float = 0.02):
    """rgb <-> depth timestamp association (`Examples/RGB-D/associations/*`,
    generated by the TUM associate.py tool)."""
    def read(fname):
        out = []
        with open(os.path.join(seq_dir, fname)) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                ts, rel = line.split()[:2]
                out.append((float(ts), rel))
        return out

    rgb = read("rgb.txt")
    depth = read("depth.txt")
    d_ts = np.array([t for t, _ in depth])
    pairs = []
    for ts, rel in rgb:
        i = int(np.argmin(np.abs(d_ts - ts)))
        if abs(d_ts[i] - ts) <= max_dt:
            pairs.append((ts, rel, depth[i][1]))
    return pairs


class TumRGBD:
    """TUM RGB-D with on-the-fly association (or a pre-built association
    file with 4 columns like the reference's `associations/fr1_desk.txt`)."""

    def __init__(self, seq_dir: str, association_file: Optional[str] = None):
        self.dir = seq_dir
        if association_file and os.path.exists(association_file):
            self.entries = []
            with open(association_file) as f:
                for line in f:
                    if line.startswith("#") or not line.strip():
                        continue
                    p = line.split()
                    self.entries.append((float(p[0]), p[1], p[3]))
        else:
            self.entries = associate_tum(seq_dir)
        self.rgb = ImageStream([os.path.join(seq_dir, e[1]) for e in self.entries])
        self.depth = ImageStream([os.path.join(seq_dir, e[2]) for e in self.entries],
                                 gray=False)

    def __len__(self):
        return len(self.entries)

    def __iter__(self):
        for (ts, _, _), img, d in zip(self.entries, self.rgb, self.depth):
            yield ts, img, d.astype(np.float32)


class KittiStereo:
    """KITTI odometry grayscale stereo (`stereo_kitti.cc` LoadImages:
    image_0/image_1 numbered pngs + times.txt)."""

    def __init__(self, seq_dir: str):
        self.dir = seq_dir
        with open(os.path.join(seq_dir, "times.txt")) as f:
            self.timestamps = [float(x) for x in f.read().split()]
        n = len(self.timestamps)
        left = [os.path.join(seq_dir, "image_0", f"{i:06d}.png") for i in range(n)]
        right = [os.path.join(seq_dir, "image_1", f"{i:06d}.png") for i in range(n)]
        self.left = ImageStream(left)
        self.right = ImageStream(right)

    def __len__(self):
        return len(self.timestamps)

    def __iter__(self):
        for ts, l, r in zip(self.timestamps, self.left, self.right):
            yield ts, l, r


class KittiMonocular(KittiStereo):
    def __iter__(self):
        for ts, l in zip(self.timestamps, self.left):
            yield ts, l


class EurocStereo:
    """EuRoC MAV stereo (`stereo_euroc.cc`): mav0/cam0|cam1/data.csv +
    data/<ts>.png. EuRoC images are unrectified; pass a
    `geometry.rectify.StereoRectifier` (built from the settings YAML's
    LEFT./RIGHT. blocks, as the reference does at startup) to rectify each
    pair on the fly."""

    def __init__(self, seq_dir: str, rectifier=None):
        self.rectifier = rectifier
        def read_cam(cam):
            entries = []
            with open(os.path.join(seq_dir, "mav0", cam, "data.csv")) as f:
                for line in f:
                    if line.startswith("#") or not line.strip():
                        continue
                    ts_ns, fname = line.strip().split(",")[:2]
                    entries.append((int(ts_ns) * 1e-9,
                                    os.path.join(seq_dir, "mav0", cam, "data", fname)))
            return entries

        cam0 = read_cam("cam0")
        cam1_list = read_cam("cam1")
        # keep only timestamps present in both cams (reference matches by ts)
        self.entries = []
        cam1_ts = np.array([t for t, _ in cam1_list])
        for ts, p0 in cam0:
            i = int(np.argmin(np.abs(cam1_ts - ts)))
            if abs(cam1_ts[i] - ts) < 0.003:
                self.entries.append((ts, p0, cam1_list[i][1]))
        self.left = ImageStream([e[1] for e in self.entries])
        self.right = ImageStream([e[2] for e in self.entries])

    def __len__(self):
        return len(self.entries)

    def __iter__(self):
        for (ts, _, _), l, r in zip(self.entries, self.left, self.right):
            if self.rectifier is not None:
                l, r = self.rectifier(l, r)
            yield ts, l, r


class EurocMonocular:
    """EuRoC cam0-only sequence (`mono_euroc.cc` LoadImages)."""

    def __init__(self, seq_dir: str):
        entries = []
        with open(os.path.join(seq_dir, "mav0", "cam0", "data.csv")) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                ts_ns, fname = line.strip().split(",")[:2]
                entries.append((int(ts_ns) * 1e-9,
                                os.path.join(seq_dir, "mav0", "cam0",
                                             "data", fname)))
        self.timestamps = [t for t, _ in entries]
        self.stream = ImageStream([p for _, p in entries])

    def __len__(self):
        return len(self.timestamps)

    def __iter__(self):
        for ts, img in zip(self.timestamps, self.stream):
            yield ts, img
