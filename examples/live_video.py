"""Live/offline video driver — analogue of the fork's `Examples/myvideo/
myvideo.cpp` (OpenCV VideoCapture + monocular SLAM).

Usage:
  python examples/live_video.py <settings.yaml> [video_path_or_camera_index]
"""
import sys

from common import run_sequence

from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_MONOCULAR
from orb_slam2_tpu.pipeline.system import SlamSystem


def frames_from_capture(src):
    import cv2

    cap = cv2.VideoCapture(int(src) if str(src).isdigit() else src)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype("float32")
        yield i / fps, gray
        i += 1
    cap.release()


def main():
    settings = sys.argv[1]
    src = sys.argv[2] if len(sys.argv) > 2 else 0
    cfg = SlamConfig.from_yaml(settings, sensor=SENSOR_MONOCULAR)
    s = SlamSystem(cfg)
    run_sequence(s, frames_from_capture(src),
                 lambda s_, f: s_.track_monocular(f[1], f[0]),
                 save_prefix="live")


if __name__ == "__main__":
    main()
