"""Stereo EuRoC driver — the analogue of `Examples/Stereo/stereo_euroc.cc`.

Usage:
  python examples/stereo_euroc.py <settings.yaml> <sequence_dir> [out_prefix]

If the settings YAML carries the reference's LEFT./RIGHT. calibration blocks
(EuRoC.yaml does), each pair is undistorted+rectified on the fly exactly as
`stereo_euroc.cc` does with cv::initUndistortRectifyMap + cv::remap;
otherwise the sequence is assumed pre-rectified.
"""
import sys

from common import run_sequence

from orb_slam2_tpu.geometry.rectify import StereoRectifier
from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_STEREO
from orb_slam2_tpu.utils.datasets import EurocStereo
from orb_slam2_tpu.pipeline.system import SlamSystem


def main():
    settings, seq = sys.argv[1], sys.argv[2]
    prefix = sys.argv[3] if len(sys.argv) > 3 else "stereo_euroc"
    cfg = SlamConfig.from_yaml(settings, sensor=SENSOR_STEREO)
    rect = (StereoRectifier.from_settings(settings)
            if StereoRectifier.available(settings) else None)
    ds = EurocStereo(seq, rectifier=rect)
    s = SlamSystem(cfg)
    run_sequence(s, iter(ds),
                 lambda s_, f: s_.track_stereo(f[1], f[2], f[0]),
                 save_prefix=prefix)


if __name__ == "__main__":
    main()
