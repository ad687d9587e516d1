"""Stereo KITTI driver — the analogue of `Examples/Stereo/stereo_kitti.cc`.

Usage:
  python examples/stereo_kitti.py <settings.yaml> <sequence_dir> [out_prefix]

settings.yaml can be the reference's KITTI00-02.yaml etc.
"""
import sys

from common import run_sequence

from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_STEREO
from orb_slam2_tpu.utils.datasets import KittiStereo
from orb_slam2_tpu.pipeline.system import SlamSystem


def main():
    settings, seq = sys.argv[1], sys.argv[2]
    prefix = sys.argv[3] if len(sys.argv) > 3 else "stereo_kitti"
    cfg = SlamConfig.from_yaml(settings, sensor=SENSOR_STEREO)
    ds = KittiStereo(seq)
    s = SlamSystem(cfg)
    run_sequence(s, iter(ds),
                 lambda s_, f: s_.track_stereo(f[1], f[2], f[0]),
                 save_prefix=prefix)


if __name__ == "__main__":
    main()
