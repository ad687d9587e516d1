"""Monocular KITTI driver — the analogue of `Examples/Monocular/mono_kitti.cc`.

Usage:
  python examples/mono_kitti.py <settings.yaml> <sequence_dir> [out_prefix]

sequence_dir is a KITTI odometry sequence (image_0/ + times.txt);
settings.yaml can be the reference's own KITTI00-02.yaml.
"""
import sys

from common import run_sequence

from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_MONOCULAR
from orb_slam2_tpu.utils.datasets import KittiMonocular
from orb_slam2_tpu.pipeline.system import SlamSystem


def main():
    settings, seq = sys.argv[1], sys.argv[2]
    prefix = sys.argv[3] if len(sys.argv) > 3 else "mono_kitti"
    cfg = SlamConfig.from_yaml(settings, sensor=SENSOR_MONOCULAR)
    ds = KittiMonocular(seq)
    s = SlamSystem(cfg)
    run_sequence(s, iter(ds), lambda s_, f: s_.track_monocular(f[1], f[0]),
                 save_prefix=prefix)


if __name__ == "__main__":
    main()
