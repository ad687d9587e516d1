"""RGB-D TUM driver — the analogue of `Examples/RGB-D/rgbd_tum.cc`.

Usage:
  python examples/rgbd_tum.py <settings.yaml> <sequence_dir> [association_file] [out_prefix]
"""
import sys

from common import run_sequence

from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_RGBD
from orb_slam2_tpu.utils.datasets import TumRGBD
from orb_slam2_tpu.pipeline.system import SlamSystem


def main():
    settings, seq = sys.argv[1], sys.argv[2]
    assoc = sys.argv[3] if len(sys.argv) > 3 else None
    prefix = sys.argv[4] if len(sys.argv) > 4 else "rgbd_tum"
    cfg = SlamConfig.from_yaml(settings, sensor=SENSOR_RGBD)
    ds = TumRGBD(seq, assoc)
    s = SlamSystem(cfg)
    run_sequence(s, iter(ds),
                 lambda s_, f: s_.track_rgbd(f[1], f[2], f[0]),
                 save_prefix=prefix)


if __name__ == "__main__":
    main()
