"""Monocular EuRoC driver — the analogue of `Examples/Monocular/mono_euroc.cc`.

Usage:
  python examples/mono_euroc.py <settings.yaml> <sequence_dir> [out_prefix]

Uses cam0 only; the EuRoC mono settings carry the cam0 distortion
coefficients directly (no rectification blocks), matching the reference.
"""
import sys

from common import run_sequence

from orb_slam2_tpu.utils.config import SlamConfig, SENSOR_MONOCULAR
from orb_slam2_tpu.utils.datasets import EurocMonocular
from orb_slam2_tpu.pipeline.system import SlamSystem


def main():
    settings, seq = sys.argv[1], sys.argv[2]
    prefix = sys.argv[3] if len(sys.argv) > 3 else "mono_euroc"
    cfg = SlamConfig.from_yaml(settings, sensor=SENSOR_MONOCULAR)
    ds = EurocMonocular(seq)
    s = SlamSystem(cfg)
    run_sequence(s, iter(ds), lambda s_, f: s_.track_monocular(f[1], f[0]),
                 save_prefix=prefix)


if __name__ == "__main__":
    main()
