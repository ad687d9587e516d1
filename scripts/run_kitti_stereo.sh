#!/bin/bash
# Canonical KITTI stereo invocation. Usage: run_kitti_stereo.sh <sequence_dir> [settings.yaml]
set -e
cd "$(dirname "$0")/.."
SETTINGS=${2:-/root/reference/Examples/Stereo/KITTI00-02.yaml}
python examples/stereo_kitti.py "$SETTINGS" "$1"
