#!/bin/bash
# Canonical TUM fr1/desk invocation (mirrors scripts/run_rgbd_dataset.sh of
# the reference). Usage: run_tum_rgbd.sh <dataset_dir> [settings.yaml]
set -e
cd "$(dirname "$0")/.."
SETTINGS=${2:-/root/reference/Examples/RGB-D/TUM1.yaml}
python examples/rgbd_tum.py "$SETTINGS" "$1"
