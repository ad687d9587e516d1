#!/bin/bash
# Canonical EuRoC stereo invocation (the reference's stereo_euroc usage,
# README.md:214-231). Rectification maps come from the settings YAML's
# LEFT./RIGHT. blocks automatically.
# Usage: run_euroc_stereo.sh <sequence_dir e.g. .../MH_01_easy> [settings.yaml]
set -e
cd "$(dirname "$0")/.."
SETTINGS=${2:-/root/reference/Examples/Stereo/EuRoC.yaml}
python examples/stereo_euroc.py "$SETTINGS" "$1"
