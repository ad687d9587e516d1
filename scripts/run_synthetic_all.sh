#!/bin/bash
# Run all three sensor modes on the synthetic world (CPU) — smoke check.
set -e
cd "$(dirname "$0")/.."
for sensor in rgbd stereo mono; do
  echo "=== $sensor ==="
  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
    python examples/run_synthetic.py --frames 30 --sensor $sensor --cpu
done
