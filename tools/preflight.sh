#!/bin/sh
# Pre-snapshot gate (VERDICT r4 #7: round 4 shipped a failing committed
# test). Run before any end-of-round snapshot / after any prover-path
# change:
#   sh tools/preflight.sh          # full suite + entry/dryrun
#   sh tools/preflight.sh quick    # prover-path tests only
# Exits nonzero on any failure. Uses the 8-device CPU mesh (tests'
# conftest sets JAX_PLATFORMS=cpu + host_platform_device_count=8).
set -e
cd "$(dirname "$0")/.."

if [ "$1" = "quick" ]; then
    python -m pytest tests/test_prover_device.py tests/test_glv.py \
        tests/test_msm_configs.py -x -q
else
    python -m pytest tests/ -x -q
fi

JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python __graft_entry__.py
echo "preflight: ALL GREEN"
