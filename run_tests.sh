#!/bin/bash
# Run the test suite on the virtual 8-device CPU mesh (exercises the sharding
# tests). See tests/conftest.py for why the env must be set before python
# starts on the TPU image.
#
# Tiers (single-core box, warm compile cache):
#   ./run_tests.sh              full suite — the pre-commit gate (~20 min
#                               warm; up to ~40 min cold or CPU-contended)
#   ./run_tests.sh --fast       -m 'not slow' (~8 min): skips the trajectory
#                               locks, fp64 free-running locks, full-workflow
#                               chain, and reference-executing step goldens.
#                               For iterating; the gate still runs everything.
#   ./run_tests.sh tests/x.py   any pytest args pass through unchanged
if [ "$1" = "--fast" ]; then
    shift
    set -- -m "not slow" -x -q "${@:-tests/}"
fi
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m pytest "${@:-tests/}" $([ $# -eq 0 ] && echo "-x -q")
