#!/bin/bash
# Run the test suite on the virtual 8-device CPU mesh (exercises the sharding
# tests). See tests/conftest.py for why the env must be set before python
# starts on the TPU image.
#
# Tiers (single-core box, warm compile cache):
#   ./run_tests.sh              full gate, TIERED: the fast set (-m 'not slow',
#                               structural guards + refexec forward goldens,
#                               ~8 min warm) runs FIRST and -x aborts the gate
#                               on the first red; only then do the multi-minute
#                               fp64 trajectory locks / full-workflow chain
#                               (-m slow) run. A red commit is caught in
#                               minutes, not after the hour-long slow set.
#   ./run_tests.sh --fast       fast set only (~8 min): for iterating. The
#                               commit discipline (CLAUDE.md): commit on green
#                               --fast mid-round; the full tiered gate is the
#                               pre-snapshot / end-of-stretch act.
#   ./run_tests.sh tests/x.py   any pytest args pass through unchanged
ENV="env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8"
if [ "$1" = "--fast" ]; then
    shift
    exec $ENV python -m pytest -m "not slow" -x -q "${@:-tests/}"
fi
if [ $# -gt 0 ]; then
    exec $ENV python -m pytest "$@"
fi
# Full gate: fast tier first (fail fast), then the slow tier.
$ENV python -m pytest -m "not slow" -x -q tests/ || exit $?
exec $ENV python -m pytest -m "slow" -x -q tests/
