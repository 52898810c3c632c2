#!/bin/bash
# Run the test suite on the virtual 8-device CPU mesh (fast; exercises the
# sharding tests). See tests/conftest.py for why this must be set before
# python starts on the TPU image.
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m pytest "${@:-tests/}" $([ $# -eq 0 ] && echo "-x -q")
