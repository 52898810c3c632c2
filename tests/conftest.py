"""Test configuration.

Multi-device (sharding) tests need the virtual 8-device CPU mesh. On the TPU
image the PJRT backend is registered from sitecustomize at interpreter startup,
*before* pytest imports this file — so env vars must be set before Python
starts. Use ``./run_tests.sh`` (or prefix manually):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python -m pytest tests/

Run bare (``python -m pytest tests/``) the suite still passes on the real TPU
chip; tests requiring ≥8 devices skip themselves.
"""
import os

# effective only off-image / when jax is not yet initialized; harmless otherwise
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: a cold suite on this 1-core box spends most
# of its wall time in XLA compiles (>30 min cold vs ~8 min warm). Entries are
# keyed by platform/topology, so sharing the CLIs' cache dir is safe.
from litemkd_tpu.cli.common import enable_compilation_cache  # noqa: E402

enable_compilation_cache(min_compile_secs=1.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute end-to-end chains (deselect with "
        "-m 'not slow' while iterating; the default suite runs them)")
