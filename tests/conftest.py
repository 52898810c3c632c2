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


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute end-to-end chains (deselect with "
        "-m 'not slow' while iterating; the default suite runs them)")
