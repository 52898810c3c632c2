"""Driver entry-point checks.

The driver compile-checks ``entry()`` single-chip and runs
``dryrun_multichip(8)`` in whatever environment it happens to have — on this
image that's the single-TPU axon env, where fewer than 8 devices exist. The
entry must therefore bootstrap its own virtual mesh (subprocess re-exec with
the CPU-mesh env) rather than assume the caller configured one.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__graft_entry__.py")


def _unconfigured_env(n_visible_devices: int = 1) -> dict:
    """An env where the current process would see < 8 devices.

    Mirrors the driver's situation (single real chip): CPU backend with the
    default single host device, no mesh flags, no bootstrap marker.
    """
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count"))
    if n_visible_devices != 1:
        env["XLA_FLAGS"] = (
            env["XLA_FLAGS"]
            + f" --xla_force_host_platform_device_count={n_visible_devices}"
        ).strip()
    env.pop("LITEMKD_MULTICHIP_BOOTSTRAPPED", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_from_single_device_env():
    """dryrun_multichip(8) must pass when the calling process has 1 device."""
    proc = subprocess.run(
        [sys.executable, "-c",
         "import importlib.util, jax\n"
         "assert len(jax.devices()) == 1, jax.devices()\n"
         f"spec = importlib.util.spec_from_file_location('ge', {ENTRY!r})\n"
         "m = importlib.util.module_from_spec(spec)\n"
         "spec.loader.exec_module(m)\n"
         "m.dryrun_multichip(8)\n"],
        env=_unconfigured_env(), capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multichip OK" in proc.stdout


def test_dryrun_multichip_inline_when_devices_present():
    """With >= 8 devices already visible, no subprocess is spawned."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh env")
    import importlib.util
    spec = importlib.util.spec_from_file_location("ge_inline", ENTRY)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)  # runs inline; raises on failure
