"""Test configuration: force a virtual 8-device CPU mesh and float64.

Multi-chip sharding is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count=8``); the real-TPU path is
exercised by ``bench.py`` and the driver's graft entry.

NOTE: in this environment the axon TPU plugin force-appends itself to
``jax_platforms`` regardless of the JAX_PLATFORMS env var, so we must
override via jax.config *after* import (before any backend is created) —
otherwise jax compute silently tunnels to the remote TPU and every test
compile pays the tunnel latency.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("HYBRIDSBP_X64", "1")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# ---- second-tier "heavy" tests (VERDICT r3 #10) -------------------------
# The default gate (`python -m pytest tests/ -q`) had drifted to ~17 min;
# the slowest tests whose code paths keep cheaper default coverage (or a
# driver-checked dryrun leg) carry @pytest.mark.heavy and run under
# HYBRIDSBP_HEAVY_TESTS=1 — and always under the HYBRIDSBP_SLOW_TESTS=1
# full-cycle gate, which supersets the heavy tier.
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: second-tier expensive test (set HYBRIDSBP_HEAVY_TESTS=1 "
        "or HYBRIDSBP_SLOW_TESTS=1 to run)")


def pytest_collection_modifyitems(config, items):
    if (os.environ.get("HYBRIDSBP_HEAVY_TESTS") == "1"
            or os.environ.get("HYBRIDSBP_SLOW_TESTS") == "1"):
        return
    skip = pytest.mark.skip(
        reason="heavy tier (set HYBRIDSBP_HEAVY_TESTS=1)")
    for it in items:
        if "heavy" in it.keywords:
            it.add_marker(skip)
