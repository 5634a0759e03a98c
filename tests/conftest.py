"""Test configuration: force a virtual 8-device CPU mesh and float64.

Multi-chip sharding is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count=8``); the real-TPU path is
exercised by ``bench.py`` and the driver's graft entry.  Env vars must be
set before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("HYBRIDSBP_X64", "1")
