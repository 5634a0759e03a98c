"""hybridsbp_tpu — TPU-native hybridized SBP-SAT finite-difference framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference Julia code brittany-erickson/HybridSBP: 1D diagonal-norm SBP
operators, curvilinear multiblock 2D SBP-SAT discretizations of
variable-coefficient elliptic problems, a hybridized (trace/Schur) solver,
rate-and-state friction physics, and the SEAS BP1 earthquake-cycle driver.

Numerics default to float64 (required for high-order SBP convergence
studies); set ``HYBRIDSBP_X64=0`` to opt out before first import for
pure-f32 TPU runs.  Hot paths accept an explicit dtype.
"""
import os

import jax

if os.environ.get("HYBRIDSBP_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

# In this image the axon TPU plugin force-appends itself to jax_platforms,
# overriding the JAX_PLATFORMS env var; honor an explicit platform request
# through jax.config (effective while no backend has been created yet).
if os.environ.get("HYBRIDSBP_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["HYBRIDSBP_PLATFORM"])

# Persistent compilation cache: repeated driver runs (and chunked TPU
# launches) skip the multi-minute tunnel compiles.  Disable with
# HYBRIDSBP_CACHE_DIR=0.
_cache_dir = os.environ.get("HYBRIDSBP_CACHE_DIR",
                            os.path.expanduser("~/.cache/hybridsbp_jax"))
if _cache_dir and _cache_dir != "0":
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

__version__ = "0.1.0"

BC_DIRICHLET = 1
BC_NEUMANN = 2
BC_LOCKED_INTERFACE = 0
BC_JUMP_INTERFACE = 7
