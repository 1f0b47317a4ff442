"""Test configuration: run everything on CPU with 8 virtual devices.

Sharding logic (shard_map / psum over the scenario and sample mesh axes) is
validated here without TPU hardware, per SURVEY.md section 5 item 3.

This environment pre-imports jax and registers a TPU PJRT plugin in EVERY
python process (sitecustomize on PYTHONPATH) and exports JAX_PLATFORMS for
it, so env-var ``setdefault`` before "import jax" is a no-op. The backend is
not *initialized* until first use, so forcing the platform via
``jax.config.update`` here still works — and keeps the suite off the single
shared TPU (one claim at a time; a second claimant hard-hangs).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # XLA_FLAGS is read at backend *initialization*, which has not happened
    # yet even though jax is already imported.
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compile cache: the suite is scan/jit heavy and CPU compiles
# dominate wall time on re-runs otherwise.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
