"""Test configuration: run everything on CPU with 8 virtual devices.

Sharding logic (shard_map / psum over the scenario and sample mesh axes) is
validated here without TPU hardware, per SURVEY.md section 5 item 3. Env vars
must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", False)

# Persistent compile cache: the suite is scan/jit heavy and CPU compiles
# dominate wall time on re-runs otherwise.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
