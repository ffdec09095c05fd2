"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding logic is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count``) per SURVEY §4; real-TPU perf is
exercised by ``bench.py``, not the unit suite. Must run before jax import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset axon/tpu
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402

# The image's sitecustomize registers the axon TPU plugin and pins
# JAX_PLATFORMS=axon; the config update (not the env var) wins here.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA:CPU compiles are slow on small hosts;
# cache them across test processes.
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
