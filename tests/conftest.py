"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated host-side via
``--xla_force_host_platform_device_count`` (the strategy SURVEY.md §4
prescribes for TPU builds); the real-chip path is exercised by bench.py.

Note: the environment's sitecustomize force-registers the TPU PJRT plugin
and overrides ``JAX_PLATFORMS``, so we must set the platform through
``jax.config`` *before* the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: most suite wall time is XLA compiles of
# per-(env, num_envs) programs; caching them across runs cuts re-run time.
# Each shard (tools/run_sharded_tests.py sets ENVPOOL_TPU_CACHE_SHARD) gets
# its OWN cache dir: a shared dir written by concurrent shards was observed
# to corrupt on interrupted runs and segfault subsequent suites inside
# jax's compilation_cache reader.
import pathlib  # noqa: E402

_shard = os.environ.get("ENVPOOL_TPU_CACHE_SHARD", "")
_name = ".jax_cache" + (f"_shard{_shard}" if _shard else "")
_cache = pathlib.Path(__file__).resolve().parent.parent / _name
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
