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

# Persistent compilation cache: OPT-IN for test runs
# (ENVPOOL_TPU_COMPILE_CACHE=1).  Two distinct native crashes were
# observed inside jax's CPU-executable cache layer on this suite —
# SIGSEGV in get_executable_and_time reading an entry truncated by an
# interrupted run, and SIGABRT in put_executable_and_time serializing a
# large program — so correctness-critical suite runs default to no
# persistent cache.  When enabled, each shard (run_sharded_tests.py sets
# ENVPOOL_TPU_CACHE_SHARD) gets its OWN dir, and the runner quarantines
# dirs whose previous run died mid-write (.running sentinel).
import pathlib  # noqa: E402

if os.environ.get("ENVPOOL_TPU_COMPILE_CACHE", "") == "1":
    _shard = os.environ.get("ENVPOOL_TPU_CACHE_SHARD", "")
    _name = ".jax_cache" + (f"_shard{_shard}" if _shard else "")
    _cache = pathlib.Path(__file__).resolve().parent.parent / _name
    _cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
