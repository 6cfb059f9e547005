"""envpool_tpu: a TPU-native vectorized RL environment engine.

A from-scratch re-design of the capabilities of EnvPool
(``/root/reference``, sail-sg/envpool) for TPU: env state lives in HBM as a
pytree, steps are pure vmapped functions under ``jit`` with fused auto-reset,
and the env-batch axis shards over a ``jax.sharding.Mesh`` instead of worker
threads and lock-free queues.

Public surface mirrors ``envpool/__init__.py``: ``make``, ``make_dm``,
``make_gym``, ``make_gymnasium``, ``make_spec``, ``list_all_envs``,
``register``.
"""

import envpool_tpu.entry  # noqa: F401  (registers all env families)
from envpool_tpu.core.env import TpuEnv
from envpool_tpu.core.env_spec import EnvSpec
from envpool_tpu.core.protocol import (
    DMEnvPool,
    EnvPool,
    GymnasiumEnvPool,
)
from envpool_tpu.core.registry import (
    list_all_envs,
    make,
    make_dm,
    make_gym,
    make_gymnasium,
    make_spec,
    register,
)

__version__ = "0.1.0"
__all__ = [
    "register",
    "make",
    "make_dm",
    "make_gym",
    "make_gymnasium",
    "make_spec",
    "list_all_envs",
    "EnvSpec",
    "EnvPool",
    "DMEnvPool",
    "GymnasiumEnvPool",
    "TpuEnv",
]
