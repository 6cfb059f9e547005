"""Core contracts: specs, functional env protocol, engine, registry."""

from .engine import Engine, PoolState
from .env import EnvOut, TpuEnv, merge_config
from .env_spec import EnvSpec
from .specs import ArraySpec

__all__ = [
    "ArraySpec",
    "Engine",
    "EnvOut",
    "EnvSpec",
    "PoolState",
    "TpuEnv",
    "merge_config",
]
