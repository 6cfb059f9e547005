"""Functional single-environment contract.

This is the TPU-native inversion of the reference's stateful C++
``Env<EnvSpec>`` class (``envpool/core/env.h:71-257``): instead of a virtual
``Reset()/Step()/IsDone()`` object that writes into a shared state buffer,
an env here is a *pure function pair*

    ``reset_env(key)                -> (state, obs_dict)``
    ``step_env(state, action, key)  -> EnvOut(state, obs, reward, terminated)``

over an env-specific state pytree.  The engine (``core/engine.py``) vmaps
these over the env-batch axis and fuses auto-reset, truncation, step-type and
discount bookkeeping — the logic the reference spreads over
``Env::Allocate`` (``envpool/core/env.h:224-256``) and the worker loop
(``envpool/core/async_envpool.h:118-132``).

Config semantics mirror ``envpool/core/env_spec.h:26-31``: a common config
(num_envs, batch_size, seed, env_seed, max_episode_steps, ...) merged with the
env family's defaults; unknown keys are rejected at make() time just like the
reference's registry.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .specs import ArraySpec

__all__ = [
    "COMMON_CONFIG",
    "INT32_MAX",
    "EnvOut",
    "TpuEnv",
    "merge_config",
]

INT32_MAX = 2**31 - 1

# Reference: common_config in envpool/core/env_spec.h:26-31.  ``num_threads``
# and ``thread_affinity_offset`` are accepted for drop-in compatibility but
# are no-ops: there is no host thread pool — envs run vectorized on device.
COMMON_CONFIG: dict[str, Any] = {
    "num_envs": 1,
    "batch_size": 0,
    "num_threads": 0,
    "max_num_players": 1,
    "thread_affinity_offset": -1,
    "base_path": "envpool_tpu",
    "seed": 42,
    "env_seed": [],
    "gym_reset_return_info": True,
    "max_episode_steps": INT32_MAX,
    # envpool_tpu extension: when True (default) the gym/dm adapters return
    # host numpy arrays (reference-compatible); when False they return
    # device-resident jax arrays (fast path — no host transfer per step).
    "numpy_output": True,
    # envpool_tpu extension: optional jax.sharding.Sharding for the env
    # axis (see envpool_tpu.parallel).  None = single-device / default.
    "sharding": None,
    # Per-episode demo recording (the .lmp analog, adapters/record.py):
    # directory to write env_<id>_<episode>.npz action traces, "" = off.
    "record_dir": "",
    # "rgb_array" (default: render() returns [B,H,W,3] uint8) or "human"
    # (render() tiles the batch into an OpenCV window and returns None;
    # reference behavior envpool/python/envpool.py:264-295).
    "render_mode": "rgb_array",
}


def merge_config(default_config: dict[str, Any], **kwargs: Any) -> dict[str, Any]:
    """Merge COMMON_CONFIG ⊕ env defaults ⊕ user kwargs.

    Mirrors ``EnvSpec`` construction (``envpool/core/env_spec.h:70-84``):
    validates ``batch_size <= num_envs`` and resolves ``batch_size == 0`` to
    ``num_envs``.
    """
    config = dict(COMMON_CONFIG)
    config.update(default_config)
    unknown = set(kwargs) - set(config)
    if unknown:
        raise TypeError(f"unknown config keys: {sorted(unknown)}")
    config.update(kwargs)
    num_envs = int(config["num_envs"])
    batch_size = int(config["batch_size"])
    if batch_size > num_envs:
        raise ValueError(
            "It is required that batch_size <= num_envs, got num_envs = "
            f"{num_envs}, batch_size = {batch_size}"
        )
    if batch_size == 0:
        config["batch_size"] = num_envs
    env_seed = config["env_seed"]
    if len(env_seed) not in (0, num_envs):
        raise ValueError(
            "`env_seed` must contain exactly one seed for each env"
        )
    return config


@dataclasses.dataclass
class EnvOut:
    """Result of one in-episode env transition (un-batched).

    ``obs`` maps every key of ``state_spec()`` to its new value.  ``reward``
    is float32; ``terminated`` is the env-specific termination (the engine
    or's in time-limit truncation).  ``discount`` may override the default
    ``1 - done`` (used by dm_control-style tasks); ``truncated`` may force
    truncation independent of the time limit.
    """

    state: Any
    obs: dict[str, jax.Array]
    reward: jax.Array
    terminated: jax.Array
    discount: jax.Array | None = None
    truncated: jax.Array | None = None


class TpuEnv:
    """Base class for functional TPU envs.

    Subclasses define ``DEFAULT_CONFIG`` (env-specific config defaults, the
    analog of ``EnvFns::DefaultConfig()``), ``state_spec``/``action_spec``
    (the analog of ``EnvFns::StateSpec/ActionSpec``) and the pure
    ``reset_env``/``step_env``.  All config values must be static Python
    scalars — they are baked into the jitted program.
    """

    DEFAULT_CONFIG: dict[str, Any] = {}
    # Reward threshold exported to adapters (None = no threshold); mirrors
    # the "reward_threshold" config key of the reference families.
    reward_threshold: float | None = None

    def __init__(self, config: dict[str, Any]):
        self.config = config

    # -- static specs ------------------------------------------------------

    def state_spec(self) -> dict[str, ArraySpec]:
        """Env-specific state fields: ``obs``/``obs:*`` and ``info:*`` keys."""
        raise NotImplementedError

    def action_spec(self) -> dict[str, ArraySpec]:
        raise NotImplementedError

    # -- pure dynamics -----------------------------------------------------

    def reset_env(self, key: jax.Array) -> tuple[Any, dict[str, jax.Array]]:
        """Start a fresh episode: returns (state, obs_dict)."""
        raise NotImplementedError

    def reset_env_from(
        self, state: Any, key: jax.Array, full: jax.Array
    ) -> tuple[Any, dict[str, jax.Array]]:
        """Auto-reset transition, seeing the terminal state.

        Most envs ignore ``state`` and start fresh (the default).  Envs with
        continuation semantics — e.g. Atari ``episodic_life``, where a life
        loss ends the *episode* but not the *game*
        (``envpool/atari/atari_env.h:168-183``) — override this.  ``full``
        is True when a full restart is required (explicit reset or
        truncation by ``max_episode_steps``).
        """
        del state, full
        return self.reset_env(key)

    def step_env(self, state: Any, action: Any, key: jax.Array) -> EnvOut:
        """Advance one step; never called on a terminated state."""
        raise NotImplementedError

    # -- optional rendering (RenderableEnv analog, core/env.h:30-38) -------

    render_size: tuple[int, int] | None = None  # (height, width) or None

    def render_state(self, state: Any) -> jax.Array:
        """Device-side rasterization of one env state → [H, W, 3] uint8."""
        raise NotImplementedError(
            f"{type(self).__name__} does not support render"
        )

    # -- helpers -----------------------------------------------------------

    @classmethod
    def from_config(cls, **kwargs: Any) -> "TpuEnv":
        return cls(merge_config(cls.DEFAULT_CONFIG, **kwargs))

    @property
    def max_episode_steps(self) -> int:
        return int(self.config["max_episode_steps"])

    @property
    def num_envs(self) -> int:
        return int(self.config["num_envs"])

    @property
    def max_num_players(self) -> int:
        return int(self.config["max_num_players"])

    def single_action(self, action_tree: Any) -> Any:
        """Normalize an action tree to the value passed to ``step_env``.

        Single-key action specs (the common ``{"action": spec}`` case) are
        unwrapped so ``step_env`` receives the bare array, matching how the
        reference envs read ``action["action"_]``.
        """
        spec = self.action_spec()
        if isinstance(action_tree, dict) and set(action_tree) == set(spec):
            if len(spec) == 1:
                return next(iter(action_tree.values()))
            return action_tree
        return action_tree

    def seeds(self) -> np.ndarray:
        """Per-env integer seeds following ``Env::ResolveSeed``.

        ``seed + env_id`` by default, or the explicit per-env ``env_seed``
        list (``envpool/core/env.h:101-110``).
        """
        num_envs = self.num_envs
        env_seed = self.config["env_seed"]
        if len(env_seed):
            return np.asarray(env_seed, dtype=np.int64)
        return int(self.config["seed"]) + np.arange(num_envs, dtype=np.int64)

    def keys(self) -> jax.Array:
        """Batched PRNG keys, one per env (counter-based, not mt19937)."""
        return jax.vmap(jax.random.PRNGKey)(jnp.asarray(self.seeds()))
