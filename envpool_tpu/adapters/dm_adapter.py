"""dm_env adapter.

Mirrors ``envpool/python/dm_envpool.py:29-103``: ``reset``/``step`` return a
``dm_env.TimeStep(step_type, observation, reward, discount)`` whose
observation is a ``State`` namedtuple merging obs and info fields
(``envpool/python/data.py:164-188``).
"""

from __future__ import annotations

from typing import Any

import dm_env

from ..core.env_spec import EnvSpec
from . import data as _data
from .base import EnvPoolBase


class DMEnvPool(EnvPoolBase, dm_env.Environment):
    """Batched dm_env API over the TPU engine."""

    def __init__(self, spec: EnvSpec):
        super().__init__(spec)

    def observation_spec(self) -> tuple:
        if not hasattr(self, "_dm_observation_spec"):
            self._dm_observation_spec = self.spec.observation_spec()
        return self._dm_observation_spec

    def action_spec(self) -> Any:
        if not hasattr(self, "_dm_action_spec"):
            self._dm_action_spec = self.spec.action_spec()
        return self._dm_action_spec

    def _to(self, state: dict[str, Any], reset: bool, return_info: bool):
        obs_keys = [
            k
            for k in state
            if k.startswith("obs") or k.startswith("info:")
        ]
        new_keys = _data.dm_state_keys(obs_keys)
        flat = {nk: state[k] for nk, k in zip(new_keys, obs_keys)}
        nested = _data.to_nested_dict(flat)["State"]
        observation = _data.to_namedtuple("State", nested)
        return dm_env.TimeStep(
            step_type=state["step_type"],
            observation=observation,
            reward=state["reward"],
            discount=state["discount"],
        )
