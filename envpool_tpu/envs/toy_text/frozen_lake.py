"""FrozenLake — TPU-native functional implementation.

Behavioral reference: ``envpool/toy_text/frozen_lake.h:34-137``.  Slippery
dynamics: the intended action is perturbed by a uniform draw from {-1,0,+1}
(mod 4) every step.  4x4 or 8x8 fixed maps; falling in a hole (H) ends the
episode with reward 0, reaching the goal (G) with reward 1.  Observation is
the flat cell index ``x * size + y``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_MAP4 = ["SFFF", "FHFH", "FFFH", "HFFG"]
_MAP8 = [
    "SFFFFFFF",
    "FFFFFFFF",
    "FFFHFFFF",
    "FFFFFHFF",
    "FFFHFFFF",
    "FHHFFFHF",
    "FHFFHFHF",
    "FFFHFFFG",
]


class FrozenLakeEnv(TpuEnv):
    DEFAULT_CONFIG = {"reward_threshold": 0.7, "size": 4}

    @property
    def reward_threshold(self) -> float:
        return float(self.config["reward_threshold"])

    @property
    def _size(self) -> int:
        return int(self.config["size"])

    def _map(self) -> np.ndarray:
        rows = _MAP8 if self._size == 8 else _MAP4
        return np.array([[c for c in row] for row in rows])

    def state_spec(self):
        n = self._size * self._size
        return {"obs": ArraySpec(jnp.int32, (), 0, n - 1, is_discrete=True)}

    def action_spec(self):
        return {"action": ArraySpec(jnp.int32, (), 0, 3, is_discrete=True)}

    def reset_env(self, key):
        state = jnp.zeros(2, jnp.int32)  # (x, y)
        return state, {"obs": jnp.int32(0)}

    def step_env(self, state, action, key):
        size = self._size
        grid = self._map()
        is_hole = jnp.asarray(grid == "H")
        is_goal = jnp.asarray(grid == "G")
        x, y = state
        # act = (act + U{-1,0,1} + 4) % 4 — the slip (frozen_lake.h:96).
        slip = jax.random.randint(key, (), -1, 2, jnp.int32)
        act = jnp.mod(action + slip + 4, 4)
        # 0: left (y-1), 1: down (x+1), 2: right (y+1), 3: up (x-1).
        dx = jnp.where(act == 1, 1, jnp.where(act == 3, -1, 0))
        dy = jnp.where(act == 2, 1, jnp.where(act == 0, -1, 0))
        x = jnp.clip(x + dx, 0, size - 1)
        y = jnp.clip(y + dy, 0, size - 1)
        hole = is_hole[x, y]
        goal = is_goal[x, y]
        terminated = hole | goal
        reward = jnp.where(goal, 1.0, 0.0).astype(jnp.float32)
        new_state = jnp.stack([x, y]).astype(jnp.int32)
        return EnvOut(
            state=new_state,
            obs={"obs": (x * size + y).astype(jnp.int32)},
            reward=reward,
            terminated=terminated,
        )
