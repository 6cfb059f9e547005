"""CliffWalking — TPU-native functional implementation.

Behavioral reference: ``envpool/toy_text/cliffwalking.h:34-119``.
4x12 grid, start (3,0), goal (3,11); stepping onto the cliff (row 3,
columns 1..10) teleports back to start with reward -100; every move costs
-1.  Slippery variant perturbs the action by U{-1,0,+1} (mod 4) and reports
``info:prob`` = 1/3 (else 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec


class CliffWalkingEnv(TpuEnv):
    DEFAULT_CONFIG = {"is_slippery": False}

    def state_spec(self):
        return {
            "obs": ArraySpec(jnp.int32, (), 0, 47, is_discrete=True),
            "info:prob": ArraySpec(jnp.float32, ()),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.int32, (), 0, 3, is_discrete=True)}

    @property
    def _slippery(self) -> bool:
        return bool(self.config["is_slippery"])

    @property
    def _prob(self) -> float:
        return 1.0 / 3.0 if self._slippery else 1.0

    def reset_env(self, key):
        state = jnp.array([3, 0], jnp.int32)
        return state, {
            "obs": jnp.int32(36),  # 3 * 12 + 0
            "info:prob": jnp.float32(1.0),
        }

    def step_env(self, state, action, key):
        x, y = state
        if self._slippery:
            offset = jax.random.randint(key, (), 0, 3, jnp.int32) - 1
            act = jnp.mod(action + offset + 4, 4)
        else:
            act = action
        # 0: up (x-1), 1: right (y+1), 2: down (x+1), 3: left (y-1).
        dx = jnp.where(act == 0, -1, jnp.where(act == 2, 1, 0))
        dy = jnp.where(act == 1, 1, jnp.where(act == 3, -1, 0))
        x = jnp.clip(x + dx, 0, 3)
        y = jnp.clip(y + dy, 0, 11)
        on_cliff = (x == 3) & (y > 0) & (y < 11)
        reward = jnp.where(on_cliff, -100.0, -1.0).astype(jnp.float32)
        x = jnp.where(on_cliff, 3, x)
        y = jnp.where(on_cliff, 0, y)
        terminated = (x == 3) & (y == 11)
        new_state = jnp.stack([x, y]).astype(jnp.int32)
        return EnvOut(
            state=new_state,
            obs={
                "obs": (x * 12 + y).astype(jnp.int32),
                "info:prob": jnp.float32(self._prob),
            },
            reward=reward,
            terminated=terminated,
        )
