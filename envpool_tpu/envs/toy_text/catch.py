"""Catch (bsuite) — TPU-native functional implementation.

Behavioral reference: ``envpool/toy_text/catch.h:29-96``.  A ball falls from
row 0 in a random column; the paddle moves on the bottom row; when the ball
reaches row ``height-2``... (reference: episode ends when ``++x == height-1``)
reward is +1 if caught else -1.  Observation is the (height, width) board
with ball and paddle cells set to 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec


class CatchEnv(TpuEnv):
    DEFAULT_CONFIG = {"height": 10, "width": 5}

    @property
    def _height(self) -> int:
        return int(self.config["height"])

    @property
    def _width(self) -> int:
        return int(self.config["width"])

    def state_spec(self):
        return {
            "obs": ArraySpec(
                jnp.float32, (self._height, self._width), 0.0, 1.0
            ),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.int32, (), 0, 2, is_discrete=True)}

    def _obs(self, x, y, paddle):
        board = jnp.zeros((self._height, self._width), jnp.float32)
        board = board.at[x, y].set(1.0)
        board = board.at[self._height - 1, paddle].set(1.0)
        return {"obs": board}

    def reset_env(self, key):
        y = jax.random.randint(key, (), 0, self._width, jnp.int32)
        x = jnp.int32(0)
        paddle = jnp.int32(self._width // 2)
        state = jnp.stack([x, y, paddle])
        return state, self._obs(x, y, paddle)

    def step_env(self, state, action, key):
        x, y, paddle = state
        paddle = jnp.clip(paddle + action - 1, 0, self._width - 1)
        x = x + 1
        terminated = x == self._height - 1
        reward = jnp.where(
            terminated,
            jnp.where(y == paddle, 1.0, -1.0),
            0.0,
        ).astype(jnp.float32)
        new_state = jnp.stack([x, y, paddle]).astype(jnp.int32)
        return EnvOut(
            state=new_state,
            obs=self._obs(x, y, paddle),
            reward=reward,
            terminated=terminated,
        )
