"""MountainCar (discrete & continuous) — TPU-native functional impls.

Behavioral reference: ``envpool/classic_control/mountain_car.h`` and
``mountain_car_continuous.h``.  Reset: pos ~ U[-0.6, -0.4), vel = 0.
Discrete: force (act-1)*0.001, gravity ``cos(3*pos)*0.0025``, goal at 0.5,
reward -1/step.  Continuous: power 0.0015, goal 0.45, reward
``-0.1*act^2`` (+100 on reaching the goal).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_MIN_POS = -1.2
_MAX_POS = 0.6
_MAX_SPEED = 0.07
_GRAVITY = 0.0025


class _MountainCarBase(TpuEnv):
    def state_spec(self):
        return {
            "obs": ArraySpec(
                jnp.float32,
                (2,),
                minimum=[-1.2, -0.07],
                maximum=[0.6, 0.07],
            ),
        }

    def reset_env(self, key):
        pos = jax.random.uniform(key, (), jnp.float32, -0.6, -0.4)
        state = jnp.stack([pos, jnp.float32(0.0)])
        return state, {"obs": state}

    def _integrate(self, pos, vel, accel):
        """Shared clamped Euler update (reference ``Step`` body)."""
        vel = jnp.clip(
            vel + accel - jnp.cos(3 * pos) * _GRAVITY, -_MAX_SPEED, _MAX_SPEED
        )
        pos = jnp.clip(pos + vel, _MIN_POS, _MAX_POS)
        vel = jnp.where((pos == _MIN_POS) & (vel < 0), 0.0, vel)
        return pos, vel


class MountainCarEnv(_MountainCarBase):
    DEFAULT_CONFIG = {"reward_threshold": -110.0}
    _FORCE = 0.001
    _GOAL_POS = 0.5
    _GOAL_VEL = 0.0

    @property
    def reward_threshold(self) -> float:
        return float(self.config["reward_threshold"])

    def action_spec(self):
        return {"action": ArraySpec(jnp.int32, (), 0, 2, is_discrete=True)}

    def step_env(self, state, action, key):
        pos, vel = state
        accel = (action.astype(jnp.float32) - 1) * self._FORCE
        pos, vel = self._integrate(pos, vel, accel)
        terminated = (pos >= self._GOAL_POS) & (vel >= self._GOAL_VEL)
        new_state = jnp.stack([pos, vel])
        return EnvOut(
            state=new_state,
            obs={"obs": new_state},
            reward=jnp.float32(-1.0),
            terminated=terminated,
        )


class MountainCarContinuousEnv(_MountainCarBase):
    DEFAULT_CONFIG = {"reward_threshold": 90.0}
    _POWER = 0.0015
    _GOAL_POS = 0.45
    _GOAL_VEL = 0.0

    @property
    def reward_threshold(self) -> float:
        return float(self.config["reward_threshold"])

    def action_spec(self):
        return {"action": ArraySpec(jnp.float32, (1,), -1.0, 1.0)}

    def step_env(self, state, action, key):
        pos, vel = state
        act = jnp.reshape(action, ()).astype(jnp.float32)
        # Reward uses the *unclipped* action (reference quirk,
        # mountain_car_continuous.h:119-125).
        reward = -0.1 * act * act
        act = jnp.clip(act, -1.0, 1.0)
        pos, vel = self._integrate(pos, vel, act * self._POWER)
        terminated = (pos >= self._GOAL_POS) & (vel >= self._GOAL_VEL)
        reward = jnp.where(terminated, reward + 100.0, reward)
        new_state = jnp.stack([pos, vel])
        return EnvOut(
            state=new_state,
            obs={"obs": new_state},
            reward=reward.astype(jnp.float32),
            terminated=terminated,
        )
