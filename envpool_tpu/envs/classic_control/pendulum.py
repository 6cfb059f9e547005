"""Pendulum — TPU-native functional implementation.

Behavioral reference: ``envpool/classic_control/pendulum.h:30-147``.
Reset: theta ~ U[-pi, pi), theta_dot ~ U[-1, 1).  Step: torque clipped to
[-2, 2]; cost ``theta^2 + 0.1*theta_dot^2 + 0.001*u^2`` on the *pre-update*
state; semi-implicit Euler with dt=0.05; theta wrapped into [-pi, pi).

Version quirk preserved from the reference: v0 integrates theta with the
*unclamped* new theta_dot before the speed clamp; v1 integrates after the
clamp is stored but also uses the unclamped value (``pendulum.h:103-117``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_MAX_SPEED = 8.0
_MAX_TORQUE = 2.0
_DT = 0.05
_GRAVITY = 10.0


class PendulumEnv(TpuEnv):
    DEFAULT_CONFIG = {"version": 0}

    def state_spec(self):
        return {
            "obs": ArraySpec(
                jnp.float32,
                (3,),
                minimum=[-1.0, -1.0, -8.0],
                maximum=[1.0, 1.0, 8.0],
            ),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.float32, (1,), -2.0, 2.0)}

    def _obs(self, theta, theta_dot):
        return {
            "obs": jnp.stack(
                [jnp.cos(theta), jnp.sin(theta), theta_dot]
            ).astype(jnp.float32)
        }

    def reset_env(self, key):
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(
            k1, (), jnp.float32, -math.pi, math.pi
        )
        theta_dot = jax.random.uniform(k2, (), jnp.float32, -1.0, 1.0)
        state = jnp.stack([theta, theta_dot])
        return state, self._obs(theta, theta_dot)

    def step_env(self, state, action, key):
        theta, theta_dot = state
        u = jnp.clip(
            jnp.reshape(action, ()).astype(jnp.float32),
            -_MAX_TORQUE,
            _MAX_TORQUE,
        )
        cost = theta * theta + 0.1 * theta_dot * theta_dot + 0.001 * u * u
        new_theta_dot = (
            theta_dot + 3 * (_GRAVITY / 2 * jnp.sin(theta) + u) * _DT
        )
        # Both versions advance theta by the *unclamped* velocity; the clamp
        # only affects the stored velocity (reference quirk, see docstring).
        theta = theta + new_theta_dot * _DT
        theta_dot = jnp.clip(new_theta_dot, -_MAX_SPEED, _MAX_SPEED)
        # Wrap into [-pi, pi) — reference uses a while loop; one fmod-style
        # wrap is exact for any reachable velocity.
        theta = jnp.mod(theta + math.pi, 2 * math.pi) - math.pi
        new_state = jnp.stack([theta, theta_dot])
        return EnvOut(
            state=new_state,
            obs=self._obs(theta, theta_dot),
            reward=(-cost).astype(jnp.float32),
            terminated=jnp.bool_(False),
        )
