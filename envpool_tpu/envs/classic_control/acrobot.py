"""Acrobot — TPU-native functional implementation.

Behavioral reference: ``envpool/classic_control/acrobot.h:32-203``.
State is ``(theta1, theta2, dtheta1, dtheta2)`` plus the torque slot used by
the RK4 integrator.  Reset draws the four state vars from U[-0.1, 0.1).
Step applies torque ``action - 1``, integrates one RK4 step with dt=0.2,
wraps angles into [-pi, pi), clamps velocities to (4π, 9π), terminates when
``-cos(t1) - cos(t1 + t2) > 1`` with reward 0 (else -1).  ``info:state``
exposes the raw angles as in the reference StateSpec.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_G = 9.8
_DT = 0.2
_L = 1.0
_M = 1.0
_LC = 0.5
_I = 1.0
_MAX_VEL1 = 4 * math.pi
_MAX_VEL2 = 9 * math.pi
_INIT_RANGE = 0.1


def _derivs(s, torque):
    theta1, theta2, dtheta1, dtheta2 = s
    cos2 = jnp.cos(theta2)
    d1 = _M * _LC * _LC + _M * (_L * _L + _LC * _LC + 2 * _L * _LC * cos2) + _I * 2
    d2 = _M * (_LC * _LC + _L * _LC * cos2) + _I
    phi2 = _M * _LC * _G * jnp.cos(theta1 + theta2 - math.pi / 2)
    phi1 = (
        -(dtheta2 + 2 * dtheta1) * _M * _L * _LC * dtheta2 * jnp.sin(theta2)
        + _M * (_LC + _L) * _G * jnp.cos(theta1 - math.pi / 2)
        + phi2
    )
    ddtheta2 = (
        torque
        + d2 / d1 * phi1
        - _M * _L * _LC * dtheta1 * dtheta1 * jnp.sin(theta2)
        - phi2
    ) / (_M * _LC * _LC + _I - d2 * d2 / d1)
    ddtheta1 = -(d2 * ddtheta2 + phi1) / d1
    return jnp.stack([dtheta1, dtheta2, ddtheta1, ddtheta2])


def _rk4(s, torque):
    k1 = _derivs(s, torque)
    k2 = _derivs(s + k1 * (_DT / 2), torque)
    k3 = _derivs(s + k2 * (_DT / 2), torque)
    k4 = _derivs(s + k3 * _DT, torque)
    return s + (k1 + 2 * k2 + 2 * k3 + k4) * (_DT / 6.0)


class AcrobotEnv(TpuEnv):
    DEFAULT_CONFIG = {"reward_threshold": -100.0}

    @property
    def reward_threshold(self) -> float:
        return float(self.config["reward_threshold"])

    def state_spec(self):
        return {
            "obs": ArraySpec(
                jnp.float32,
                (6,),
                minimum=[-1.0, -1.0, -1.0, -1.0, -_MAX_VEL1, -_MAX_VEL2],
                maximum=[1.0, 1.0, 1.0, 1.0, _MAX_VEL1, _MAX_VEL2],
            ),
            "info:state": ArraySpec(jnp.float32, (2,)),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.int32, (), 0, 2, is_discrete=True)}

    def _obs(self, s):
        theta1, theta2, dtheta1, dtheta2 = s
        return {
            "obs": jnp.stack(
                [
                    jnp.cos(theta1),
                    jnp.sin(theta1),
                    jnp.cos(theta2),
                    jnp.sin(theta2),
                    dtheta1,
                    dtheta2,
                ]
            ).astype(jnp.float32),
            "info:state": jnp.stack([theta1, theta2]).astype(jnp.float32),
        }

    def reset_env(self, key):
        s = jax.random.uniform(
            key, (4,), jnp.float32, -_INIT_RANGE, _INIT_RANGE
        )
        return s, self._obs(s)

    def step_env(self, state, action, key):
        torque = (action - 1).astype(jnp.float32)
        s = _rk4(state, torque)
        theta1 = jnp.mod(s[0] + math.pi, 2 * math.pi) - math.pi
        theta2 = jnp.mod(s[1] + math.pi, 2 * math.pi) - math.pi
        dtheta1 = jnp.clip(s[2], -_MAX_VEL1, _MAX_VEL1)
        dtheta2 = jnp.clip(s[3], -_MAX_VEL2, _MAX_VEL2)
        new_state = jnp.stack([theta1, theta2, dtheta1, dtheta2])
        terminated = -jnp.cos(theta1) - jnp.cos(theta1 + theta2) > 1
        reward = jnp.where(terminated, 0.0, -1.0).astype(jnp.float32)
        return EnvOut(
            state=new_state,
            obs=self._obs(new_state),
            reward=reward,
            terminated=terminated,
        )
