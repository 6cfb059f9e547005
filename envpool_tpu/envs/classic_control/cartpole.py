"""CartPole — TPU-native functional implementation.

Behavioral reference: ``envpool/classic_control/cartpole.h:32-133`` (itself
the classic Gym cartpole).  State is ``(x, x_dot, theta, theta_dot)``; reset
draws all four uniformly from ``[-0.05, 0.05]``; dynamics use the standard
Euler integration with tau=0.02; termination when ``|x| > 2.4`` or
``|theta| > 12°``; reward is 1.0 per step (0.0 on the reset transition).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_GRAVITY = 9.8
_MASS_CART = 1.0
_MASS_POLE = 0.1
_MASS_TOTAL = _MASS_CART + _MASS_POLE
_LENGTH = 0.5
_MASS_POLE_LENGTH = _MASS_POLE * _LENGTH
_FORCE_MAG = 10.0
_TAU = 0.02
_THETA_THRESHOLD = 12 * 2 * math.pi / 360
_X_THRESHOLD = 2.4
_INIT_RANGE = 0.05


class CartPoleEnv(TpuEnv):
    DEFAULT_CONFIG = {"reward_threshold": 195.0}

    @property
    def reward_threshold(self) -> float:
        return float(self.config["reward_threshold"])

    def state_spec(self):
        inf = float("inf")
        return {
            "obs": ArraySpec(
                jnp.float32,
                (4,),
                minimum=[-4.8, -inf, -math.pi / 7.5, -inf],
                maximum=[4.8, inf, math.pi / 7.5, inf],
            ),
        }

    def action_spec(self):
        return {
            "action": ArraySpec(jnp.int32, (), 0, 1, is_discrete=True),
        }

    def reset_env(self, key):
        state = jax.random.uniform(
            key, (4,), jnp.float32, -_INIT_RANGE, _INIT_RANGE
        )
        return state, {"obs": state}

    def step_env(self, state, action, key):
        x, x_dot, theta, theta_dot = state
        force = jnp.where(action == 1, _FORCE_MAG, -_FORCE_MAG)
        costheta = jnp.cos(theta)
        sintheta = jnp.sin(theta)
        temp = (
            force + _MASS_POLE_LENGTH * theta_dot * theta_dot * sintheta
        ) / _MASS_TOTAL
        theta_acc = (_GRAVITY * sintheta - costheta * temp) / (
            _LENGTH
            * (4.0 / 3.0 - _MASS_POLE * costheta * costheta / _MASS_TOTAL)
        )
        x_acc = temp - _MASS_POLE_LENGTH * theta_acc * costheta / _MASS_TOTAL
        x = x + _TAU * x_dot
        x_dot = x_dot + _TAU * x_acc
        theta = theta + _TAU * theta_dot
        theta_dot = theta_dot + _TAU * theta_acc
        new_state = jnp.stack([x, x_dot, theta, theta_dot])
        terminated = (
            (x < -_X_THRESHOLD)
            | (x > _X_THRESHOLD)
            | (theta < -_THETA_THRESHOLD)
            | (theta > _THETA_THRESHOLD)
        )
        return EnvOut(
            state=new_state,
            obs={"obs": new_state},
            reward=jnp.float32(1.0),
            terminated=terminated,
        )

    # -- rendering (reference: render_utils RenderCartPole, 600x400) -------

    render_size = (400, 600)

    def render_state(self, state):
        h, w = self.render_size
        x, theta = state[0], state[2]
        scale = w / (2 * 2.4 * 2)
        cart_x = w / 2 + x * scale
        cart_y = h * 0.75
        rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        frame = jnp.full((h, w, 3), 255, jnp.uint8)
        # Track.
        track = (rows >= cart_y + 14) & (rows <= cart_y + 16)
        # Cart 50x30.
        cart = (
            (jnp.abs(cols - cart_x) <= 25)
            & (rows >= cart_y - 15)
            & (rows <= cart_y + 15)
        )
        # Pole: rotate pixels into the pole frame (length 100, width 10).
        dx = cols - cart_x
        dy = cart_y - 15 - rows  # up is positive
        ct, st = jnp.cos(theta), jnp.sin(theta)
        along = dx * st + dy * ct
        across = dx * ct - dy * st
        pole = (along >= 0) & (along <= 100) & (jnp.abs(across) <= 5)
        color = jnp.where(
            pole[..., None],
            jnp.asarray([202, 152, 101], jnp.uint8),
            frame,
        )
        color = jnp.where(
            cart[..., None], jnp.asarray([0, 0, 0], jnp.uint8), color
        )
        color = jnp.where(
            (track & ~cart)[..., None],
            jnp.asarray([0, 0, 0], jnp.uint8),
            color,
        )
        return color
