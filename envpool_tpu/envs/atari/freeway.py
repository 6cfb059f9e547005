"""Freeway — on-device arcade game core.

Plays the reference's ``Freeway-v5`` role: a chicken crosses a ten-lane
highway; +1 for each complete crossing; collisions knock the chicken back
down.  Minimal action set [NOOP, UP, DOWN]; the game runs on a 2:16
(8160-frame) timer like the cartridge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame

_CHICKEN_X = 44.0
_CHICKEN_W = 6
_CHICKEN_H = 8
_START_Y = 187.0
_GOAL_Y = 24.0
_SPEED = 1.0
_LANES = 10
_LANE_Y = np.linspace(36.0, 172.0, _LANES)  # lane center rows
_LANE_H = 12.0
_CAR_W = 16.0
_CAR_H = 8.0
# Alternating directions, varied speeds (pixels/frame).
_CAR_SPEED = np.array(
    [1.0, -1.5, 2.0, -1.0, 2.5, -2.5, 1.0, -2.0, 1.5, -1.0]
)
_CAR_LUMA = np.array([120, 140, 160, 110, 180, 130, 150, 170, 125, 145])
_TIMER = 8160


class FreewayGame(ArcadeGame):
    action_set_size = 3
    has_fire = False
    minimal_set = (0, 2, 5)  # NOOP UP DOWN
    # ALE Freeway modes select traffic patterns; difficulty speeds it up.
    supported_modes = (0, 1, 2)
    supported_difficulties = (0, 1)

    def _car_speed(self):
        import numpy as _np

        scale = 1.0 + 0.25 * self.mode + 0.3 * self.difficulty
        return _np.asarray(_CAR_SPEED) * scale

    def init(self, key):
        xs = jax.random.uniform(key, (_LANES,), jnp.float32, 0.0, RAW_W)
        return {
            "y": jnp.float32(_START_Y),
            "cars": xs,
            "score": jnp.int32(0),
            "frame": jnp.int32(0),
            "knock": jnp.int32(0),  # frames of knockback remaining
        }

    def over(self, g):
        return g["frame"] >= _TIMER

    def tick(self, g, action, key):
        over0 = self.over(g)
        up = action == 1
        down = action == 2
        knocked = g["knock"] > 0
        dy = jnp.where(
            knocked,
            3.0,  # sliding back down
            jnp.where(up, -_SPEED, jnp.where(down, _SPEED, 0.0)),
        )
        y = jnp.clip(g["y"] + dy, _GOAL_Y, _START_Y)
        cars = jnp.mod(
            g["cars"] + jnp.asarray(self._car_speed(), jnp.float32), RAW_W
        )
        # Collision in any lane.
        lane_y = jnp.asarray(_LANE_Y, jnp.float32)
        in_lane = jnp.abs(y + _CHICKEN_H / 2 - lane_y) < (
            _LANE_H / 2 + _CHICKEN_H / 2 - 2
        )
        overlap = jnp.abs(cars - _CHICKEN_X) < (_CAR_W + _CHICKEN_W) / 2
        hit = (in_lane & overlap).any() & ~knocked
        knock = jnp.where(
            hit, 10, jnp.maximum(g["knock"] - 1, 0)
        ).astype(jnp.int32)

        crossed = y <= _GOAL_Y
        reward = jnp.where(crossed, 1.0, 0.0).astype(jnp.float32)
        y = jnp.where(crossed, _START_Y, y)
        score = g["score"] + crossed.astype(jnp.int32)
        new_g = {
            "y": y,
            "cars": cars,
            "score": score,
            "frame": g["frame"] + 1,
            "knock": knock,
        }
        new_g = jax.tree_util.tree_map(
            lambda old, new: jnp.where(over0, old, new), g, new_g
        )
        reward = jnp.where(over0, 0.0, reward)
        return new_g, reward, self.over(new_g)

    def render_gray(self, g):
        rows = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 0)
        cols = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 1)
        frame = jnp.full((RAW_H, RAW_W), 100.0, jnp.float32)  # road grey
        # Median strip.
        frame = jnp.where(jnp.abs(rows - 104.0) < 2, 236.0, frame)
        # Cars.
        lane_y = jnp.asarray(_LANE_Y, jnp.float32)
        luma = jnp.asarray(_CAR_LUMA, jnp.float32)
        for i in range(_LANES):
            car = (
                (jnp.abs(rows - lane_y[i]) < _CAR_H / 2)
                & (jnp.abs(cols - g["cars"][i]) < _CAR_W / 2)
            )
            frame = jnp.where(car, luma[i], frame)
        chicken = (
            (jnp.abs(cols - _CHICKEN_X) < _CHICKEN_W / 2)
            & (rows >= g["y"])
            & (rows < g["y"] + _CHICKEN_H)
        )
        return jnp.where(chicken, 252.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        # Road grey, white chicken, colored-ish cars: reuse luma per channel.
        return jnp.stack([gray, gray, gray])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[103].set(g["score"].astype(jnp.uint8))
        ram = ram.at[14].set(jnp.uint8(jnp.clip(g["y"], 0, 255)))
        return ram


class FreewayEnv(ArcadeEnv):
    GAME_CLS = FreewayGame
