"""Space Invaders — on-device arcade game core.

Plays the reference's ``SpaceInvaders-v5`` role: a 6x6 alien grid marches
and descends, the cannon fires one shot at a time, aliens bomb back.
Minimal action set [NOOP, FIRE, RIGHT, LEFT, RIGHTFIRE, LEFTFIRE]; scores
follow the cartridge's 5..30 per-row values; 3 lives; the wave respawns
after being cleared.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame

_ROWS, _COLS = 6, 6
_ALIEN_W, _ALIEN_H = 8, 8
_GRID_DX, _GRID_DY = 16, 14
_GRID_W = (_COLS - 1) * _GRID_DX + _ALIEN_W
_PLAYER_Y = 185.0
_PLAYER_W = 8
_SHOT_SPEED = 4.0
_BOMB_SPEED = 2.0
_MARCH_DX = 0.35
_DESCEND = 6.0
_LIVES = 3
# Row scores, top row first (cartridge: 30, 25, 20, 15, 10, 5).
_ROW_SCORE = np.array([30.0, 25.0, 20.0, 15.0, 10.0, 5.0])


class SpaceInvadersGame(ArcadeGame):
    action_set_size = 6
    has_fire = True

    def init(self, key):
        return {
            "alien_x": jnp.float32(20.0),   # grid left edge
            "alien_y": jnp.float32(32.0),   # grid top edge
            "alien_dir": jnp.float32(1.0),
            "alive": jnp.ones((_ROWS, _COLS), jnp.bool_),
            "player_x": jnp.float32(76.0),
            "shot_x": jnp.float32(0.0),
            "shot_y": jnp.float32(-1.0),    # <0 → inactive
            "bomb_x": jnp.float32(0.0),
            "bomb_y": jnp.float32(-1.0),
            "lives": jnp.int32(_LIVES),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        reached = g["alien_y"] + _ROWS * _GRID_DY >= _PLAYER_Y
        return (g["lives"] <= 0) | reached

    def tick(self, g, action, key):
        over0 = self.over(g)
        right = (action == 2) | (action == 4)
        left = (action == 3) | (action == 5)
        fire = (action == 1) | (action == 4) | (action == 5)
        px = jnp.clip(
            g["player_x"]
            + jnp.where(right, 2.0, 0.0)
            - jnp.where(left, 2.0, 0.0),
            8.0,
            RAW_W - 8.0 - _PLAYER_W,
        )

        # March: flip + descend at the walls.
        speed = _MARCH_DX * (
            1.0 + 2.0 * (1.0 - g["alive"].mean())  # speeds up as aliens die
        )
        ax = g["alien_x"] + g["alien_dir"] * speed
        cols_alive = g["alive"].any(axis=0)
        first = jnp.argmax(cols_alive)
        last = _COLS - 1 - jnp.argmax(cols_alive[::-1])
        left_edge = ax + first * _GRID_DX
        right_edge = ax + last * _GRID_DX + _ALIEN_W
        hit_wall = (left_edge <= 4) | (right_edge >= RAW_W - 4)
        new_dir = jnp.where(hit_wall, -g["alien_dir"], g["alien_dir"])
        ay = g["alien_y"] + jnp.where(hit_wall, _DESCEND, 0.0)
        ax = jnp.where(hit_wall, g["alien_x"], ax)

        # Player shot.
        can_fire = g["shot_y"] < 0
        shot_x = jnp.where(can_fire & fire, px + _PLAYER_W / 2, g["shot_x"])
        shot_y = jnp.where(
            can_fire & fire, _PLAYER_Y - 2, g["shot_y"] - _SHOT_SPEED
        )
        # Shot vs aliens.
        col_f = (shot_x - ax) / _GRID_DX
        row_f = (shot_y - ay) / _GRID_DY
        col = jnp.int32(jnp.floor(col_f))
        row = jnp.int32(jnp.floor(row_f))
        in_grid = (
            (col >= 0) & (col < _COLS) & (row >= 0) & (row < _ROWS)
            & (shot_y >= 0)
        )
        colc = jnp.clip(col, 0, _COLS - 1)
        rowc = jnp.clip(row, 0, _ROWS - 1)
        within = (
            (shot_x - (ax + colc * _GRID_DX) < _ALIEN_W)
            & (shot_y - (ay + rowc * _GRID_DY) < _ALIEN_H)
        )
        hit = in_grid & within & g["alive"][rowc, colc]
        alive = g["alive"].at[rowc, colc].set(
            jnp.where(hit, False, g["alive"][rowc, colc])
        )
        reward = jnp.where(
            hit, jnp.asarray(_ROW_SCORE, jnp.float32)[rowc], 0.0
        )
        shot_y = jnp.where(hit | (shot_y < 0), -1.0, shot_y)

        # Alien bomb: dropped by a random alive alien when none active.
        k1, k2 = jax.random.split(key)
        logits = jnp.where(alive.reshape(-1), 0.0, -jnp.inf)
        bomber = jax.random.categorical(k1, logits)
        b_col = bomber % _COLS
        b_row = bomber // _COLS
        drop = (g["bomb_y"] < 0) & alive.any() & (
            jax.random.uniform(k2) < 0.03
        )
        bomb_x = jnp.where(
            drop, ax + b_col * _GRID_DX + _ALIEN_W / 2, g["bomb_x"]
        )
        bomb_y = jnp.where(
            drop,
            ay + b_row * _GRID_DY + _ALIEN_H,
            g["bomb_y"] + jnp.where(g["bomb_y"] >= 0, _BOMB_SPEED, 0.0),
        )
        # Bomb vs player.
        bomb_hit = (
            (bomb_y >= _PLAYER_Y)
            & (bomb_y <= _PLAYER_Y + 8)
            & (jnp.abs(bomb_x - (px + _PLAYER_W / 2)) < _PLAYER_W)
        )
        lives = g["lives"] - bomb_hit.astype(jnp.int32)
        bomb_y = jnp.where(bomb_hit | (bomb_y > RAW_H), -1.0, bomb_y)

        # Wave cleared → respawn grid.
        cleared = ~alive.any()
        alive = jnp.where(cleared, jnp.ones_like(alive), alive)
        ay = jnp.where(cleared, 32.0, ay)
        ax = jnp.where(cleared, 20.0, ax)

        new_g = {
            "alien_x": ax,
            "alien_y": ay,
            "alien_dir": new_dir,
            "alive": alive,
            "player_x": px,
            "shot_x": shot_x,
            "shot_y": shot_y,
            "bomb_x": bomb_x,
            "bomb_y": bomb_y,
            "lives": lives,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        new_g = jax.tree_util.tree_map(
            lambda old, new: jnp.where(over0, old, new), g, new_g
        )
        reward = jnp.where(over0, 0.0, reward).astype(jnp.float32)
        return new_g, reward, self.over(new_g)

    def render_gray(self, g):
        rows = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 0)
        cols = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 1)
        frame = jnp.zeros((RAW_H, RAW_W), jnp.float32)
        # Aliens: one mask per grid row/col (static loop, 36 cells).
        for r in range(_ROWS):
            for c in range(_COLS):
                x0 = g["alien_x"] + c * _GRID_DX
                y0 = g["alien_y"] + r * _GRID_DY
                cell = (
                    g["alive"][r, c]
                    & (cols >= x0)
                    & (cols < x0 + _ALIEN_W)
                    & (rows >= y0)
                    & (rows < y0 + _ALIEN_H)
                )
                frame = jnp.where(cell, 180.0, frame)
        player = (
            (rows >= _PLAYER_Y)
            & (rows < _PLAYER_Y + 8)
            & (cols >= g["player_x"])
            & (cols < g["player_x"] + _PLAYER_W)
        )
        frame = jnp.where(player, 140.0, frame)
        shot = (
            (g["shot_y"] >= 0)
            & (jnp.abs(cols - g["shot_x"]) < 1.5)
            & (jnp.abs(rows - g["shot_y"]) < 4)
        )
        bomb = (
            (g["bomb_y"] >= 0)
            & (jnp.abs(cols - g["bomb_x"]) < 1.5)
            & (jnp.abs(rows - g["bomb_y"]) < 4)
        )
        frame = jnp.where(shot | bomb, 236.0, frame)
        return frame

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.3, gray, gray * 0.3])  # green tint

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[17].set(jnp.uint8(jnp.clip(g["score"] % 256, 0, 255)))
        ram = ram.at[73].set(g["lives"].astype(jnp.uint8))
        return ram


class SpaceInvadersEnv(ArcadeEnv):
    GAME_CLS = SpaceInvadersGame
