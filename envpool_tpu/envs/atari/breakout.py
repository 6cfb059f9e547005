"""Breakout — on-device arcade game core.

Plays the reference's ``Breakout-v5`` role with a faithful-behavior
reimplementation on TPU: 210x160 screen, 6x18 brick wall with the classic
row scores (7/7/4/4/1/1), 5 lives (so ``episodic_life`` and
``zero_discount_on_life_loss`` are exercised), 4-action minimal set
[NOOP, FIRE, RIGHT, LEFT], fire-to-serve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame

_WALL = 8           # side wall thickness (columns)
_TOP = 32           # top of play area
_BRICK_TOP = 57     # first brick row (screen y)
_BRICK_H = 6
_BRICK_W = 8
_ROWS, _COLS = 6, 18
_PADDLE_Y = 189
_PADDLE_W = 16
_PADDLE_H = 4
_BALL = 2
_PADDLE_SPEED = 4.0
_LIVES = 5
_POINTS = (7.0, 7.0, 4.0, 4.0, 1.0, 1.0)

# Luma of the classic row colors (top to bottom), walls, paddle/ball.
_ROW_L = (114.0, 130.0, 131.0, 148.0, 124.0, 85.0)
_WALL_L = 142.0
_PADDLE_L = 114.0
_BALL_L = 200.0

_ROW_RGB = (
    (200.0, 72.0, 72.0),
    (198.0, 108.0, 58.0),
    (180.0, 122.0, 48.0),
    (162.0, 162.0, 42.0),
    (72.0, 160.0, 72.0),
    (66.0, 72.0, 200.0),
)


class BreakoutGame(ArcadeGame):
    action_set_size = 4
    has_fire = True
    minimal_set = (0, 1, 3, 4)  # NOOP FIRE RIGHT LEFT
    # ALE Breakout modes 0/4/8/12... flip game variants; the observable
    # Lite effect: higher modes speed the ball up.  Difficulty 1 halves
    # the paddle (the console difficulty switch).
    supported_modes = (0, 4, 8, 12)
    supported_difficulties = (0, 1)

    def _speed_scale(self):
        return 1.0 + 0.15 * (self.mode // 4)

    def _paddle_w(self):
        return _PADDLE_W * (0.5 if self.difficulty == 1 else 1.0)

    def init(self, key):
        return {
            "ball_y": jnp.float32(_PADDLE_Y - _BALL),
            "ball_x": jnp.float32(80.0),
            "vel_y": jnp.float32(0.0),
            "vel_x": jnp.float32(0.0),
            "paddle_x": jnp.float32(72.0),
            "bricks": jnp.ones((_ROWS, _COLS), jnp.bool_),
            "lives": jnp.int32(_LIVES),
            "serve": jnp.bool_(True),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return (g["lives"] <= 0) | ~g["bricks"].any()

    def tick(self, g, action, key):
        over0 = self.over(g)
        right = action == 2
        left = action == 3
        dx = jnp.where(right, _PADDLE_SPEED, jnp.where(left, -_PADDLE_SPEED, 0.0))
        paddle_x = jnp.clip(
            g["paddle_x"] + dx, _WALL, RAW_W - _WALL - self._paddle_w()
        )

        serve = g["serve"]
        fire = action == 1
        launch = serve & fire
        # While serving the ball rides the paddle.
        bx = jnp.where(serve, paddle_x + self._paddle_w() / 2, g["ball_x"])
        by = jnp.where(serve, float(_PADDLE_Y - _BALL), g["ball_y"])
        vx = jnp.where(
            launch,
            jax.random.choice(key, jnp.asarray([-1.0, 1.0], jnp.float32)),
            g["vel_x"],
        )
        vy = jnp.where(launch, -2.0 * self._speed_scale(), g["vel_y"])
        serve = serve & ~fire

        moving = ~serve
        bx = bx + jnp.where(moving, vx, 0.0)
        by = by + jnp.where(moving, vy, 0.0)

        # Side walls and ceiling.
        hit_left = bx < _WALL
        hit_right = bx > RAW_W - _WALL - _BALL
        bx = jnp.clip(bx, _WALL, RAW_W - _WALL - _BALL)
        vx = jnp.where(hit_left | hit_right, -vx, vx)
        hit_top = by < _TOP
        by = jnp.maximum(by, _TOP)
        vy = jnp.where(hit_top, jnp.abs(vy), vy)

        # Brick collision at the ball center.
        cy = by + _BALL / 2
        cx = bx + _BALL / 2
        row = jnp.int32((cy - _BRICK_TOP) // _BRICK_H)
        col = jnp.int32((cx - _WALL) // _BRICK_W)
        in_field = (row >= 0) & (row < _ROWS) & (col >= 0) & (col < _COLS)
        row_c = jnp.clip(row, 0, _ROWS - 1)
        col_c = jnp.clip(col, 0, _COLS - 1)
        brick_here = in_field & g["bricks"][row_c, col_c] & moving
        bricks = g["bricks"].at[row_c, col_c].set(
            jnp.where(brick_here, False, g["bricks"][row_c, col_c])
        )
        points = jnp.asarray(_POINTS, jnp.float32)[row_c]
        reward = jnp.where(brick_here, points, 0.0)
        vy = jnp.where(brick_here, -vy, vy)

        # Paddle bounce.
        on_paddle_row = (by + _BALL >= _PADDLE_Y) & (by < _PADDLE_Y + _PADDLE_H)
        pw = self._paddle_w()
        over_paddle = (bx + _BALL >= paddle_x) & (bx <= paddle_x + pw)
        paddle_hit = moving & on_paddle_row & over_paddle & (vy > 0)
        english = (bx + _BALL / 2 - (paddle_x + pw / 2)) * 0.25
        vy = jnp.where(paddle_hit, -jnp.abs(vy), vy)
        vx = jnp.where(paddle_hit, jnp.clip(vx + english, -2.0, 2.0), vx)
        by = jnp.where(paddle_hit, float(_PADDLE_Y - _BALL), by)

        # Miss → lose a life, back to serve.
        miss = moving & (by > RAW_H - _BALL - 4)
        lives = g["lives"] - miss.astype(jnp.int32)
        serve = serve | miss
        score = g["score"] + reward.astype(jnp.int32)

        new_g = {
            "ball_y": by,
            "ball_x": bx,
            "vel_y": vy,
            "vel_x": vx,
            "paddle_x": paddle_x,
            "bricks": bricks,
            "lives": lives,
            "serve": serve,
            "score": score,
        }
        new_g = jax.tree_util.tree_map(
            lambda old, new: jnp.where(over0, old, new), g, new_g
        )
        reward = jnp.where(over0, 0.0, reward).astype(jnp.float32)
        return new_g, reward, self.over(new_g)

    # -- rendering ---------------------------------------------------------

    def _grids(self):
        rows = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 0)
        cols = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 1)
        return rows, cols

    def _shared_masks(self, g, rows, cols):
        walls = (
            (cols < _WALL) | (cols >= RAW_W - _WALL) | (rows < _TOP)
        ) & (rows >= 17)
        brow = jnp.int32((rows - _BRICK_TOP) // _BRICK_H)
        bcol = jnp.int32((cols - _WALL) // _BRICK_W)
        in_brick_area = (
            (rows >= _BRICK_TOP)
            & (rows < _BRICK_TOP + _ROWS * _BRICK_H)
            & (cols >= _WALL)
            & (cols < RAW_W - _WALL)
        )
        brick_alive = g["bricks"][
            jnp.clip(brow, 0, _ROWS - 1), jnp.clip(bcol, 0, _COLS - 1)
        ]
        brick = in_brick_area & brick_alive
        paddle = (
            (rows >= _PADDLE_Y)
            & (rows < _PADDLE_Y + _PADDLE_H)
            & (cols >= g["paddle_x"])
            & (cols < g["paddle_x"] + self._paddle_w())
        )
        ball = (
            ~g["serve"]
            & (cols >= g["ball_x"])
            & (cols < g["ball_x"] + _BALL)
            & (rows >= g["ball_y"])
            & (rows < g["ball_y"] + _BALL + 1)
        )
        return walls, brick, jnp.clip(brow, 0, _ROWS - 1), paddle, ball

    def render_gray(self, g):
        rows, cols = self._grids()
        walls, brick, brow, paddle, ball = self._shared_masks(g, rows, cols)
        row_luma = jnp.asarray(_ROW_L, jnp.float32)[brow]
        frame = jnp.zeros((RAW_H, RAW_W), jnp.float32)
        frame = jnp.where(walls, _WALL_L, frame)
        frame = jnp.where(brick, row_luma, frame)
        frame = jnp.where(paddle, _PADDLE_L, frame)
        frame = jnp.where(ball, _BALL_L, frame)
        return frame

    def render_rgb(self, g):
        rows, cols = self._grids()
        walls, brick, brow, paddle, ball = self._shared_masks(g, rows, cols)
        rgb = jnp.asarray(_ROW_RGB, jnp.float32)  # [6, 3]
        chans = []
        for c in range(3):
            ch = jnp.zeros((RAW_H, RAW_W), jnp.float32)
            ch = jnp.where(walls, 142.0, ch)
            ch = jnp.where(brick, rgb[brow, c], ch)
            ch = jnp.where(paddle, _ROW_RGB[0][c], ch)
            ch = jnp.where(ball, _ROW_RGB[0][c], ch)
            chans.append(ch)
        return jnp.stack(chans)

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[57].set(jnp.uint8(jnp.clip(g["score"], 0, 255)))
        ram = ram.at[70].set(jnp.uint8(jnp.clip(g["paddle_x"], 0, 255)))
        ram = ram.at[99].set(jnp.uint8(jnp.clip(g["ball_x"], 0, 255)))
        ram = ram.at[101].set(jnp.uint8(jnp.clip(g["ball_y"], 0, 255)))
        ram = ram.at[ jnp.int32(121)].set(g["lives"].astype(jnp.uint8))
        return ram


class BreakoutEnv(ArcadeEnv):
    GAME_CLS = BreakoutGame
