"""Pong — on-device arcade game core.

Plays the reference's ``Pong-v5`` role (``envpool/atari/registration.py``,
ALE ROM on CPU) with a faithful-behavior reimplementation running entirely
on TPU: same 210x160 screen geometry, 21-point games, 6-action minimal set
[NOOP, FIRE, UP, DOWN, UPFIRE, DOWNFIRE], reward +1/-1 per point.  The
score digits are not drawn (the play area carries the learning signal);
``info:ram`` encodes scores/positions at the well-known ALE Pong RAM
addresses (13/14 scores, 49/54 ball, 50/51 paddles) as a debugging aid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame

# Playfield geometry (screen rows).
_TOP = 34
_BOT = 194
_PADDLE_H = 16.0
_PLAYER_X = 140  # player paddle columns [140, 144)
_CPU_X = 16
_PADDLE_W = 4
_BALL = 2
_PLAYER_SPEED = 4.0
_CPU_SPEED = 2.0
_SERVE_FRAMES = 40
_MAX_SCORE = 21

# Luma values of the ALE Pong palette (bg (144,72,17), player (92,186,92),
# cpu (213,130,74), ball (236,236,236)).
_BG = 87.0
_PLAYER_L = 147.0
_CPU_L = 148.0
_BALL_L = 236.0
_BAND_L = 236.0

_RGB = {
    "bg": (144.0, 72.0, 17.0),
    "player": (92.0, 186.0, 92.0),
    "cpu": (213.0, 130.0, 74.0),
    "ball": (236.0, 236.0, 236.0),
}


class PongGame(ArcadeGame):
    action_set_size = 6
    has_fire = True
    minimal_set = (0, 1, 3, 4, 11, 12)  # NOOP FIRE RIGHT LEFT R-FIRE L-FIRE
    supported_difficulties = (0, 1)

    def _player_h(self):
        # ALE difficulty switch: position 1 halves the player's paddle.
        return _PADDLE_H * (0.5 if self.difficulty == 1 else 1.0)

    def init(self, key):
        kv = jax.random.split(key, 2)
        return {
            "ball_y": jnp.float32(110.0),
            "ball_x": jnp.float32(78.0),
            "vel_y": _serve_vy(kv[0]),
            "vel_x": jnp.float32(-1.0),
            "player_y": jnp.float32(110.0),
            "cpu_y": jnp.float32(110.0),
            "score_p": jnp.int32(0),
            "score_c": jnp.int32(0),
            "serve_timer": jnp.int32(_SERVE_FRAMES),
            "serve_dir": jnp.float32(-1.0),
        }

    def over(self, g):
        return (g["score_p"] >= _MAX_SCORE) | (g["score_c"] >= _MAX_SCORE)

    def tick(self, g, action, key):
        over0 = self.over(g)
        # Player paddle: UP on actions 2/4, DOWN on 3/5.
        up = (action == 2) | (action == 4)
        down = (action == 3) | (action == 5)
        dy = jnp.where(up, -_PLAYER_SPEED, jnp.where(down, _PLAYER_SPEED, 0.0))
        ph = self._player_h()
        player_y = jnp.clip(g["player_y"] + dy, _TOP, _BOT - ph)

        # CPU paddle tracks the ball (only when the ball approaches it).
        target = g["ball_y"] + _BALL / 2 - _PADDLE_H / 2
        toward = g["vel_x"] < 0
        speed = jnp.where(toward, _CPU_SPEED, 1.0)
        delta = jnp.clip(target - g["cpu_y"], -speed, speed)
        cpu_y = jnp.clip(g["cpu_y"] + delta, _TOP, _BOT - _PADDLE_H)

        serving = g["serve_timer"] > 0
        serve_timer = jnp.maximum(g["serve_timer"] - 1, 0)
        serve_now = serving & (serve_timer == 0)

        # Ball motion (frozen while serving).
        by = g["ball_y"] + jnp.where(serving, 0.0, g["vel_y"])
        bx = g["ball_x"] + jnp.where(serving, 0.0, g["vel_x"])
        vy = g["vel_y"]
        vx = g["vel_x"]

        # Wall bounce.
        hit_top = by < _TOP
        hit_bot = by > _BOT - _BALL
        by = jnp.clip(by, _TOP, _BOT - _BALL)
        vy = jnp.where(hit_top | hit_bot, -vy, vy)

        # Paddle bounces with "english" from the contact point.
        def paddle_hit(bx, by, vx, vy, px, py, moving_right,
                       h=_PADDLE_H):
            over_col = (
                (bx + _BALL >= px) & (bx <= px + _PADDLE_W)
                if moving_right
                else (bx <= px + _PADDLE_W) & (bx + _BALL >= px)
            )
            overlap = (by + _BALL >= py) & (by <= py + h)
            going = (vx > 0) if moving_right else (vx < 0)
            hit = over_col & overlap & going
            english = (by + _BALL / 2 - (py + h / 2)) * 0.25
            new_speed = jnp.minimum(jnp.abs(vx) + 0.25, 2.5)
            vx = jnp.where(hit, jnp.where(moving_right, -new_speed, new_speed), vx)
            vy = jnp.where(hit, jnp.clip(vy + english, -2.0, 2.0), vy)
            return vx, vy, hit

        vx, vy, _ = paddle_hit(
            bx, by, vx, vy, float(_PLAYER_X), player_y, True, ph
        )
        vx, vy, _ = paddle_hit(bx, by, vx, vy, float(_CPU_X), cpu_y, False)

        # Scoring.
        p_scores = bx < 0
        c_scores = bx > RAW_W - _BALL
        scored = p_scores | c_scores
        reward = jnp.where(p_scores, 1.0, jnp.where(c_scores, -1.0, 0.0))
        score_p = g["score_p"] + p_scores.astype(jnp.int32)
        score_c = g["score_c"] + c_scores.astype(jnp.int32)
        serve_timer = jnp.where(scored, _SERVE_FRAMES, serve_timer)
        serve_dir = jnp.where(
            p_scores, -1.0, jnp.where(c_scores, 1.0, g["serve_dir"])
        )
        by = jnp.where(scored, 110.0, by)
        bx = jnp.where(scored, 78.0, bx)

        # Serve launch.
        vy = jnp.where(serve_now, _serve_vy(key), vy)
        vx = jnp.where(serve_now, serve_dir * 1.0, vx)

        new_g = {
            "ball_y": by,
            "ball_x": bx,
            "vel_y": vy,
            "vel_x": vx,
            "player_y": player_y,
            "cpu_y": cpu_y,
            "score_p": score_p,
            "score_c": score_c,
            "serve_timer": serve_timer.astype(jnp.int32),
            "serve_dir": serve_dir.astype(jnp.float32),
        }
        # Freeze everything once the game is over.
        new_g = jax.tree_util.tree_map(
            lambda old, new: jnp.where(over0, old, new), g, new_g
        )
        reward = jnp.where(over0, 0.0, reward).astype(jnp.float32)
        return new_g, reward, self.over(new_g)

    # -- rendering ---------------------------------------------------------

    def _masks(self, g):
        rows = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 0)
        cols = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 1)
        band = (rows < _TOP) | (rows >= _BOT)
        player = (
            (cols >= _PLAYER_X)
            & (cols < _PLAYER_X + _PADDLE_W)
            & (rows >= g["player_y"])
            & (rows < g["player_y"] + self._player_h())
        )
        cpu = (
            (cols >= _CPU_X)
            & (cols < _CPU_X + _PADDLE_W)
            & (rows >= g["cpu_y"])
            & (rows < g["cpu_y"] + _PADDLE_H)
        )
        ball = (
            (g["serve_timer"] == 0)
            & (cols >= g["ball_x"])
            & (cols < g["ball_x"] + _BALL)
            & (rows >= g["ball_y"])
            & (rows < g["ball_y"] + _BALL)
        )
        return band, player, cpu, ball

    def render_gray(self, g):
        band, player, cpu, ball = self._masks(g)
        frame = jnp.full((RAW_H, RAW_W), _BG, jnp.float32)
        frame = jnp.where(band, _BAND_L, frame)
        frame = jnp.where(player, _PLAYER_L, frame)
        frame = jnp.where(cpu, _CPU_L, frame)
        frame = jnp.where(ball, _BALL_L, frame)
        return frame

    def render_rgb(self, g):
        band, player, cpu, ball = self._masks(g)
        chans = []
        for c in range(3):
            ch = jnp.full((RAW_H, RAW_W), _RGB["bg"][c], jnp.float32)
            ch = jnp.where(band, _RGB["ball"][c], ch)
            ch = jnp.where(player, _RGB["player"][c], ch)
            ch = jnp.where(cpu, _RGB["cpu"][c], ch)
            ch = jnp.where(ball, _RGB["ball"][c], ch)
            chans.append(ch)
        return jnp.stack(chans)

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[13].set(g["score_c"].astype(jnp.uint8))
        ram = ram.at[14].set(g["score_p"].astype(jnp.uint8))
        ram = ram.at[49].set(jnp.uint8(jnp.clip(g["ball_x"], 0, 255)))
        ram = ram.at[54].set(jnp.uint8(jnp.clip(g["ball_y"], 0, 255)))
        ram = ram.at[50].set(jnp.uint8(jnp.clip(g["cpu_y"], 0, 255)))
        ram = ram.at[51].set(jnp.uint8(jnp.clip(g["player_y"], 0, 255)))
        return ram


def _serve_vy(key):
    return jax.random.choice(
        key, jnp.asarray([-1.0, -0.5, 0.5, 1.0], jnp.float32)
    )


class PongEnv(ArcadeEnv):
    GAME_CLS = PongGame
