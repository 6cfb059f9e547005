"""Arcade wave 18: HumanCannonball, MiniatureGolf, JourneyEscape,
LostLuggage, Pacman, ElevatorAction — closing the non-57 ALE roster.

Behavioral reference: the corresponding ALE ROMs registered by
``envpool/atari/registration.py:21-35``; Lite-core caveats as wave 12.
Pacman is the 2600 original's maze loop — a DISTINCT core from the
MsPacman wave-3 game (different maze topology, single pursuing ghost
with scatter phases, center tunnel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame
from .wave3_games import _freeze_when, _grids
from .wave12_games import _joy


# ---------------------------------------------------------------------------
# HumanCannonball: set barrel angle and powder, fire through the wind
# into the water tower; 7 shots.
# ---------------------------------------------------------------------------


class HumanCannonballGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "angle": jnp.float32(45.0),
            "power": jnp.float32(50.0),
            "tower_x": jax.random.uniform(k1, (), jnp.float32,
                                          90.0, RAW_W - 15.0),
            "wind": jax.random.uniform(k2, (), jnp.float32, -0.5, 0.5),
            "fly_x": jnp.float32(-1.0), "fly_y": jnp.float32(0.0),
            "fvx": jnp.float32(0.0), "fvy": jnp.float32(0.0),
            "shots": jnp.int32(0),
            "hits": jnp.int32(0),
        }

    def lives(self, g):
        return 7 - g["shots"]

    def over(self, g):
        return g["shots"] >= 7

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        flying = g["fly_x"] >= 0.0
        angle = jnp.clip(
            g["angle"] + (up.astype(jnp.float32)
                          - down.astype(jnp.float32)) * (~flying),
            15.0, 80.0,
        )
        power = jnp.clip(
            g["power"] + (right.astype(jnp.float32)
                          - left.astype(jnp.float32)) * (~flying),
            20.0, 90.0,
        )
        # Launch.
        rad = angle * (np.pi / 180.0)
        launch = fire & ~flying
        fvx = jnp.where(launch, power * 0.055 * jnp.cos(rad), g["fvx"])
        fvy = jnp.where(launch, -power * 0.055 * jnp.sin(rad), g["fvy"])
        fly_x = jnp.where(launch, 12.0, g["fly_x"])
        fly_y = jnp.where(launch, 180.0, g["fly_y"])
        # Ballistics with wind.
        fvx = jnp.where(flying, fvx + g["wind"] * 0.02, fvx)
        fvy = jnp.where(flying, fvy + 0.09, fvy)
        fly_x = jnp.where(flying, fly_x + fvx, fly_x)
        fly_y = jnp.where(flying, fly_y + fvy, fly_y)
        landed = flying & (fly_y >= 180.0) & (fvy > 0.0)
        in_tower = landed & (jnp.abs(fly_x - g["tower_x"]) < 10.0)
        reward = jnp.where(in_tower, 1.0, 0.0)
        shot_done = landed | (flying & (fly_x > RAW_W + 5.0))
        k1, k2 = jax.random.split(key)
        tower_x = jnp.where(
            in_tower,
            jax.random.uniform(k1, (), jnp.float32, 90.0, RAW_W - 15.0),
            g["tower_x"],
        )
        wind = jnp.where(
            shot_done, jax.random.uniform(k2, (), jnp.float32, -0.5, 0.5),
            g["wind"],
        )
        fly_x = jnp.where(shot_done, -1.0, fly_x)
        g2 = {
            "angle": angle, "power": power, "tower_x": tower_x,
            "wind": wind, "fly_x": fly_x, "fly_y": fly_y,
            "fvx": fvx, "fvy": fvy,
            "shots": g["shots"] + shot_done.astype(jnp.int32),
            "hits": g["hits"] + in_tower.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 26.0, jnp.float32)
        ground = rows > 186
        frame = jnp.where(ground, 70.0, frame)
        # Cannon barrel (angle-coded bar) + powder gauge.
        rad = g["angle"] * (np.pi / 180.0)
        bx = 12.0 + (cols - 12.0)
        on_barrel = (
            (cols > 8) & (cols < 30)
            & (jnp.abs((186.0 - rows) - (cols - 8.0)
                       * jnp.tan(rad)) < 3.0)
        )
        frame = jnp.where(on_barrel, 200.0, frame)
        gauge = (rows < 8) & (cols < g["power"] * 1.5)
        frame = jnp.where(gauge, 150.0, frame)
        tower = (
            (rows > 150) & (rows < 186)
            & (jnp.abs(cols - g["tower_x"]) < 10)
        )
        frame = jnp.where(tower, 110.0, frame)
        man = (
            (g["fly_x"] >= 0.0)
            & (jnp.abs(rows - g["fly_y"]) < 4)
            & (jnp.abs(cols - g["fly_x"]) < 3)
        )
        return jnp.where(man, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.8, gray * 0.6])


class HumanCannonballEnv(ArcadeEnv):
    GAME_CLS = HumanCannonballGame


# ---------------------------------------------------------------------------
# MiniatureGolf: putt around the moving block into the cup; strokes
# count against you, 9 holes.
# ---------------------------------------------------------------------------


class MiniatureGolfGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "bx": jnp.float32(20.0), "by": jnp.float32(180.0),
            "bvx": jnp.float32(0.0), "bvy": jnp.float32(0.0),
            "aim": jnp.float32(45.0),
            "cup_x": jax.random.uniform(k1, (), jnp.float32, 100.0, 150.0),
            "cup_y": jax.random.uniform(k2, (), jnp.float32, 40.0, 80.0),
            "block_x": jnp.float32(80.0), "block_v": jnp.float32(1.0),
            "hole": jnp.int32(0),
            "strokes": jnp.int32(0),
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return g["hole"] >= 9

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        moving = (jnp.abs(g["bvx"]) + jnp.abs(g["bvy"])) > 0.1
        aim = (g["aim"] + 3.0 * (right.astype(jnp.float32)
                                 - left.astype(jnp.float32))) % 360.0
        # Putt power from UP (soft) / DOWN (hard) + FIRE.
        power = jnp.where(up, 2.5, jnp.where(down, 6.0, 4.0))
        rad = aim * (np.pi / 180.0)
        putt = fire & ~moving
        bvx = jnp.where(putt, power * jnp.cos(rad), g["bvx"] * 0.97)
        bvy = jnp.where(putt, -power * jnp.sin(rad), g["bvy"] * 0.97)
        bx = g["bx"] + bvx
        by = g["by"] + bvy
        # Wall bounces.
        bvx = jnp.where((bx < 6.0) | (bx > RAW_W - 6.0), -bvx, bvx)
        bvy = jnp.where((by < 25.0) | (by > 195.0), -bvy, bvy)
        bx = jnp.clip(bx, 6.0, RAW_W - 6.0)
        by = jnp.clip(by, 25.0, 195.0)
        # The patrolling block reflects the ball.
        block_x = g["block_x"] + g["block_v"]
        block_v = jnp.where(
            (block_x < 50.0) | (block_x > 110.0), -g["block_v"],
            g["block_v"],
        )
        hit_block = (jnp.abs(bx - block_x) < 12.0) & (
            jnp.abs(by - 110.0) < 12.0
        )
        bvx = jnp.where(hit_block, -bvx, bvx)
        bvy = jnp.where(hit_block, -bvy, bvy)
        # Stop when slow.
        stopped = (jnp.abs(bvx) + jnp.abs(bvy)) < 0.15
        bvx = jnp.where(stopped, 0.0, bvx)
        bvy = jnp.where(stopped, 0.0, bvy)
        sunk = (
            (jnp.abs(bx - g["cup_x"]) < 5.0)
            & (jnp.abs(by - g["cup_y"]) < 5.0)
        )
        # Par scoring: reward decreases with strokes on the hole.
        reward = jnp.where(sunk, 10.0, 0.0) - jnp.where(putt, 1.0, 0.0)
        ks = jax.random.split(key, 2)
        cup_x = jnp.where(
            sunk, jax.random.uniform(ks[0], (), jnp.float32, 100.0, 150.0),
            g["cup_x"],
        )
        cup_y = jnp.where(
            sunk, jax.random.uniform(ks[1], (), jnp.float32, 40.0, 80.0),
            g["cup_y"],
        )
        bx = jnp.where(sunk, 20.0, bx)
        by = jnp.where(sunk, 180.0, by)
        bvx = jnp.where(sunk, 0.0, bvx)
        bvy = jnp.where(sunk, 0.0, bvy)
        g2 = {
            "bx": bx, "by": by, "bvx": bvx, "bvy": bvy, "aim": aim,
            "cup_x": cup_x, "cup_y": cup_y,
            "block_x": block_x, "block_v": block_v,
            "hole": g["hole"] + sunk.astype(jnp.int32),
            "strokes": g["strokes"] + putt.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 55.0, jnp.float32)
        cup = ((rows - g["cup_y"]) ** 2 + (cols - g["cup_x"]) ** 2) < 22.0
        frame = jnp.where(cup, 10.0, frame)
        block = (jnp.abs(rows - 110.0) < 12) & (
            jnp.abs(cols - g["block_x"]) < 12
        )
        frame = jnp.where(block, 140.0, frame)
        # Aim tick around the ball.
        rad = g["aim"] * (np.pi / 180.0)
        tx = g["bx"] + 10.0 * jnp.cos(rad)
        ty = g["by"] - 10.0 * jnp.sin(rad)
        tick = (jnp.abs(rows - ty) < 2) & (jnp.abs(cols - tx) < 2)
        frame = jnp.where(tick, 200.0, frame)
        ball = ((rows - g["by"]) ** 2 + (cols - g["bx"]) ** 2) < 9.0
        return jnp.where(ball, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.45, gray, gray * 0.45])


class MiniatureGolfEnv(ArcadeEnv):
    GAME_CLS = MiniatureGolfGame


# ---------------------------------------------------------------------------
# JourneyEscape: reach the escape vehicle through the crowd — touching
# groupies/promoters costs cash (score), helpers shield you.
# ---------------------------------------------------------------------------

_JE_N = 6


class JourneyEscapeGame(ArcadeGame):
    action_set_size = 16  # ALE journey_escape minimal set size
    has_fire = True
    minimal_set = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 12, 13, 16, 17, 10)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "px": jnp.float32(RAW_W / 2), "py": jnp.float32(185.0),
            "ox": jax.random.uniform(k1, (_JE_N,), jnp.float32,
                                     10.0, RAW_W - 10.0),
            "oy": jax.random.uniform(k2, (_JE_N,), jnp.float32,
                                     20.0, 160.0),
            "ovx": jax.random.uniform(k3, (_JE_N,), jnp.float32,
                                      -1.5, 1.5),
            "kind": jnp.asarray([0, 0, 0, 0, 1, 1], jnp.int32),  # 1=helper
            "cash": jnp.int32(50000),
            "shield": jnp.int32(0),
            "escaped": jnp.bool_(False),
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return g["escaped"] | (g["cash"] <= 0)

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        px = jnp.clip(
            g["px"] + 2.5 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            6.0, RAW_W - 6.0,
        )
        py = jnp.clip(
            g["py"] + 2.5 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            15.0, 195.0,
        )
        ox = g["ox"] + g["ovx"]
        ovx = jnp.where((ox < 8.0) | (ox > RAW_W - 8.0), -g["ovx"],
                        g["ovx"])
        ox = jnp.clip(ox, 8.0, RAW_W - 8.0)
        oy = g["oy"] + 0.8
        k1, k2 = jax.random.split(key)
        recycled = oy > 200.0
        oy = jnp.where(recycled, 15.0, oy)
        ox = jnp.where(
            recycled, jax.random.uniform(k1, (_JE_N,), jnp.float32,
                                         10.0, RAW_W - 10.0), ox
        )
        touch = (jnp.abs(ox - px) < 7.0) & (jnp.abs(oy - py) < 8.0)
        helper_touch = jnp.any(touch & (g["kind"] == 1))
        shield = jnp.where(
            helper_touch, 180, jnp.maximum(g["shield"] - 1, 0)
        )
        bad_touch = jnp.any(touch & (g["kind"] == 0)) & (shield == 0)
        cash = g["cash"] - jnp.where(bad_touch, 300, 0)
        reward = -jnp.where(bad_touch, 300.0, 0.0)
        # The escape vehicle waits at the top strip.
        escaped = py < 18.0
        reward = reward + jnp.where(
            escaped & ~g["escaped"], g["cash"].astype(jnp.float32) / 100.0,
            0.0,
        )
        g2 = {
            "px": px, "py": py, "ox": ox, "oy": oy, "ovx": ovx,
            "kind": g["kind"], "cash": cash, "shield": shield,
            "escaped": escaped,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 18.0, jnp.float32)
        van = (rows < 14) & (jnp.abs(cols - RAW_W / 2.0) < 20)
        frame = jnp.where(van, 120.0, frame)
        for i in range(_JE_N):
            o = (
                (jnp.abs(rows - g["oy"][i]) < 6)
                & (jnp.abs(cols - g["ox"][i]) < 5)
            )
            v = jnp.where(g["kind"][i] == 1, 220.0, 150.0)
            frame = jnp.where(o, v, frame)
        v = jnp.where(g["shield"] > 0, 255.0, 240.0)
        pl = (jnp.abs(rows - g["py"]) < 6) & (jnp.abs(cols - g["px"]) < 4)
        frame = jnp.where(pl, v, frame)
        cashbar = (rows > 202) & (
            cols < g["cash"].astype(jnp.float32) * (RAW_W / 50000.0)
        )
        return jnp.where(cashbar, 190.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.7, gray * 0.5, gray])


class JourneyEscapeEnv(ArcadeEnv):
    GAME_CLS = JourneyEscapeGame


# ---------------------------------------------------------------------------
# LostLuggage: two-skycap luggage catch — bags tumble from the
# carousel; move the active skycap under them.
# ---------------------------------------------------------------------------

_LL_N = 3


class LostLuggageGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "px": jnp.float32(RAW_W / 2),
            "bx": jax.random.uniform(k1, (_LL_N,), jnp.float32,
                                     15.0, RAW_W - 15.0),
            "by": jax.random.uniform(k2, (_LL_N,), jnp.float32,
                                     -60.0, 20.0),
            "bvx": jax.random.uniform(k3, (_LL_N,), jnp.float32,
                                      -0.8, 0.8),
            "missed": jnp.int32(0),
            "caught": jnp.int32(0),
        }

    def lives(self, g):
        return 3 - g["missed"]

    def over(self, g):
        return g["missed"] >= 3

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        speed = jnp.where(fire, 4.2, 2.6)  # FIRE = sprint
        px = jnp.clip(
            g["px"] + speed * (right.astype(jnp.float32)
                               - left.astype(jnp.float32)),
            10.0, RAW_W - 10.0,
        )
        bx = g["bx"] + g["bvx"]
        bvx = jnp.where((bx < 8.0) | (bx > RAW_W - 8.0), -g["bvx"],
                        g["bvx"])
        bx = jnp.clip(bx, 8.0, RAW_W - 8.0)
        by = g["by"] + 1.9
        at_floor = by > 182.0
        caught = at_floor & (jnp.abs(bx - px) < 11.0)
        missed = at_floor & ~caught
        reward = jnp.sum(jnp.where(caught, 10.0, 0.0))
        ks = jax.random.split(key, 3)
        resp = at_floor
        bx = jnp.where(
            resp, jax.random.uniform(ks[0], (_LL_N,), jnp.float32,
                                     15.0, RAW_W - 15.0), bx
        )
        by = jnp.where(
            resp, jax.random.uniform(ks[1], (_LL_N,), jnp.float32,
                                     -60.0, 0.0), by
        )
        bvx = jnp.where(
            resp, jax.random.uniform(ks[2], (_LL_N,), jnp.float32,
                                     -1.2, 1.2), bvx
        )
        g2 = {
            "px": px, "bx": bx, "by": by, "bvx": bvx,
            "missed": g["missed"] + jnp.sum(missed.astype(jnp.int32)),
            "caught": g["caught"] + jnp.sum(caught.astype(jnp.int32)),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 22.0, jnp.float32)
        carousel = (rows < 16)
        frame = jnp.where(carousel, 90.0, frame)
        for i in range(_LL_N):
            b = (
                (g["by"][i] > -10.0)
                & (jnp.abs(rows - g["by"][i]) < 5)
                & (jnp.abs(cols - g["bx"][i]) < 5)
            )
            frame = jnp.where(b, 200.0, frame)
        cap = (rows > 178) & (rows < 192) & (jnp.abs(cols - g["px"]) < 10)
        return jnp.where(cap, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.9, gray * 0.7, gray])


class LostLuggageEnv(ArcadeEnv):
    GAME_CLS = LostLuggageGame


# ---------------------------------------------------------------------------
# Pacman: the 2600 original — coarse dot maze with a center tunnel and
# ONE pursuing ghost alternating chase/scatter (vs MsPacman's four).
# ---------------------------------------------------------------------------

_PM_H, _PM_W = 11, 12

# 1 = wall; the 2600 original's blocky symmetric maze (center tunnel
# row wraps).
_PM_MAZE = np.asarray([
    [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    [1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1],
    [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    [1, 0, 1, 0, 1, 1, 1, 1, 0, 1, 0, 1],
    [0, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0],  # tunnel row
    [1, 0, 1, 0, 1, 1, 1, 1, 0, 1, 0, 1],
    [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    [1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1],
    [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
], np.int32)


class PacmanGame(ArcadeGame):
    action_set_size = 5
    has_fire = False
    minimal_set = (0, 2, 3, 4, 5)

    def init(self, key):
        maze = jnp.asarray(_PM_MAZE)
        dots = (maze == 0)
        dots = dots.at[9, 6].set(False)  # spawn cell
        return {
            "pr": jnp.int32(9), "pc": jnp.int32(6),
            "gr": jnp.int32(1), "gc": jnp.int32(1),
            "dots": dots,
            "power": jnp.int32(0),
            "phase": jnp.int32(0),
            "lives": jnp.int32(3),
            "eaten": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return (g["lives"] <= 0) | (~jnp.any(g["dots"]))

    def tick(self, g, action, key):
        over0 = self.over(g)
        maze = jnp.asarray(_PM_MAZE)
        up = action == 1
        right = action == 2
        left = action == 3
        down = action == 4
        pr_t = g["pr"] + down.astype(jnp.int32) - up.astype(jnp.int32)
        pc_t = g["pc"] + right.astype(jnp.int32) - left.astype(jnp.int32)
        pc_t = pc_t % _PM_W  # tunnel wrap
        pr_t = jnp.clip(pr_t, 0, _PM_H - 1)
        blocked = maze[pr_t, pc_t] == 1
        pr = jnp.where(blocked, g["pr"], pr_t)
        pc = jnp.where(blocked, g["pc"], pc_t)
        ate = g["dots"][pr, pc]
        dots = g["dots"].at[pr, pc].set(False)
        # Power pellets live in the four open corners.
        corner = (
            ((pr == 1) | (pr == _PM_H - 2))
            & ((pc == 1) | (pc == _PM_W - 2))
        )
        power = jnp.where(ate & corner, 120,
                          jnp.maximum(g["power"] - 1, 0))
        reward = jnp.where(ate, jnp.where(corner, 50.0, 10.0), 0.0)
        # Ghost: chase in chase-phase, head home-corner in scatter;
        # flees while powered.  Greedy step through open cells.
        phase = (g["phase"] + 1) % 300
        scatter = phase > 220
        tr = jnp.where(scatter, 1, pr)
        tc = jnp.where(scatter, 1, pc)
        sign = jnp.where(power > 0, -1, 1)
        move_r = jnp.clip(g["gr"] + sign * jnp.sign(tr - g["gr"]),
                          0, _PM_H - 1)
        move_c = (g["gc"] + sign * jnp.sign(tc - g["gc"])) % _PM_W
        can_r = maze[move_r, g["gc"]] == 0
        can_c = maze[g["gr"], move_c] == 0
        gr = jnp.where(can_r, move_r, g["gr"])
        gc = jnp.where(~can_r & can_c, move_c, g["gc"])
        meet = (gr == pr) & (gc == pc)
        ate_ghost = meet & (power > 0)
        caught = meet & (power == 0)
        reward = reward + jnp.where(ate_ghost, 200.0, 0.0)
        gr = jnp.where(ate_ghost, 1, gr)
        gc = jnp.where(ate_ghost, 1, gc)
        lives = g["lives"] - caught.astype(jnp.int32)
        pr = jnp.where(caught, 9, pr)
        pc = jnp.where(caught, 6, pc)
        g2 = {
            "pr": pr, "pc": pc, "gr": gr, "gc": gc, "dots": dots,
            "power": power, "phase": phase, "lives": lives,
            "eaten": g["eaten"] + ate.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        ch, cw = 17, 13
        rr = jnp.clip((rows - 12) // ch, 0, _PM_H - 1).astype(jnp.int32)
        cc = jnp.clip((cols - 2) // cw, 0, _PM_W - 1).astype(jnp.int32)
        maze = jnp.asarray(_PM_MAZE)
        in_m = (rows >= 12) & (rows < 199) & (cols >= 2) & (cols < 158)
        frame = jnp.where(in_m & (maze[rr, cc] == 1), 95.0, 15.0)
        mid_r = jnp.abs((rows - 12) % ch - ch // 2) < 2
        mid_c = jnp.abs((cols - 2) % cw - cw // 2) < 2
        dot = in_m & g["dots"][rr, cc] & mid_r & mid_c
        frame = jnp.where(dot, 180.0, frame)
        gm = in_m & (rr == g["gr"]) & (cc == g["gc"]) & (
            jnp.abs((rows - 12) % ch - ch // 2) < 6
        ) & (jnp.abs((cols - 2) % cw - cw // 2) < 5)
        gv = jnp.where(g["power"] > 0, 120.0, 210.0)
        frame = jnp.where(gm, gv, frame)
        pm = in_m & (rr == g["pr"]) & (cc == g["pc"]) & (
            jnp.abs((rows - 12) % ch - ch // 2) < 6
        ) & (jnp.abs((cols - 2) % cw - cw // 2) < 5)
        return jnp.where(pm, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray, gray * 0.3])


class PacmanEnv(ArcadeEnv):
    GAME_CLS = PacmanGame


# ---------------------------------------------------------------------------
# ElevatorAction: descend the tower by elevator, clear the red-door
# floors of agents, reach the basement getaway car.
# ---------------------------------------------------------------------------

_EA_FLOORS = 6


class ElevatorActionGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "floor": jnp.int32(_EA_FLOORS - 1),
            "px": jnp.float32(RAW_W / 2),
            "in_lift": jnp.bool_(True),
            "ax": jax.random.uniform(k1, (_EA_FLOORS,), jnp.float32,
                                     15.0, RAW_W - 15.0),
            "alive": jnp.ones((_EA_FLOORS,), bool),
            "red_done": jnp.zeros((_EA_FLOORS,), bool),
            "red": jax.random.bernoulli(k2, 0.5, (_EA_FLOORS,)),
            "lives": jnp.int32(3),
            "done": jnp.bool_(False),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return (g["lives"] <= 0) | g["done"]

    @staticmethod
    def _floor_y(f):
        return 35.0 + 28.0 * (
            (_EA_FLOORS - 1) - f.astype(jnp.float32)
        )

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        lift_x = RAW_W / 2.0
        at_lift = jnp.abs(g["px"] - lift_x) < 8.0
        # Ride the lift up/down; walk the floor otherwise.
        floor = jnp.clip(
            g["floor"] - (down & at_lift).astype(jnp.int32)
            + (up & at_lift).astype(jnp.int32),
            0, _EA_FLOORS - 1,
        )
        px = jnp.clip(
            g["px"] + 2.4 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            8.0, RAW_W - 8.0,
        )
        # Agents pace their floor and shoot when aligned; your shot
        # clears the agent on YOUR floor in your facing half.
        ax = g["ax"] + jnp.sin(
            g["ax"] * 0.05 + jnp.arange(_EA_FLOORS)
        ) * 1.5
        ax = jnp.clip(ax, 10.0, RAW_W - 10.0)
        myf = jnp.arange(_EA_FLOORS) == floor
        shot_hit = (
            myf & g["alive"] & fire
            & (jnp.abs(ax - px) < 60.0)
        )
        alive = g["alive"] & ~shot_hit
        reward = jnp.sum(jnp.where(shot_hit, 100.0, 0.0))
        # Agent fire: same floor, close, and it is alive.
        shot_me = jnp.any(
            myf & alive & (jnp.abs(ax - px) < 24.0)
            & jax.random.bernoulli(key, 0.05, (_EA_FLOORS,))
        )
        lives = g["lives"] - shot_me.astype(jnp.int32)
        # Red door at the floor's left end: enter for the documents.
        at_red = (
            g["red"][floor] & ~g["red_done"][floor] & (px < 16.0)
        )
        red_done = g["red_done"] | (myf & at_red)
        reward = reward + jnp.where(at_red, 500.0, 0.0)
        # Basement exit once every red door is cleared.
        all_docs = jnp.all(red_done | ~g["red"])
        done = (floor == 0) & all_docs & (px > RAW_W - 16.0)
        reward = reward + jnp.where(done & ~g["done"], 1000.0, 0.0)
        g2 = {
            "floor": floor, "px": px, "in_lift": at_lift,
            "ax": ax, "alive": alive,
            "red_done": red_done, "red": g["red"],
            "lives": lives, "done": done,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 14.0, jnp.float32)
        for f in range(_EA_FLOORS):
            y = 35.0 + 28.0 * ((_EA_FLOORS - 1) - f)
            fl = jnp.abs(rows - y - 9.0) < 2
            frame = jnp.where(fl, 80.0, frame)
            door_v = jnp.where(
                jnp.asarray(True) & g["red"][f],
                jnp.where(g["red_done"][f], 60.0, 190.0), 110.0,
            )
            door = (jnp.abs(rows - y) < 7) & (cols < 12)
            frame = jnp.where(door, door_v, frame)
            agent = (
                g["alive"][f]
                & (jnp.abs(rows - y) < 6)
                & (jnp.abs(cols - g["ax"][f]) < 4)
            )
            frame = jnp.where(agent, 170.0, frame)
        shaft = jnp.abs(cols - RAW_W / 2.0) < 9
        frame = jnp.where(shaft & (rows > 25) & (rows < 195), 35.0, frame)
        py = self._floor_y(g["floor"])
        pl = (jnp.abs(rows - py) < 6) & (jnp.abs(cols - g["px"]) < 4)
        return jnp.where(pl, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.8, gray * 0.8, gray])


class ElevatorActionEnv(ArcadeEnv):
    GAME_CLS = ElevatorActionGame
