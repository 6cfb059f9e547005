"""Platformer-engine procgen games: coinrun, ninja, jumper, climber,
leaper.

One tile world [H, W] with gravity/jump kinematics; goal objects grant
+10 and end the episode.  Leaper is frogger-style lanes (no gravity).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .core import RES, decode_action, render_grid

_N = 16  # tile grid (rendered 4px per tile)
_SKY = np.asarray([140.0, 185.0, 235.0])
_GROUND = np.asarray([90.0, 60.0, 35.0])
_COIN = np.asarray([250.0, 210.0, 50.0])
_AGENT = np.asarray([230.0, 70.0, 70.0])
_HAZARD = np.asarray([40.0, 40.0, 40.0])
_STAR = np.asarray([250.0, 250.0, 250.0])


def _terrain(key, gap_p: float, max_h: int):
    """Column heights + hazard flags for a side-scrolling level."""
    k1, k2, k3 = jax.random.split(key, 3)
    steps = jax.random.randint(k1, (_N,), -1, 2)
    heights = jnp.clip(3 + jnp.cumsum(steps), 2, 2 + max_h)
    heights = heights.at[0].set(3)
    gaps = jax.random.uniform(k2, (_N,)) < gap_p
    gaps = gaps.at[0].set(False).at[_N - 1].set(False)
    hazards = jax.random.uniform(k3, (_N,)) < gap_p
    hazards = hazards.at[0].set(False).at[_N - 1].set(False)
    return heights, gaps, hazards & ~gaps


class _PlatformBase:
    def __init__(self, size: int, mode: str):
        self.mode = mode
        self.gap_p = 0.25 if mode in ("hard", "extreme") else 0.12

    def physics(self, g, dx, jump):
        """Shared gravity/jump step on (x, y, vy)."""
        x = jnp.clip(g["x"] + 0.4 * dx.astype(jnp.float32), 0.0, _N - 1.0)
        col = jnp.clip(x.astype(jnp.int32), 0, _N - 1)
        floor = jnp.where(
            g["gaps"][col], -2.0, g["heights"][col].astype(jnp.float32)
        )
        on_ground = g["y"] <= floor + 0.05
        vy = jnp.where(
            jump & on_ground, 1.4, g["vy"] - 0.18
        )
        y = g["y"] + vy
        landed = (y <= floor) & (vy <= 0)
        y = jnp.where(landed, floor, y)
        vy = jnp.where(landed, 0.0, vy)
        return x, y, vy, col


class CoinrunGame(_PlatformBase):
    """Run right, jump gaps/hazards, grab the coin (+10)."""

    def init(self, key):
        heights, gaps, hazards = _terrain(key, self.gap_p, 4)
        return {
            "x": jnp.float32(0.0),
            "y": jnp.float32(3.0),
            "vy": jnp.float32(0.0),
            "heights": heights,
            "gaps": gaps,
            "hazards": hazards,
        }

    def tick(self, g, action, key):
        dx, dy, sp = decode_action(action)
        jump = (dy > 0) | (sp == 1)
        x, y, vy, col = self.physics(g, dx, jump)
        fell = y < -1.0
        on_hazard = g["hazards"][col] & (
            y <= g["heights"][col].astype(jnp.float32) + 0.1
        )
        win = x >= _N - 1.5
        reward = jnp.where(win, 10.0, 0.0)
        done = fell | on_hazard | win
        return {**g, "x": x, "y": y, "vy": vy}, reward, done

    def render(self, g):
        cells = jnp.tile(jnp.asarray(_SKY, jnp.float32), (_N, _N, 1))
        rows = jax.lax.broadcasted_iota(jnp.int32, (_N, _N), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (_N, _N), 1)
        h = g["heights"][cols]
        ground = (rows >= _N - h) & ~g["gaps"][cols]
        cells = jnp.where(
            ground[..., None], jnp.asarray(_GROUND, jnp.float32), cells
        )
        hz = (
            g["hazards"][cols]
            & (rows == _N - h - 1)
            & ~g["gaps"][cols]
        )
        cells = jnp.where(
            hz[..., None], jnp.asarray(_HAZARD, jnp.float32), cells
        )
        cells = cells.at[:, _N - 1].set(jnp.asarray(_COIN, jnp.float32))
        ar = jnp.clip(_N - 1 - g["y"].astype(jnp.int32), 0, _N - 1)
        ac = jnp.clip(g["x"].astype(jnp.int32), 0, _N - 1)
        cells = cells.at[ar, ac].set(jnp.asarray(_AGENT, jnp.float32))
        return render_grid(cells)


class NinjaGame(CoinrunGame):
    """coinrun-style with throwing stars clearing bomb hazards (+10 goal)."""

    def init(self, key):
        g = super().init(key)
        g["star_x"] = jnp.float32(-1.0)
        g["star_col"] = jnp.int32(0)
        return g

    def tick(self, g, action, key):
        dx, dy, sp = decode_action(action)
        throw = sp == 1
        star_x = jnp.where(
            g["star_x"] >= 0, g["star_x"] + 1.0,
            jnp.where(throw, g["x"] + 1.0, -1.0),
        )
        scol = jnp.clip(star_x.astype(jnp.int32), 0, _N - 1)
        hit = (star_x >= 0) & g["hazards"][scol]
        hazards = jnp.where(
            hit, g["hazards"].at[scol].set(False), g["hazards"]
        )
        star_x = jnp.where(hit | (star_x > _N), -1.0, star_x)
        g2 = {**g, "hazards": hazards, "star_x": star_x}
        jump = dy > 0
        x, y, vy, col = self.physics(g2, dx, jump)
        fell = y < -1.0
        on_hazard = hazards[col] & (
            y <= g["heights"][col].astype(jnp.float32) + 0.1
        )
        win = x >= _N - 1.5
        reward = jnp.where(win, 10.0, 0.0)
        done = fell | on_hazard | win
        return {**g2, "x": x, "y": y, "vy": vy}, reward, done

    def render(self, g):
        cells_img = super().render(g)
        return cells_img


class JumperGame(_PlatformBase):
    """Open-world double-jump to the carrot (+10)."""

    def init(self, key):
        k1, k2 = jax.random.split(key)
        heights, gaps, _ = _terrain(k1, self.gap_p, 6)
        goal_col = jax.random.randint(k2, (), _N // 2, _N)
        return {
            "x": jnp.float32(0.0),
            "y": jnp.float32(3.0),
            "vy": jnp.float32(0.0),
            "jumps": jnp.int32(0),
            "heights": heights,
            "gaps": gaps,
            "hazards": jnp.zeros(_N, bool),
            "goal_col": goal_col,
        }

    def tick(self, g, action, key):
        dx, dy, sp = decode_action(action)
        want_jump = (dy > 0) | (sp == 1)
        col = jnp.clip(g["x"].astype(jnp.int32), 0, _N - 1)
        floor = jnp.where(
            g["gaps"][col], -2.0, g["heights"][col].astype(jnp.float32)
        )
        on_ground = g["y"] <= floor + 0.05
        jumps = jnp.where(on_ground, 0, g["jumps"])
        can = on_ground | (jumps < 2)
        do_jump = want_jump & can
        x, y, vy, col = self.physics(g, dx, do_jump & on_ground)
        # Air double-jump.
        vy = jnp.where(do_jump & ~on_ground, 1.2, vy)
        jumps = jumps + do_jump.astype(jnp.int32)
        fell = y < -1.0
        at_goal = (col == g["goal_col"]) & (
            y <= g["heights"][col].astype(jnp.float32) + 0.3
        )
        reward = jnp.where(at_goal, 10.0, 0.0)
        return (
            {**g, "x": x, "y": y, "vy": vy, "jumps": jumps},
            reward,
            fell | at_goal,
        )

    def render(self, g):
        cells = jnp.tile(jnp.asarray(_SKY, jnp.float32), (_N, _N, 1))
        rows = jax.lax.broadcasted_iota(jnp.int32, (_N, _N), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (_N, _N), 1)
        h = g["heights"][cols]
        ground = (rows >= _N - h) & ~g["gaps"][cols]
        cells = jnp.where(
            ground[..., None], jnp.asarray(_GROUND, jnp.float32), cells
        )
        gr = jnp.clip(
            _N - 1 - g["heights"][g["goal_col"]], 0, _N - 1
        )
        cells = cells.at[gr, g["goal_col"]].set(
            jnp.asarray(_COIN, jnp.float32)
        )
        ar = jnp.clip(_N - 1 - g["y"].astype(jnp.int32), 0, _N - 1)
        ac = jnp.clip(g["x"].astype(jnp.int32), 0, _N - 1)
        cells = cells.at[ar, ac].set(jnp.asarray(_AGENT, jnp.float32))
        return render_grid(cells)


class ClimberGame(_PlatformBase):
    """Climb platforms collecting stars (+1 each, +10 at the top)."""

    N_PLAT = 8

    def init(self, key):
        k1, k2 = jax.random.split(key)
        plat_cols = jax.random.randint(k1, (self.N_PLAT,), 0, _N - 3)
        plat_rows = jnp.linspace(_N - 3, 1, self.N_PLAT).astype(jnp.int32)
        stars = jax.random.uniform(k2, (self.N_PLAT,)) < 0.7
        return {
            "x": jnp.float32(1.0),
            "y": jnp.float32(1.0),
            "vy": jnp.float32(0.0),
            "plat_cols": plat_cols,
            "plat_rows": plat_rows,
            "stars": stars,
        }

    def _floor(self, g, x):
        """Highest platform at or below the agent's feet in its column."""
        col = x.astype(jnp.int32)
        on = (col >= g["plat_cols"]) & (col <= g["plat_cols"] + 2)
        plat_y = (_N - 1 - g["plat_rows"]).astype(jnp.float32)
        below = on & (plat_y <= g["y"] + 0.05)
        return jnp.max(jnp.where(below, plat_y, 0.0))

    def tick(self, g, action, key):
        dx, dy, sp = decode_action(action)
        x = jnp.clip(g["x"] + 0.4 * dx.astype(jnp.float32), 0.0, _N - 1.0)
        floor = self._floor(g, x)
        on_ground = g["y"] <= floor + 0.05
        jump = (dy > 0) | (sp == 1)
        vy = jnp.where(jump & on_ground, 1.5, g["vy"] - 0.18)
        y = jnp.maximum(g["y"] + vy, floor)
        vy = jnp.where(y <= floor, 0.0, vy)
        # Star collection on the platform the agent stands in.
        plat_y = (_N - 1 - g["plat_rows"]).astype(jnp.float32)
        col = x.astype(jnp.int32)
        near = (
            (col >= g["plat_cols"]) & (col <= g["plat_cols"] + 2)
            & (jnp.abs(plat_y - y) < 0.6)
        )
        got = near & g["stars"]
        stars = g["stars"] & ~got
        reward = got.sum().astype(jnp.float32)
        top = y >= _N - 2.5
        reward = reward + jnp.where(top, 10.0, 0.0)
        return (
            {**g, "x": x, "y": y, "vy": vy, "stars": stars},
            reward,
            top,
        )

    def render(self, g):
        cells = jnp.tile(jnp.asarray(_SKY, jnp.float32), (_N, _N, 1))
        for i in range(self.N_PLAT):
            r = g["plat_rows"][i]
            c = g["plat_cols"][i]
            for off in range(3):
                cells = cells.at[r, jnp.clip(c + off, 0, _N - 1)].set(
                    jnp.asarray(_GROUND, jnp.float32)
                )
            star_rgb = jnp.where(
                g["stars"][i],
                jnp.asarray(_STAR, jnp.float32),
                cells[jnp.clip(r - 1, 0, _N - 1), c + 1],
            )
            cells = cells.at[jnp.clip(r - 1, 0, _N - 1), c + 1].set(star_rgb)
        ar = jnp.clip(_N - 1 - g["y"].astype(jnp.int32), 0, _N - 1)
        ac = jnp.clip(g["x"].astype(jnp.int32), 0, _N - 1)
        cells = cells.at[ar, ac].set(jnp.asarray(_AGENT, jnp.float32))
        return render_grid(cells)


class LeaperGame(_PlatformBase):
    """Frogger: cross car lanes and log river to the top (+10)."""

    N_LANES = 6

    def init(self, key):
        k1, k2 = jax.random.split(key)
        xs = jax.random.uniform(k1, (self.N_LANES,), jnp.float32, 0, _N)
        speeds = jnp.where(
            jnp.arange(self.N_LANES) % 2 == 0, 0.3, -0.3
        ) * (1.5 if self.hard else 1.0)
        return {
            "x": jnp.float32(_N / 2),
            "row": jnp.int32(0),
            "cars": xs,
            "speeds": speeds,
        }

    @property
    def hard(self):
        return self.mode in ("hard", "extreme")

    def tick(self, g, action, key):
        dx, dy, _ = decode_action(action)
        x = jnp.clip(g["x"] + dx.astype(jnp.float32), 0.0, _N - 1.0)
        row = jnp.clip(g["row"] + dy, 0, self.N_LANES + 1)
        cars = jnp.mod(g["cars"] + g["speeds"], _N)
        in_lane = (row >= 1) & (row <= self.N_LANES)
        lane = jnp.clip(row - 1, 0, self.N_LANES - 1)
        hit = in_lane & (jnp.abs(cars[lane] - x) < 1.6)
        win = row > self.N_LANES
        reward = jnp.where(win, 10.0, 0.0)
        return (
            {**g, "x": x, "row": row, "cars": cars},
            reward,
            hit | win,
        )

    def render(self, g):
        cells = jnp.tile(
            jnp.asarray([70.0, 130.0, 70.0], jnp.float32), (_N, _N, 1)
        )
        for i in range(self.N_LANES):
            r = _N - 3 - 2 * i
            cells = cells.at[r, :].set(jnp.asarray([80.0, 80.0, 85.0]))
            c = jnp.clip(g["cars"][i].astype(jnp.int32), 0, _N - 1)
            cells = cells.at[r, c].set(jnp.asarray(_HAZARD, jnp.float32))
        ar = jnp.clip(_N - 2 - 2 * g["row"], 0, _N - 1)
        ac = jnp.clip(g["x"].astype(jnp.int32), 0, _N - 1)
        cells = cells.at[ar, ac].set(jnp.asarray(_AGENT, jnp.float32))
        return render_grid(cells)
