"""Arcade wave 5: BattleZone, DoubleDunk, NameThisGame, Phoenix.

Completes the "Atari-5" evaluation subset (BattleZone, DoubleDunk,
NameThisGame, Phoenix, Qbert — Qbert landed in wave 3).  Behavioral
reference: the corresponding ALE games registered by
``envpool/atari/registration.py:21-35``; faithful-behavior cores under
``XxxLite-v5`` ids as in waves 1-4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame
from .wave3_games import _freeze_when, _grids


# ---------------------------------------------------------------------------
# BattleZone: first-person tank on a plane; rotate, advance, shell tanks.
# ---------------------------------------------------------------------------

_BZ_N = 3


class BattleZoneGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        ang = jax.random.uniform(k1, (_BZ_N,), jnp.float32, 0, 2 * np.pi)
        rad = jax.random.uniform(k2, (_BZ_N,), jnp.float32, 20.0, 60.0)
        return {
            "px": jnp.float32(0.0), "py": jnp.float32(0.0),
            "ang": jnp.float32(0.0),
            "ex": rad * jnp.cos(ang), "ey": rad * jnp.sin(ang),
            "e_alive": jnp.ones((_BZ_N,), bool),
            "e_cool": jnp.full((_BZ_N,), 40.0),
            "fire_cool": jnp.int32(0),
            "lives": jnp.int32(5),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 10)
        up = (action == 2) | (action == 6) | (action == 7)
        down = (action == 5) | (action == 8) | (action == 9)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        ang = g["ang"] + 0.06 * (
            right.astype(jnp.float32) - left.astype(jnp.float32)
        )
        fwd = 0.8 * (up.astype(jnp.float32) - down.astype(jnp.float32))
        px = g["px"] + fwd * jnp.cos(ang)
        py = g["py"] + fwd * jnp.sin(ang)
        # Shell: hitscan along the view axis (small angular window).
        rx = g["ex"] - px
        ry = g["ey"] - py
        dist = jnp.sqrt(rx**2 + ry**2) + 1e-6
        angoff = jnp.abs(
            jnp.mod(jnp.arctan2(ry, rx) - ang + np.pi, 2 * np.pi) - np.pi
        )
        can_f = fire & (g["fire_cool"] == 0)
        in_sight = g["e_alive"] & (angoff < 0.06) & (dist < 80.0)
        tgt = jnp.argmin(jnp.where(in_sight, dist, 1e9))
        hit = can_f & jnp.any(in_sight)
        e_alive = g["e_alive"] & ~((jnp.arange(_BZ_N) == tgt) & hit)
        reward = jnp.where(hit, 1000.0, 0.0)
        # Enemy tanks close in and shell back on a cooldown when facing.
        ux, uy = -rx / dist, -ry / dist
        ex = g["ex"] + jnp.where(e_alive & (dist > 12.0), ux * 0.35, 0.0)
        ey = g["ey"] + jnp.where(e_alive & (dist > 12.0), uy * 0.35, 0.0)
        e_cool = jnp.maximum(g["e_cool"] - 1.0, 0.0)
        shooting = e_alive & (dist < 35.0) & (e_cool <= 0)
        hit_by = jnp.any(shooting)
        e_cool = jnp.where(shooting, 50.0, e_cool)
        # Respawn destroyed tanks on the horizon ring.
        k1, k2 = jax.random.split(key)
        dead = ~e_alive
        na = jax.random.uniform(k1, (_BZ_N,), jnp.float32, 0, 2 * np.pi)
        ex = jnp.where(dead, px + 70.0 * jnp.cos(na), ex)
        ey = jnp.where(dead, py + 70.0 * jnp.sin(na), ey)
        g2 = {
            "px": px, "py": py, "ang": ang,
            "ex": ex, "ey": ey,
            "e_alive": e_alive | dead,
            "e_cool": jnp.where(dead, 40.0, e_cool),
            "fire_cool": jnp.where(
                can_f, 12, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "lives": g["lives"] - hit_by.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        horizon = 95.0
        frame = jnp.where(rows < horizon, 40.0, 70.0)  # sky / ground
        # mountain silhouette scrolling with heading
        ridge = horizon - 12.0 - 8.0 * jnp.sin(
            (cols / RAW_W * 4.0 + g["ang"]) * 3.0
        )
        frame = jnp.where(
            (rows > ridge) & (rows < horizon), 55.0, frame
        )
        # enemy tanks as ground billboards
        ca, sa = jnp.cos(g["ang"]), jnp.sin(g["ang"])
        for i in range(_BZ_N):
            rx = g["ex"][i] - g["px"]
            ry = g["ey"][i] - g["py"]
            depth = rx * ca + ry * sa
            lat = -rx * sa + ry * ca
            vis = g["e_alive"][i] & (depth > 2.0)
            d = jnp.maximum(depth, 2.0)
            sx = RAW_W / 2 + lat / d * 120.0
            size = jnp.clip(240.0 / d, 2.0, 26.0)
            ty = horizon + 240.0 / d * 0.35
            tank = (
                vis
                & (jnp.abs(cols - sx) < size)
                & (rows > ty - size * 0.5) & (rows < ty + size * 0.3)
            )
            frame = jnp.where(tank, 150.0, frame)
        # crosshair + cannon
        cross = (
            (jnp.abs(cols - RAW_W / 2) < 6) & (jnp.abs(rows - 100.0) < 1.5)
        ) | (
            (jnp.abs(rows - 100.0) < 6) & (jnp.abs(cols - RAW_W / 2) < 1.5)
        )
        frame = jnp.where(cross, 230.0, frame)
        gun = (rows > 180) & (jnp.abs(cols - RAW_W / 2) < 10)
        return jnp.where(gun, 110.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.6, gray, gray * 0.6])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[29].set((g["score"] % 256).astype(jnp.uint8))
        ram = ram.at[58].set(g["lives"].astype(jnp.uint8))
        return ram


class BattleZoneEnv(ArcadeEnv):
    GAME_CLS = BattleZoneGame


# ---------------------------------------------------------------------------
# DoubleDunk: 2-on-2 half-court; drive to the hoop and shoot; steals.
# ---------------------------------------------------------------------------


class DoubleDunkGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "px": jnp.float32(80.0), "py": jnp.float32(150.0),
            "mate": jnp.asarray([50.0, 120.0]),
            "d1": jnp.asarray([80.0, 90.0]),
            "d2": jnp.asarray([100.0, 120.0]),
            "has_ball": jnp.int32(0),   # 0 player, 1 mate, 2 defense
            "shot_t": jnp.float32(0.0),  # ball-in-flight timer
            "shot_from": jnp.zeros(2),
            "my_pts": jnp.int32(0), "their_pts": jnp.int32(0),
            "score": jnp.int32(0),
        }

    def over(self, g):
        return (g["my_pts"] >= 24) | (g["their_pts"] >= 24)

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 10)
        up = (action == 2) | (action == 6) | (action == 7)
        down = (action == 5) | (action == 8) | (action == 9)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        px = jnp.clip(
            g["px"] + 2.4 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            12.0, RAW_W - 12.0,
        )
        py = jnp.clip(
            g["py"] + 2.0 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            50.0, 190.0,
        )
        hoop = jnp.asarray([RAW_W / 2, 48.0])
        inflight = g["shot_t"] > 0
        # Shoot when holding the ball: success probability by distance.
        d_hoop = jnp.sqrt((px - hoop[0]) ** 2 + (py - hoop[1]) ** 2)
        shooting = fire & (g["has_ball"] == 0) & ~inflight
        shot_t = jnp.where(shooting, 14.0,
                           jnp.maximum(g["shot_t"] - 1.0, 0.0))
        shot_from = jnp.where(shooting, jnp.stack([px, py]),
                              g["shot_from"])
        lands = inflight & (shot_t == 0)
        sd = jnp.sqrt(
            (g["shot_from"][0] - hoop[0]) ** 2
            + (g["shot_from"][1] - hoop[1]) ** 2
        )
        k1, k2, k3 = jax.random.split(key, 3)
        made = lands & (
            jax.random.uniform(k1, ()) < jnp.clip(1.15 - sd / 90.0, 0.1,
                                                  0.95)
        )
        three = sd > 62.0  # beyond the arc
        pts = jnp.where(made, jnp.where(three, 3, 2), 0)
        reward = pts.astype(jnp.float32)
        # Defenders chase the ball handler; close contact steals.
        target = jnp.stack([px, py])
        d1 = g["d1"] + jnp.clip(target - g["d1"], -1.6, 1.6)
        d2 = g["d2"] + jnp.clip(target - g["d2"], -1.3, 1.3)
        near_d = jnp.minimum(
            jnp.linalg.norm(d1 - target), jnp.linalg.norm(d2 - target)
        )
        stolen = (
            (g["has_ball"] == 0) & ~inflight & ~shooting
            & (near_d < 7.0) & (jax.random.uniform(k2, ()) < 0.06)
        )
        # Defense possession scores against us after a delay (modeled as
        # an immediate coin flip on steal resolution).
        they_score = stolen & (jax.random.uniform(k3, ()) < 0.5)
        reward = reward - 2.0 * they_score.astype(jnp.float32)
        has_ball = jnp.where(
            shooting | inflight, 3,
            jnp.where(stolen, 2, g["has_ball"]),
        )
        # After any basket or miss-landing or defensive score: ball back
        # to the player at half court.
        regain = lands | they_score | (stolen & ~they_score)
        has_ball = jnp.where(regain, 0, has_ball)
        px = jnp.where(regain, 80.0, px)
        py = jnp.where(regain, 150.0, py)
        g2 = {
            "px": px, "py": py, "mate": g["mate"],
            "d1": d1, "d2": d2,
            "has_ball": has_ball.astype(jnp.int32),
            "shot_t": shot_t, "shot_from": shot_from,
            "my_pts": g["my_pts"] + pts,
            "their_pts": g["their_pts"] + 2 * they_score.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        court = (rows > 40) & (cols > 8) & (cols < RAW_W - 8)
        frame = jnp.where(court, 105.0, 40.0)
        # key + arc
        arc = jnp.abs(
            jnp.sqrt((cols - RAW_W / 2) ** 2 + (rows - 48.0) ** 2) - 62.0
        ) < 1.5
        frame = jnp.where(arc & court, 140.0, frame)
        hoop = ((cols - RAW_W / 2) ** 2 + (rows - 48.0) ** 2) < 16.0
        frame = jnp.where(hoop, 220.0, frame)
        for p, lum in ((g["d1"], 80.0), (g["d2"], 80.0),
                       (g["mate"], 180.0)):
            m = (jnp.abs(rows - p[1]) < 7) & (jnp.abs(cols - p[0]) < 4)
            frame = jnp.where(m, lum, frame)
        pl = (jnp.abs(rows - g["py"]) < 7) & (jnp.abs(cols - g["px"]) < 4)
        frame = jnp.where(pl, 250.0, frame)
        # ball in flight: interpolate toward the hoop
        t = jnp.clip(1.0 - g["shot_t"] / 14.0, 0.0, 1.0)
        bx = g["shot_from"][0] + (RAW_W / 2 - g["shot_from"][0]) * t
        by = g["shot_from"][1] + (48.0 - g["shot_from"][1]) * t
        ball = (
            (g["shot_t"] > 0)
            & (((cols - bx) ** 2 + (rows - by) ** 2) < 6.0)
        )
        return jnp.where(ball, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.7, gray * 0.45])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[118].set(g["my_pts"].astype(jnp.uint8))
        ram = ram.at[119].set(g["their_pts"].astype(jnp.uint8))
        return ram


class DoubleDunkEnv(ArcadeEnv):
    GAME_CLS = DoubleDunkGame


# ---------------------------------------------------------------------------
# NameThisGame: diver under a boat; shoot the octopus tentacles and the
# shark; surface hose refills oxygen.
# ---------------------------------------------------------------------------

_NTG_T = 6  # tentacles


class NameThisGameGame(ArcadeGame):
    action_set_size = 6  # NOOP FIRE RIGHT LEFT RIGHTFIRE LEFTFIRE
    has_fire = True

    def init(self, key):
        return {
            "px": jnp.float32(RAW_W / 2),
            "t_len": jnp.zeros((_NTG_T,)),          # tentacle extension
            "shark_x": jnp.float32(0.0),
            "shark_dir": jnp.float32(1.0),
            "oxy": jnp.float32(100.0),
            "hose_x": jnp.float32(RAW_W / 2),
            "fire_cool": jnp.int32(0),
            "wave": jnp.int32(1),
            "lives": jnp.int32(3),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action == 4) | (action == 5)
        right = (action == 2) | (action == 4)
        left = (action == 3) | (action == 5)
        px = jnp.clip(
            g["px"] + 2.5 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            10.0, RAW_W - 10.0,
        )
        speed = 0.25 + 0.06 * g["wave"].astype(jnp.float32)
        k1, k2, k3 = jax.random.split(key, 3)
        grow = jax.random.uniform(k1, (_NTG_T,)) < 0.5
        t_len = jnp.clip(
            g["t_len"] + jnp.where(grow, speed, 0.0), 0.0, 110.0
        )
        t_x = 20.0 + jnp.arange(_NTG_T, dtype=jnp.float32) * 24.0
        # Shooting: the nearest descending tentacle in the column, or the
        # shark when level with it.
        can_f = fire & (g["fire_cool"] == 0)
        in_col = (jnp.abs(t_x - px) < 9.0) & (t_len > 0)
        tgt = jnp.argmax(in_col)
        hit_t = can_f & jnp.any(in_col)
        t_len = jnp.where(
            (jnp.arange(_NTG_T) == tgt) & hit_t,
            jnp.maximum(t_len - 25.0, 0.0), t_len,
        )
        shark_x = g["shark_x"] + g["shark_dir"] * (1.2 + 0.2 * g[
            "wave"
        ].astype(jnp.float32))
        shark_dir = jnp.where(
            (shark_x < 0) | (shark_x > RAW_W), -g["shark_dir"],
            g["shark_dir"],
        )
        hit_s = can_f & (jnp.abs(shark_x - px) < 10.0) & ~hit_t
        reward = (
            jnp.where(hit_t, 80.0, 0.0) + jnp.where(hit_s, 160.0, 0.0)
        )
        shark_x = jnp.where(hit_s, -10.0, shark_x)
        # Oxygen drains; refill under the hose.
        under_hose = jnp.abs(px - g["hose_x"]) < 8.0
        oxy = jnp.where(
            under_hose, jnp.minimum(g["oxy"] + 2.0, 100.0),
            g["oxy"] - 0.25,
        )
        # Death: tentacle reaches the diver row in the diver's column, or
        # the shark rams, or oxygen out.
        reach = jnp.any((t_len > 100.0) & (jnp.abs(t_x - px) < 9.0))
        rammed = (jnp.abs(shark_x - px) < 6.0) & (
            jax.random.uniform(k2, ()) < 0.5
        )
        die = reach | rammed | (oxy <= 0.0)
        # Wave clear: every tentacle fully retracted.
        clear = ~jnp.any(t_len > 0)
        reward = reward + jnp.where(clear, 500.0, 0.0)
        t_len = jnp.where(
            clear, jnp.zeros_like(t_len) + 10.0, t_len
        )
        hose_x = jnp.where(
            clear,
            jax.random.uniform(k3, (), minval=25.0, maxval=RAW_W - 25.0),
            g["hose_x"],
        )
        g2 = {
            "px": jnp.where(die, RAW_W / 2, px),
            "t_len": jnp.where(die, jnp.zeros_like(t_len), t_len),
            "shark_x": shark_x, "shark_dir": shark_dir,
            "oxy": jnp.where(die, 100.0, oxy),
            "hose_x": hose_x,
            "fire_cool": jnp.where(
                can_f, 5, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "wave": g["wave"] + clear.astype(jnp.int32),
            "lives": g["lives"] - die.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.where(rows < 30.0, 130.0, 60.0)  # boat deck / water
        hose = (rows < 55.0) & (jnp.abs(cols - g["hose_x"]) < 2.0)
        frame = jnp.where(hose, 200.0, frame)
        t_x = 20.0 + jnp.arange(_NTG_T, dtype=jnp.float32) * 24.0
        for i in range(_NTG_T):
            tn = (
                (rows > 55.0) & (rows < 55.0 + g["t_len"][i])
                & (jnp.abs(cols - t_x[i]) < 3.0)
            )
            frame = jnp.where(tn, 150.0, frame)
        sh = (jnp.abs(rows - 100.0) < 5) & (
            jnp.abs(cols - g["shark_x"]) < 10
        )
        frame = jnp.where(sh, 110.0, frame)
        pl = (jnp.abs(rows - 170.0) < 6) & (jnp.abs(cols - g["px"]) < 4)
        frame = jnp.where(pl, 250.0, frame)
        bar = (rows > RAW_H - 7) & (cols < g["oxy"] * (RAW_W / 100.0))
        return jnp.where(bar, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.5, gray * 0.8, gray])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[69].set((g["score"] % 256).astype(jnp.uint8))
        ram = ram.at[68].set(g["lives"].astype(jnp.uint8))
        return ram


class NameThisGameEnv(ArcadeEnv):
    GAME_CLS = NameThisGameGame


# ---------------------------------------------------------------------------
# Phoenix: bird waves swoop; mothership rounds; player ship with shield.
# ---------------------------------------------------------------------------

_PH_N = 8


class PhoenixGame(ArcadeGame):
    action_set_size = 8  # NOOP FIRE RIGHT LEFT DOWN(shield) RF LF DF
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "px": jnp.float32(RAW_W / 2),
            "bx": jax.random.uniform(
                k1, (_PH_N,), jnp.float32, 15.0, RAW_W - 15.0
            ),
            "by": 30.0 + 12.0 * jnp.arange(_PH_N, dtype=jnp.float32) % 60,
            "b_alive": jnp.ones((_PH_N,), bool),
            "swoop": jnp.full((_PH_N,), -1.0),   # >=0: swoop phase
            "shield": jnp.float32(0.0),
            "shield_cool": jnp.float32(0.0),
            "fire_cool": jnp.int32(0),
            "round": jnp.int32(1),
            "lives": jnp.int32(4),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action == 5) | (action == 6)
        right = (action == 2) | (action == 5)
        left = (action == 3) | (action == 6)
        shield_b = (action == 4) | (action == 7)
        px = jnp.clip(
            g["px"] + 2.4 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            10.0, RAW_W - 10.0,
        )
        # Shield: brief invulnerability with a recharge cooldown.
        sc = jnp.maximum(g["shield_cool"] - 1.0, 0.0)
        raise_s = shield_b & (sc <= 0)
        shield = jnp.where(raise_s, 12.0,
                           jnp.maximum(g["shield"] - 1.0, 0.0))
        sc = jnp.where(raise_s, 60.0, sc)
        # Birds drift; some swoop down toward the player.
        k1, k2, k3 = jax.random.split(key, 3)
        start = (
            (g["swoop"] < 0)
            & (jax.random.uniform(k1, (_PH_N,)) < 0.01)
            & g["b_alive"]
        )
        swoop = jnp.where(start, 0.0, g["swoop"])
        active = swoop >= 0
        swoop = jnp.where(active, swoop + 1.0, swoop)
        bx = g["bx"] + jnp.where(
            active, jnp.clip(px - g["bx"], -1.8, 1.8),
            jnp.sin(swoop * 0.0 + g["by"] * 0.2) * 0.8,
        )
        by = g["by"] + jnp.where(active, 2.4, 0.0)
        ended = by > 200.0
        by = jnp.where(ended, 30.0 + (by % 60.0), by)
        swoop = jnp.where(ended, -1.0, swoop)
        # Shot: nearest bird in the column.
        can_f = fire & (g["fire_cool"] == 0)
        in_col = g["b_alive"] & (jnp.abs(bx - px) < 7.0)
        tgt = jnp.argmax(in_col * (200.0 - by))
        hit = can_f & jnp.any(in_col)
        b_alive = g["b_alive"] & ~((jnp.arange(_PH_N) == tgt) & hit)
        swooping_hit = active[tgt] & hit
        reward = jnp.where(
            hit, jnp.where(swooping_hit, 100.0, 20.0), 0.0
        )
        # Collision with a swooping bird (shield blocks).
        rammed = jnp.any(
            b_alive & active & (jnp.abs(bx - px) < 8.0)
            & (jnp.abs(by - 185.0) < 8.0)
        ) & (shield <= 0)
        # Round clear → new flock, bonus.
        clear = ~jnp.any(b_alive)
        reward = reward + jnp.where(clear, 200.0, 0.0)
        b_alive = b_alive | clear
        bx = jnp.where(
            clear,
            jax.random.uniform(k2, (_PH_N,), jnp.float32, 15.0,
                               RAW_W - 15.0),
            bx,
        )
        by = jnp.where(
            clear, 30.0 + 12.0 * jnp.arange(_PH_N, dtype=jnp.float32) % 60,
            by,
        )
        g2 = {
            "px": px, "bx": bx, "by": by, "b_alive": b_alive,
            "swoop": jnp.where(clear, -jnp.ones(_PH_N), swoop),
            "shield": shield, "shield_cool": sc,
            "fire_cool": jnp.where(
                can_f, 5, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "round": g["round"] + clear.astype(jnp.int32),
            "lives": g["lives"] - rammed.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 15.0, jnp.float32)
        for i in range(_PH_N):
            bird = (
                g["b_alive"][i]
                & (jnp.abs(rows - g["by"][i]) < 4)
                & (jnp.abs(cols - g["bx"][i]) < 6)
            )
            frame = jnp.where(
                bird, jnp.where(g["swoop"][i] >= 0, 220.0, 170.0), frame
            )
        pl = (jnp.abs(rows - 185.0) < 6) & (jnp.abs(cols - g["px"]) < 5)
        frame = jnp.where(pl, 250.0, frame)
        sh = (
            (g["shield"] > 0)
            & (((cols - g["px"]) ** 2 + (rows - 185.0) ** 2) < 140.0)
            & (((cols - g["px"]) ** 2 + (rows - 185.0) ** 2) > 90.0)
        )
        return jnp.where(sh, 120.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.6, gray * 0.9])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[72].set((g["score"] % 256).astype(jnp.uint8))
        ram = ram.at[74].set(g["lives"].astype(jnp.uint8))
        return ram


class PhoenixEnv(ArcadeEnv):
    GAME_CLS = PhoenixGame
