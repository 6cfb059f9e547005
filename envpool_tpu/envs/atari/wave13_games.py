"""Arcade wave 13: AirRaid, Galaxian, Atlantis2, SpaceWar, LaserGates,
Trondead — shooter half of the non-57 ALE roster.

Behavioral reference: the corresponding ALE ROMs registered by
``envpool/atari/registration.py:21-35``; Lite-core caveats as wave 12.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame
from .wave3_games import _freeze_when, _grids
from .wave12_games import _joy


# ---------------------------------------------------------------------------
# AirRaid: two buildings below, bombers above; shoot the bombers
# before their bombs level your city.
# ---------------------------------------------------------------------------

_AR_N = 4


class AirRaidGame(ArcadeGame):
    action_set_size = 6
    has_fire = True
    minimal_set = (0, 1, 3, 4, 11, 12)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "px": jnp.float32(RAW_W / 2),
            "ex": jax.random.uniform(k1, (_AR_N,), jnp.float32,
                                     15.0, RAW_W - 15.0),
            "ey": jax.random.uniform(k2, (_AR_N,), jnp.float32, 30.0, 70.0),
            "evx": jnp.asarray([1.2, -1.0, 1.5, -1.3], jnp.float32),
            "bomb_x": jnp.full((_AR_N,), -1.0),
            "bomb_y": jnp.full((_AR_N,), -1.0),
            "shot_x": jnp.float32(0.0), "shot_y": jnp.float32(-1.0),
            "hp": jnp.asarray([3, 3], jnp.int32),  # two buildings
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return jnp.maximum(g["hp"][0], 0) + jnp.maximum(g["hp"][1], 0)

    def over(self, g):
        return jnp.all(g["hp"] <= 0)

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        px = jnp.clip(
            g["px"] + 2.6 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            10.0, RAW_W - 10.0,
        )
        ex = g["ex"] + g["evx"]
        evx = jnp.where((ex < 12.0) | (ex > RAW_W - 12.0), -g["evx"],
                        g["evx"])
        ex = jnp.clip(ex, 12.0, RAW_W - 12.0)
        # Bombers drop bombs over the buildings.
        k1, k2 = jax.random.split(key)
        bldg_x = jnp.asarray([RAW_W * 0.3, RAW_W * 0.7])
        over_b = (
            (jnp.abs(ex[:, None] - bldg_x[None, :]) < 10.0).any(-1)
        )
        can_drop = (g["bomb_y"] < 0.0) & over_b & jax.random.bernoulli(
            k1, 0.04, (_AR_N,)
        )
        bomb_x = jnp.where(can_drop, ex, g["bomb_x"])
        bomb_y = jnp.where(can_drop, g["ey"] + 6.0, g["bomb_y"])
        bomb_y = jnp.where(bomb_y >= 0.0, bomb_y + 2.8, bomb_y)
        # Bomb lands: damage the nearer building.
        landed = bomb_y > 182.0
        near0 = jnp.abs(bomb_x - bldg_x[0]) < 14.0
        near1 = jnp.abs(bomb_x - bldg_x[1]) < 14.0
        dmg0 = jnp.sum((landed & near0).astype(jnp.int32))
        dmg1 = jnp.sum((landed & near1).astype(jnp.int32))
        hp = g["hp"] - jnp.stack([dmg0, dmg1])
        bomb_y = jnp.where(landed, -1.0, bomb_y)
        # Player shot.
        can_f = fire & (g["shot_y"] < 0.0)
        shot_x = jnp.where(can_f, px, g["shot_x"])
        shot_y = jnp.where(can_f, 180.0, g["shot_y"] - 5.0)
        shot_y = jnp.where(shot_y < 20.0, -1.0, shot_y)
        hit = (
            (shot_y >= 0.0)
            & (jnp.abs(ex - shot_x) < 7.0)
            & (jnp.abs(g["ey"] - shot_y) < 6.0)
        )
        any_hit = jnp.any(hit)
        first = jnp.argmax(hit)
        reward = jnp.where(any_hit, 25.0, 0.0)
        shot_y = jnp.where(any_hit, -1.0, shot_y)
        # Shot bombers respawn higher and faster.
        resp = (jnp.arange(_AR_N) == first) & any_hit
        ex = jnp.where(
            resp,
            jax.random.uniform(k2, (_AR_N,), jnp.float32, 15.0,
                               RAW_W - 15.0),
            ex,
        )
        g2 = {
            "px": px, "ex": ex, "ey": g["ey"], "evx": evx,
            "bomb_x": bomb_x, "bomb_y": bomb_y,
            "shot_x": shot_x, "shot_y": shot_y,
            "hp": hp, "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 30.0, jnp.float32)
        for b, bx in enumerate((RAW_W * 0.3, RAW_W * 0.7)):
            h = 12.0 * jnp.maximum(g["hp"][b], 0).astype(jnp.float32)
            bld = (rows > 195.0 - h) & (jnp.abs(cols - bx) < 12)
            frame = jnp.where(bld, 100.0, frame)
        for i in range(_AR_N):
            e = (
                (jnp.abs(rows - g["ey"][i]) < 4)
                & (jnp.abs(cols - g["ex"][i]) < 6)
            )
            frame = jnp.where(e, 180.0, frame)
            bm = (
                (g["bomb_y"][i] >= 0.0)
                & (jnp.abs(rows - g["bomb_y"][i]) < 3)
                & (jnp.abs(cols - g["bomb_x"][i]) < 2)
            )
            frame = jnp.where(bm, 220.0, frame)
        sh = (
            (g["shot_y"] >= 0.0)
            & (jnp.abs(rows - g["shot_y"]) < 3)
            & (jnp.abs(cols - g["shot_x"]) < 1.5)
        )
        frame = jnp.where(sh, 255.0, frame)
        pl = (rows > 185) & (rows < 196) & (jnp.abs(cols - g["px"]) < 6)
        return jnp.where(pl, 240.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.6, gray * 0.8, gray])


class AirRaidEnv(ArcadeEnv):
    GAME_CLS = AirRaidGame


# ---------------------------------------------------------------------------
# Galaxian: a convoy marches overhead; individual raiders peel off and
# dive at you — divers score triple.
# ---------------------------------------------------------------------------

_GX_N = 12


class GalaxianGame(ArcadeGame):
    action_set_size = 6
    has_fire = True
    minimal_set = (0, 1, 3, 4, 11, 12)

    def init(self, key):
        xs = jnp.tile(jnp.linspace(25.0, RAW_W - 25.0, 6), 2)
        ys = jnp.repeat(jnp.asarray([40.0, 58.0]), 6)
        return {
            "px": jnp.float32(RAW_W / 2),
            "ex": xs, "ey": ys,
            "home_x": xs,
            "diving": jnp.zeros((_GX_N,), bool),
            "alive": jnp.ones((_GX_N,), bool),
            "dir": jnp.float32(1.0),
            "shot_x": jnp.float32(0.0), "shot_y": jnp.float32(-1.0),
            "lives": jnp.int32(3),
            "wave": jnp.int32(1),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        px = jnp.clip(
            g["px"] + 2.5 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            10.0, RAW_W - 10.0,
        )
        # Convoy sways; home slots track it.
        turn = (jnp.max(g["home_x"]) > RAW_W - 15.0) | (
            jnp.min(g["home_x"]) < 15.0
        )
        dirn = jnp.where(turn, -g["dir"], g["dir"])
        home_x = g["home_x"] + 0.7 * dirn
        # Start a dive occasionally.
        k1, k2 = jax.random.split(key)
        start = (
            g["alive"] & ~g["diving"]
            & jax.random.bernoulli(k1, 0.01, (_GX_N,))
        )
        diving = g["diving"] | start
        # Divers home toward the player and accelerate downward.
        ex = jnp.where(
            diving, g["ex"] + jnp.sign(px - g["ex"]) * 1.3, home_x
        )
        ey = jnp.where(diving, g["ey"] + 2.2, g["ey"])
        # Diver exits the bottom: back to formation.
        back = diving & (ey > 200.0)
        diving = diving & ~back
        ey = jnp.where(back, jnp.where(jnp.arange(_GX_N) < 6, 40.0, 58.0),
                       ey)
        ex = jnp.where(back, home_x, ex)
        # Shot.
        can_f = fire & (g["shot_y"] < 0.0)
        shot_x = jnp.where(can_f, px, g["shot_x"])
        shot_y = jnp.where(can_f, 178.0, g["shot_y"] - 5.5)
        shot_y = jnp.where(shot_y < 20.0, -1.0, shot_y)
        hit = (
            g["alive"] & (shot_y >= 0.0)
            & (jnp.abs(ex - shot_x) < 6.0)
            & (jnp.abs(ey - shot_y) < 5.0)
        )
        any_hit = jnp.any(hit)
        first = jnp.argmax(hit)
        was_diving = g["diving"][first]
        reward = jnp.where(
            any_hit, jnp.where(was_diving, 60.0, 20.0), 0.0
        )
        alive = g["alive"] & ~((jnp.arange(_GX_N) == first) & any_hit)
        shot_y = jnp.where(any_hit, -1.0, shot_y)
        # Diver reaching the ship row.
        rammed = jnp.any(
            alive & diving & (ey > 178.0) & (jnp.abs(ex - px) < 8.0)
        )
        lives = g["lives"] - rammed.astype(jnp.int32)
        # Wave cleared.
        clear = ~jnp.any(alive)
        alive = alive | clear
        reward = reward + jnp.where(clear, 100.0, 0.0)
        g2 = {
            "px": px, "ex": ex, "ey": ey, "home_x": home_x,
            "diving": diving & ~clear, "alive": alive, "dir": dirn,
            "shot_x": shot_x, "shot_y": shot_y,
            "lives": lives, "wave": g["wave"] + clear.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 10.0, jnp.float32)
        for i in range(_GX_N):
            e = (
                g["alive"][i]
                & (jnp.abs(rows - g["ey"][i]) < 4)
                & (jnp.abs(cols - g["ex"][i]) < 5)
            )
            v = jnp.where(g["diving"][i], 210.0, 150.0)
            frame = jnp.where(e, v, frame)
        sh = (
            (g["shot_y"] >= 0.0)
            & (jnp.abs(rows - g["shot_y"]) < 3)
            & (jnp.abs(cols - g["shot_x"]) < 1.5)
        )
        frame = jnp.where(sh, 255.0, frame)
        pl = (rows > 180) & (rows < 190) & (jnp.abs(cols - g["px"]) < 6)
        return jnp.where(pl, 240.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.7, gray * 0.7, gray])


class GalaxianEnv(ArcadeEnv):
    GAME_CLS = GalaxianGame


# ---------------------------------------------------------------------------
# Atlantis2: the Atlantis sequel ROM — same defend-the-city contract
# with faster Gorgon waves and meaner scoring (ALE ships it as a
# separate ROM; here a distinct core tuned to its harder curve).
# ---------------------------------------------------------------------------

_A2_N = 5


class Atlantis2Game(ArcadeGame):
    action_set_size = 4  # NOOP FIRE(center) RIGHTFIRE LEFTFIRE
    has_fire = True
    minimal_set = (0, 1, 11, 12)

    def init(self, key):
        k1 = key
        return {
            "ex": jax.random.uniform(k1, (_A2_N,), jnp.float32,
                                     0.0, RAW_W),
            "ey": jnp.linspace(40.0, 120.0, _A2_N),
            "evx": jnp.asarray([2.8, -3.2, 3.6, -4.0, 4.4], jnp.float32),
            "domes": jnp.ones((3,), bool),
            "beam": jnp.int32(0),    # frames the last shot stays visible
            "beam_side": jnp.int32(0),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return jnp.sum(g["domes"].astype(jnp.int32))

    def over(self, g):
        return ~jnp.any(g["domes"])

    def tick(self, g, action, key):
        over0 = self.over(g)
        # Three gun arcs: 1 = center (vertical), 2 = right diagonal,
        # 3 = left diagonal.
        fire_c = action == 1
        fire_r = action == 2
        fire_l = action == 3
        ex = g["ex"] + g["evx"]
        wrap = (ex < -10.0) | (ex > RAW_W + 10.0)
        # A ship that crosses the low row bombards a dome on exit.
        low = g["ey"] > 100.0
        boom = wrap & low
        dome_idx = jnp.argmax(g["domes"])
        lose_dome = jnp.any(boom)
        domes = g["domes"] & ~(
            (jnp.arange(3) == dome_idx) & lose_dome
        )
        ex = jnp.where(wrap, jnp.where(g["evx"] > 0, -8.0, RAW_W + 8.0), ex)
        # Beams: center hits ships near mid-x, diagonals near the edges.
        shot = fire_c | fire_r | fire_l
        aim_x = jnp.where(fire_c, RAW_W / 2.0,
                          jnp.where(fire_r, RAW_W * 0.85, RAW_W * 0.15))
        hit = shot & (jnp.abs(ex - aim_x) < 14.0)
        any_hit = jnp.any(hit)
        first = jnp.argmax(hit)
        # Deeper (faster, lower) ships are worth more.
        reward = jnp.where(
            any_hit, 10.0 + 10.0 * first.astype(jnp.float32), 0.0
        )
        k1 = key
        resp = (jnp.arange(_A2_N) == first) & any_hit
        ex = jnp.where(
            resp, jax.random.uniform(k1, (_A2_N,), jnp.float32, 0.0, RAW_W),
            ex,
        )
        g2 = {
            "ex": ex, "ey": g["ey"], "evx": g["evx"], "domes": domes,
            "beam": jnp.where(shot, 3, jnp.maximum(g["beam"] - 1, 0)),
            "beam_side": jnp.where(
                fire_r, 1, jnp.where(fire_l, 2, 0)
            ).astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 14.0, jnp.float32)
        for i in range(3):
            d = (
                g["domes"][i]
                & (rows > 170)
                & (jnp.abs(cols - (30.0 + 50.0 * i)) < 14)
            )
            frame = jnp.where(d, 130.0, frame)
        for i in range(_A2_N):
            e = (
                (jnp.abs(rows - g["ey"][i]) < 3)
                & (jnp.abs(cols - g["ex"][i]) < 7)
            )
            frame = jnp.where(e, 200.0, frame)
        aim = jnp.where(
            g["beam_side"] == 1, RAW_W * 0.85,
            jnp.where(g["beam_side"] == 2, RAW_W * 0.15, RAW_W / 2.0),
        )
        beam = (g["beam"] > 0) & (jnp.abs(cols - aim) < 2) & (rows < 170)
        return jnp.where(beam, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.5, gray, gray * 0.9])


class Atlantis2Env(ArcadeEnv):
    GAME_CLS = Atlantis2Game


# ---------------------------------------------------------------------------
# SpaceWar: Newtonian duel around a gravity star; thrust + rotate,
# torpedo the drone, don't fall into the star.
# ---------------------------------------------------------------------------


class SpaceWarGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "px": jnp.float32(30.0), "py": jnp.float32(105.0),
            "pvx": jnp.float32(0.0), "pvy": jnp.float32(-1.2),
            "pa": jnp.float32(0.0),  # heading (radians)
            "qx": jnp.float32(RAW_W - 30.0), "qy": jnp.float32(105.0),
            "qvx": jnp.float32(0.0), "qvy": jnp.float32(1.2),
            "tx": jnp.float32(-1.0), "ty": jnp.float32(0.0),
            "tvx": jnp.float32(0.0), "tvy": jnp.float32(0.0),
            "p_score": jnp.int32(0), "q_score": jnp.int32(0),
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return (g["p_score"] >= 10) | (g["q_score"] >= 10)

    @staticmethod
    def _gravity(x, y):
        cx, cy = RAW_W / 2.0, 105.0
        dx, dy = cx - x, cy - y
        r2 = jnp.maximum(dx * dx + dy * dy, 60.0)
        a = 55.0 / r2
        r = jnp.sqrt(r2)
        return a * dx / r, a * dy / r, r

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        pa = g["pa"] + 0.15 * (right.astype(jnp.float32)
                               - left.astype(jnp.float32))
        thrust = up.astype(jnp.float32) * 0.12
        gx, gy, pr = self._gravity(g["px"], g["py"])
        pvx = g["pvx"] + thrust * jnp.cos(pa) + gx
        pvy = g["pvy"] + thrust * jnp.sin(pa) + gy
        px = (g["px"] + pvx) % RAW_W
        py = 30.0 + (g["py"] + pvy - 30.0) % 160.0
        # Drone orbits and lobs at the player when roughly aligned.
        qgx, qgy, qr = self._gravity(g["qx"], g["qy"])
        qvx = g["qvx"] + qgx
        qvy = g["qvy"] + qgy
        qx = (g["qx"] + qvx) % RAW_W
        qy = 30.0 + (g["qy"] + qvy - 30.0) % 160.0
        # Torpedo: one at a time.
        t_live = g["tx"] >= 0.0
        can_f = fire & ~t_live
        tvx = jnp.where(can_f, pvx + 3.0 * jnp.cos(pa), g["tvx"])
        tvy = jnp.where(can_f, pvy + 3.0 * jnp.sin(pa), g["tvy"])
        tx = jnp.where(can_f, px, jnp.where(t_live, g["tx"] + g["tvx"],
                                            -1.0))
        ty = jnp.where(can_f, py, g["ty"] + g["tvy"])
        off = (tx < 0.0) | (tx > RAW_W) | (ty < 28.0) | (ty > 192.0)
        tx = jnp.where(off & ~can_f, -1.0, tx)
        hit_q = (tx >= 0.0) & (jnp.abs(tx - qx) < 6.0) & (
            jnp.abs(ty - qy) < 6.0
        )
        # Star collisions.
        p_burn = pr < 10.0
        q_burn = qr < 10.0
        p_score = g["p_score"] + hit_q.astype(jnp.int32) + q_burn.astype(
            jnp.int32
        )
        q_score = g["q_score"] + p_burn.astype(jnp.int32)
        reward = hit_q.astype(jnp.float32) + q_burn.astype(
            jnp.float32
        ) - p_burn.astype(jnp.float32)
        # Respawn whoever died (or was hit) at a rim point.
        px = jnp.where(p_burn, 30.0, px)
        py = jnp.where(p_burn, 105.0, py)
        pvx = jnp.where(p_burn, 0.0, pvx)
        pvy = jnp.where(p_burn, -1.2, pvy)
        qx = jnp.where(hit_q | q_burn, RAW_W - 30.0, qx)
        qy = jnp.where(hit_q | q_burn, 105.0, qy)
        qvx = jnp.where(hit_q | q_burn, 0.0, qvx)
        qvy = jnp.where(hit_q | q_burn, 1.2, qvy)
        tx = jnp.where(hit_q, -1.0, tx)
        g2 = {
            "px": px, "py": py, "pvx": pvx, "pvy": pvy, "pa": pa,
            "qx": qx, "qy": qy, "qvx": qvx, "qvy": qvy,
            "tx": tx, "ty": ty, "tvx": tvx, "tvy": tvy,
            "p_score": p_score, "q_score": q_score,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 8.0, jnp.float32)
        star = ((rows - 105.0) ** 2 + (cols - RAW_W / 2.0) ** 2) < 36.0
        frame = jnp.where(star, 230.0, frame)
        q = (jnp.abs(rows - g["qy"]) < 4) & (jnp.abs(cols - g["qx"]) < 4)
        frame = jnp.where(q, 160.0, frame)
        t = (
            (g["tx"] >= 0.0)
            & (jnp.abs(rows - g["ty"]) < 2)
            & (jnp.abs(cols - g["tx"]) < 2)
        )
        frame = jnp.where(t, 255.0, frame)
        p = (jnp.abs(rows - g["py"]) < 4) & (jnp.abs(cols - g["px"]) < 4)
        return jnp.where(p, 240.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray, gray * 0.6])


class SpaceWarEnv(ArcadeEnv):
    GAME_CLS = SpaceWarGame


# ---------------------------------------------------------------------------
# LaserGates: fly the Dante Dagger down an endless corridor; slip
# through the pulsing gates before your shield/energy runs out.
# ---------------------------------------------------------------------------


class LaserGatesGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "py": jnp.float32(105.0),
            "gate_x": jnp.float32(RAW_W + 10.0),
            "gap_y": jnp.float32(100.0),
            "gap_h": jnp.float32(34.0),
            "phase": jnp.int32(0),
            "shield": jnp.float32(100.0),
            "dist": jnp.float32(0.0),
            "passed": jnp.int32(0),
        }

    def lives(self, g):
        return (g["shield"] > 0.0).astype(jnp.int32)

    def over(self, g):
        return g["shield"] <= 0.0

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        speed = 2.2 + 1.2 * right.astype(jnp.float32) - 1.0 * (
            left.astype(jnp.float32)
        )
        py = jnp.clip(
            g["py"] + 2.4 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            40.0, 180.0,
        )
        gate_x = g["gate_x"] - speed
        phase = (g["phase"] + 1) % 50
        gate_open = phase < 30  # laser curtain pulses
        at_gate = (gate_x < 45.0) & (gate_x > 35.0)
        in_gap = jnp.abs(py - g["gap_y"]) < g["gap_h"] / 2.0
        # Shooting the gate emitter (FIRE while close) burns it out.
        burned = fire & (gate_x < 70.0) & (gate_x > 45.0)
        crash = at_gate & ~in_gap & ~burned & ~gate_open
        shield = g["shield"] - 0.05 - 18.0 * crash.astype(jnp.float32)
        passed_now = gate_x < 34.0
        reward = jnp.where(passed_now, 75.0, 0.0) + jnp.where(
            burned & (gate_x < 70.0) & (gate_x > 45.0), 0.3, 0.0
        )
        k1, k2 = jax.random.split(key)
        gate_x = jnp.where(passed_now, RAW_W + 20.0, gate_x)
        gap_y = jnp.where(
            passed_now,
            jax.random.uniform(k1, (), jnp.float32, 60.0, 165.0),
            g["gap_y"],
        )
        gap_h = jnp.where(
            passed_now,
            jax.random.uniform(k2, (), jnp.float32, 24.0, 40.0),
            g["gap_h"],
        )
        g2 = {
            "py": py, "gate_x": gate_x, "gap_y": gap_y, "gap_h": gap_h,
            "phase": phase, "shield": shield,
            "dist": g["dist"] + speed,
            "passed": g["passed"] + passed_now.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 16.0, jnp.float32)
        cave = (rows < 36) | (rows > 186)
        frame = jnp.where(cave, 90.0, frame)
        open_now = (g["phase"] % 50) < 30
        gate = (
            (jnp.abs(cols - g["gate_x"]) < 3)
            & (jnp.abs(rows - g["gap_y"]) >= g["gap_h"] / 2.0)
            & (rows >= 36) & (rows <= 186)
        )
        v = jnp.where(open_now, 120.0, 230.0)
        frame = jnp.where(gate, v, frame)
        ship = (jnp.abs(rows - g["py"]) < 4) & (
            (cols > 34) & (cols < 46)
        )
        frame = jnp.where(ship, 255.0, frame)
        bar = (rows < 8) & (cols < g["shield"] * (RAW_W / 100.0))
        return jnp.where(bar, 200.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.4, gray * 0.4])


class LaserGatesEnv(ArcadeEnv):
    GAME_CLS = LaserGatesGame


# ---------------------------------------------------------------------------
# Trondead: hold the I/O tower — recognizers approach down four grid
# lanes; zap them before they close in.
# ---------------------------------------------------------------------------

_TD_LANES = 4


class TrondeadGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "lane": jnp.int32(1),
            "rx": jnp.full((_TD_LANES,), float(RAW_W + 20.0)),
            "speed": jnp.asarray([1.0, 1.3, 1.1, 1.5], jnp.float32),
            "zap": jnp.int32(0),
            "hp": jnp.int32(4),
            "kills": jnp.int32(0),
        }

    def lives(self, g):
        return g["hp"]

    def over(self, g):
        return g["hp"] <= 0

    @staticmethod
    def _lane_y(lane):
        return 55.0 + 38.0 * lane.astype(jnp.float32)

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        lane = jnp.clip(
            g["lane"] + down.astype(jnp.int32) - up.astype(jnp.int32),
            0, _TD_LANES - 1,
        )
        rx = g["rx"] - g["speed"]
        # Zap clears the recognizer in YOUR lane if inside range.
        inrange = rx[lane] < 120.0
        zap = fire & inrange
        hit_lane = (jnp.arange(_TD_LANES) == lane) & zap & (rx < 120.0)
        reward = jnp.where(jnp.any(hit_lane), 50.0, 0.0)
        k1 = key
        rx = jnp.where(
            hit_lane,
            RAW_W + jax.random.uniform(k1, (_TD_LANES,), jnp.float32,
                                       10.0, 120.0),
            rx,
        )
        # A recognizer reaching the tower costs armor.
        arrived = rx < 22.0
        hp = g["hp"] - jnp.sum(arrived.astype(jnp.int32))
        rx = jnp.where(arrived, RAW_W + 30.0, rx)
        g2 = {
            "lane": lane, "rx": rx, "speed": g["speed"],
            "zap": jnp.where(zap, 3, jnp.maximum(g["zap"] - 1, 0)),
            "hp": hp,
            "kills": g["kills"] + jnp.any(hit_lane).astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 12.0, jnp.float32)
        for i in range(_TD_LANES):
            y = 55.0 + 38.0 * i
            lane_m = jnp.abs(rows - y) < 14
            frame = jnp.where(lane_m & (cols % 20 < 1), 40.0, frame)
            rec = lane_m & (jnp.abs(cols - g["rx"][i]) < 7)
            frame = jnp.where(rec, 190.0, frame)
        tower = (cols < 18)
        frame = jnp.where(
            tower, 60.0 + 20.0 * g["hp"].astype(jnp.float32), frame
        )
        py = self._lane_y(g["lane"])
        pl = (jnp.abs(rows - py) < 6) & (cols > 20) & (cols < 32)
        frame = jnp.where(pl, 255.0, frame)
        zapb = (g["zap"] > 0) & (jnp.abs(rows - py) < 2) & (cols > 32) & (
            cols < 120
        )
        return jnp.where(zapb, 230.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.4, gray, gray])


class TrondeadEnv(ArcadeEnv):
    GAME_CLS = TrondeadGame
