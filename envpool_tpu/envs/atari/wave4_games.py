"""Arcade wave 4: Tennis, Assault, Atlantis, Kangaroo, UpNDown,
RoadRunner.

Behavioral reference: the corresponding ALE games registered by
``envpool/atari/registration.py:21-35``; faithful-behavior cores (same
control scheme, scoring, lives/terminal structure, visual layout class)
under honest ``XxxLite-v5`` ids — as in waves 1-3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame
from .wave3_games import _freeze_when, _grids


# ---------------------------------------------------------------------------
# Tennis: baseline rally vs a tracking opponent; games to 4 points.
# ---------------------------------------------------------------------------


class TennisGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "px": jnp.float32(RAW_W / 2), "py": jnp.float32(165.0),
            "ox": jnp.float32(RAW_W / 2),
            "bx": jnp.float32(RAW_W / 2), "by": jnp.float32(60.0),
            "bvx": jnp.float32(1.2), "bvy": jnp.float32(2.0),
            "serving": jnp.bool_(True),
            "p_pts": jnp.int32(0), "o_pts": jnp.int32(0),
            "p_games": jnp.int32(0), "o_games": jnp.int32(0),
            "score": jnp.int32(0),
        }

    def over(self, g):
        return (g["p_games"] >= 6) | (g["o_games"] >= 6)

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 10)
        right = (action == 2) | (action == 5) | (action == 7) | (
            action == 11
        ) | (action == 14) | (action == 16)
        left = (action == 3) | (action == 6) | (action == 8) | (
            action == 12
        ) | (action == 15) | (action == 17)
        up = (action == 4) | (action == 5) | (action == 6)
        down = (action == 9) | (action == 7) | (action == 8)
        px = jnp.clip(
            g["px"] + 2.5 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            10.0, RAW_W - 10.0,
        )
        py = jnp.clip(
            g["py"] + 2.0 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            115.0, 190.0,
        )
        # Serve: ball launches from the player on FIRE.
        k1, k2 = jax.random.split(key)
        serve = g["serving"] & fire
        bx = jnp.where(serve, px, g["bx"])
        by = jnp.where(serve, py - 6.0, g["by"])
        bvx = jnp.where(
            serve, jax.random.uniform(k1, (), minval=-1.5, maxval=1.5),
            g["bvx"],
        )
        bvy = jnp.where(serve, -2.2, g["bvy"])
        moving = ~g["serving"] | serve
        bx = bx + jnp.where(moving, bvx, 0.0)
        by = by + jnp.where(moving, bvy, 0.0)
        bvx = jnp.where((bx < 8) | (bx > RAW_W - 8), -bvx, bvx)
        # Player return: ball near the racket while moving down.
        hit_p = (
            moving & (bvy > 0) & (jnp.abs(bx - px) < 10)
            & (jnp.abs(by - py) < 8)
        )
        bvy = jnp.where(hit_p, -jnp.abs(bvy) - 0.1, bvy)
        bvx = jnp.where(hit_p, bvx + (bx - px) * 0.15, bvx)
        # Opponent tracks the ball along the far baseline.
        ox = g["ox"] + jnp.clip(bx - g["ox"], -1.8, 1.8)
        hit_o = moving & (bvy < 0) & (jnp.abs(bx - ox) < 11) & (by < 48)
        bvy = jnp.where(hit_o, jnp.abs(bvy), bvy)
        # Points: ball past a baseline un-returned.
        p_point = moving & (by < 30)    # opponent missed
        o_point = moving & (by > 195)   # player missed
        reward = p_point.astype(jnp.float32) - o_point.astype(jnp.float32)
        p_pts = g["p_pts"] + p_point.astype(jnp.int32)
        o_pts = g["o_pts"] + o_point.astype(jnp.int32)
        p_game = p_pts >= 4
        o_game = o_pts >= 4
        serving = g["serving"] & ~serve | p_point | o_point
        g2 = {
            "px": px, "py": py, "ox": ox,
            "bx": jnp.where(p_point | o_point, px, bx),
            "by": jnp.where(p_point | o_point, py - 6.0, by),
            "bvx": bvx, "bvy": bvy,
            "serving": serving,
            "p_pts": jnp.where(p_game | o_game, 0, p_pts),
            "o_pts": jnp.where(p_game | o_game, 0, o_pts),
            "p_games": g["p_games"] + p_game.astype(jnp.int32),
            "o_games": g["o_games"] + o_game.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        court = (rows > 40) & (rows < 195) & (cols > 8) & (cols < RAW_W - 8)
        frame = jnp.where(court, 95.0, 45.0)
        net = court & (jnp.abs(rows - 110.0) < 2)
        frame = jnp.where(net, 200.0, frame)
        pl = (jnp.abs(rows - g["py"]) < 7) & (jnp.abs(cols - g["px"]) < 4)
        op = (jnp.abs(rows - 42.0) < 7) & (jnp.abs(cols - g["ox"]) < 4)
        ball = ((rows - g["by"]) ** 2 + (cols - g["bx"]) ** 2) < 6.0
        frame = jnp.where(pl, 250.0, jnp.where(op, 150.0, frame))
        return jnp.where(ball, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.7, gray, gray * 0.7])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[69].set(g["p_games"].astype(jnp.uint8))
        ram = ram.at[70].set(g["o_games"].astype(jnp.uint8))
        return ram


class TennisEnv(ArcadeEnv):
    GAME_CLS = TennisGame


# ---------------------------------------------------------------------------
# Assault: mothership dispenses enemies; overheat meter limits fire.
# ---------------------------------------------------------------------------

_AS_N = 3


class AssaultGame(ArcadeGame):
    action_set_size = 7
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        ex = jax.random.uniform(k1, (_AS_N,), jnp.float32, 20, RAW_W - 20)
        ey = jnp.asarray([60.0, 80.0, 100.0])
        return {
            "px": jnp.float32(RAW_W / 2),
            "ex": ex, "ey": ey,
            "edir": jnp.where(
                jax.random.uniform(k2, (_AS_N,)) < 0.5, -1.0, 1.0
            ),
            "alive": jnp.ones((_AS_N,), bool),
            "heat": jnp.float32(0.0),
            "drop_x": jnp.float32(-10.0), "drop_y": jnp.float32(0.0),
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
        px = jnp.clip(
            g["px"] + 2.2 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            10.0, RAW_W - 10.0,
        )
        overheated = g["heat"] >= 1.0
        can_f = fire & ~overheated
        heat = jnp.clip(
            g["heat"] + jnp.where(can_f, 0.12, -0.04), 0.0, 1.2
        )
        # Instant column shot at the lowest enemy overhead.
        in_col = g["alive"] & (jnp.abs(g["ex"] - px) < 7.0)
        tgt = jnp.argmax(in_col * g["ey"])
        hit = can_f & jnp.any(in_col)
        alive = g["alive"] & ~(
            (jnp.arange(_AS_N) == tgt) & hit
        )
        reward = jnp.where(hit, 21.0, 0.0)
        # Enemies strafe and occasionally drop a bomb at the player.
        ex = g["ex"] + g["edir"] * 1.4
        edir = jnp.where((ex < 15) | (ex > RAW_W - 15), -g["edir"],
                         g["edir"])
        k1, k2 = jax.random.split(key)
        drop_now = (g["drop_y"] <= 0) & (
            jax.random.uniform(k1, ()) < 0.05
        )
        src = jax.random.randint(k2, (), 0, _AS_N)
        drop_x = jnp.where(drop_now, ex[src], g["drop_x"])
        drop_y = jnp.where(
            drop_now, g["ey"][src],
            jnp.where(g["drop_y"] > 0, g["drop_y"] + 3.0, 0.0),
        )
        hit_player = (drop_y > 180.0) & (jnp.abs(drop_x - px) < 8.0)
        drop_y = jnp.where(drop_y > 195.0, 0.0, drop_y)
        # Respawn cleared waves.
        wave_clear = ~jnp.any(alive)
        reward = reward + jnp.where(wave_clear, 100.0, 0.0)
        alive = jnp.where(wave_clear, jnp.ones_like(alive), alive)
        ex = jnp.where(
            wave_clear,
            jax.random.uniform(k2, (_AS_N,), jnp.float32, 20, RAW_W - 20),
            ex,
        )
        g2 = {
            "px": px, "ex": ex, "ey": g["ey"], "edir": edir,
            "alive": alive, "heat": heat,
            "drop_x": drop_x, "drop_y": drop_y,
            "lives": g["lives"] - hit_player.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 20.0, jnp.float32)
        ship = (jnp.abs(rows - 35.0) < 6) & (
            jnp.abs(cols - RAW_W / 2) < 40
        )
        frame = jnp.where(ship, 120.0, frame)
        for i in range(_AS_N):
            en = (
                g["alive"][i]
                & (jnp.abs(rows - g["ey"][i]) < 5)
                & (jnp.abs(cols - g["ex"][i]) < 6)
            )
            frame = jnp.where(en, 190.0, frame)
        bomb = ((rows - g["drop_y"]) ** 2 + (cols - g["drop_x"]) ** 2) < 5.0
        frame = jnp.where(bomb & (g["drop_y"] > 0), 230.0, frame)
        pl = (jnp.abs(rows - 185.0) < 6) & (jnp.abs(cols - g["px"]) < 7)
        frame = jnp.where(pl, 250.0, frame)
        bar = (rows > RAW_H - 6) & (cols < g["heat"] * RAW_W)
        return jnp.where(bar, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.6, gray * 0.5])


class AssaultEnv(ArcadeEnv):
    GAME_CLS = AssaultGame


# ---------------------------------------------------------------------------
# Atlantis: ships cross the sky; cannons auto-aim column shots.
# ---------------------------------------------------------------------------

_AT_N = 4
_AT_LANES = np.asarray([40.0, 60.0, 80.0, 100.0])


class AtlantisGame(ArcadeGame):
    action_set_size = 4  # NOOP, center gun, left gun, right gun
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "sx": jax.random.uniform(k1, (_AT_N,), jnp.float32, 0, RAW_W),
            "sdir": jnp.where(
                jax.random.uniform(k2, (_AT_N,)) < 0.5, -1.0, 1.0
            ),
            "alive": jnp.ones((_AT_N,), bool),
            "city": jnp.ones((6,), bool),
            "passes": jnp.zeros((_AT_N,), jnp.int32),
            "cool": jnp.int32(0),
            "score": jnp.int32(0),
        }

    def over(self, g):
        return ~jnp.any(g["city"])

    def tick(self, g, action, key):
        over0 = self.over(g)
        speeds = 1.0 + 0.4 * jnp.arange(_AT_N, dtype=jnp.float32)
        sx = g["sx"] + g["sdir"] * speeds
        wrapped = (sx < -10) | (sx > RAW_W + 10)
        # Each completed pass drops the ship a lane; lane 3 pass bombs a
        # city block.
        passes = g["passes"] + wrapped.astype(jnp.int32)
        bombing = wrapped & (passes >= 3)
        n_bombs = jnp.sum(bombing)
        # knock out the first still-standing blocks
        city = g["city"]
        for _ in range(_AT_N):
            first = jnp.argmax(city)
            city = city.at[first].set(
                city[first] & ~(n_bombs > 0)
            )
            n_bombs = jnp.maximum(n_bombs - 1, 0)
        sx = jnp.mod(sx, RAW_W + 20.0) - 10.0
        # Guns: action picks a gun; instant shot kills a ship in its arc.
        can = (action > 0) & (g["cool"] == 0)
        gun_x = jnp.asarray([RAW_W / 2, 20.0, RAW_W - 20.0])[
            jnp.clip(action - 1, 0, 2)
        ]
        in_arc = g["alive"] & (jnp.abs(sx - gun_x) < 18.0)
        tgt = jnp.argmax(in_arc)
        hit = can & jnp.any(in_arc)
        alive = g["alive"] & ~((jnp.arange(_AT_N) == tgt) & hit)
        lane = jnp.clip(g["passes"], 0, 3)
        reward = jnp.where(hit, 100.0 * (lane[tgt] + 1).astype(jnp.float32),
                           0.0)
        # Respawn shot/expired ships at lane 0.
        k1, k2 = jax.random.split(key)
        gone = ~alive | (g["passes"] > 3)
        alive = alive | gone
        passes = jnp.where(gone, 0, passes)
        sx = jnp.where(
            gone, jax.random.uniform(k1, (_AT_N,), jnp.float32, 0, RAW_W),
            sx,
        )
        g2 = {
            "sx": sx, "sdir": g["sdir"], "alive": alive, "city": city,
            "passes": passes,
            "cool": jnp.where(can, 4, jnp.maximum(g["cool"] - 1, 0)),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 30.0, jnp.float32)
        lanes = jnp.asarray(_AT_LANES, jnp.float32)
        lane = jnp.clip(g["passes"], 0, 3)
        for i in range(_AT_N):
            sh = (
                g["alive"][i]
                & (jnp.abs(rows - lanes[lane[i]]) < 4)
                & (jnp.abs(cols - g["sx"][i]) < 8)
            )
            frame = jnp.where(sh, 200.0, frame)
        for b in range(6):
            blk = (
                g["city"][b]
                & (rows > 170)
                & (jnp.abs(cols - (15 + b * 26.0)) < 10)
            )
            frame = jnp.where(blk, 140.0, frame)
        return frame

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.6, gray * 0.9, gray])


class AtlantisEnv(ArcadeEnv):
    GAME_CLS = AtlantisGame


# ---------------------------------------------------------------------------
# Kangaroo: climb 3 floors via ladders; punch monkeys; grab fruit.
# ---------------------------------------------------------------------------

_KG_FLOOR_Y = np.asarray([180.0, 130.0, 80.0, 30.0])


class KangarooGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "px": jnp.float32(20.0),
            "floor": jnp.int32(0),
            "m_x": jax.random.uniform(k1, (3,), jnp.float32, 30, RAW_W - 30),
            "m_dir": jnp.ones((3,)),
            "m_alive": jnp.ones((3,), bool),
            "fruit_x": jax.random.uniform(
                k2, (3,), jnp.float32, 20, RAW_W - 20
            ),
            "fruit": jnp.ones((3,), bool),
            "lives": jnp.int32(3),
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
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        px = jnp.clip(
            g["px"] + 2.2 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            8.0, RAW_W - 8.0,
        )
        # Ladder at the alternating end of each floor.
        ladder_x = jnp.where(jnp.mod(g["floor"], 2) == 0,
                             RAW_W - 16.0, 16.0)
        at_ladder = jnp.abs(px - ladder_x) < 6.0
        climbed = up & at_ladder & (g["floor"] < 3)
        floor = g["floor"] + climbed.astype(jnp.int32)
        reward = jnp.where(climbed, 200.0, 0.0)
        # Top floor: reach the joey → level reward, restart at bottom.
        topped = (floor >= 3)
        reward = reward + jnp.where(topped, 800.0, 0.0)
        floor = jnp.where(topped, 0, floor)
        px = jnp.where(topped, 20.0, px)
        # Monkeys patrol floors 1..3 and hit on contact; punch kills.
        m_x = g["m_x"] + g["m_dir"] * 1.3
        m_dir = jnp.where((m_x < 20) | (m_x > RAW_W - 20), -g["m_dir"],
                          g["m_dir"])
        same_floor = jnp.arange(1, 4) == floor[None]
        near = jnp.abs(m_x - px) < 9.0
        punched = g["m_alive"] & same_floor.reshape(3) & near & fire
        reward = reward + jnp.sum(punched) * 200.0
        hit = jnp.any(
            g["m_alive"] & same_floor.reshape(3) & near & ~fire
        )
        m_alive = g["m_alive"] & ~punched
        k1, k2 = jax.random.split(key)
        m_alive2 = m_alive | (jax.random.uniform(k1, (3,)) < 0.02)
        # Fruit on the current floor.
        grabbed = g["fruit"] & (jnp.abs(g["fruit_x"] - px) < 6.0) & (
            jnp.arange(3) == jnp.clip(floor, 0, 2)
        )
        reward = reward + jnp.sum(grabbed) * 100.0
        g2 = {
            "px": px, "floor": floor,
            "m_x": m_x, "m_dir": m_dir, "m_alive": m_alive2,
            "fruit_x": g["fruit_x"], "fruit": g["fruit"] & ~grabbed,
            "lives": g["lives"] - hit.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 35.0, jnp.float32)
        fy = jnp.asarray(_KG_FLOOR_Y, jnp.float32)
        for f in range(4):
            fl = jnp.abs(rows - (fy[f] + 8)) < 2
            frame = jnp.where(fl, 120.0, frame)
        for f in range(3):
            lx = RAW_W - 16.0 if f % 2 == 0 else 16.0
            ld = (
                (rows > fy[f + 1]) & (rows < fy[f] + 8)
                & (jnp.abs(cols - lx) < 3)
            )
            frame = jnp.where(ld, 90.0, frame)
        for i in range(3):
            mk = (
                g["m_alive"][i]
                & (jnp.abs(rows - fy[i + 1]) < 5)
                & (jnp.abs(cols - g["m_x"][i]) < 4)
            )
            frame = jnp.where(mk, 170.0, frame)
            fr = (
                g["fruit"][i]
                & (jnp.abs(rows - (fy[i] - 2)) < 3)
                & (jnp.abs(cols - g["fruit_x"][i]) < 3)
            )
            frame = jnp.where(fr, 220.0, frame)
        py = fy[g["floor"]]
        pl = (jnp.abs(rows - py) < 7) & (jnp.abs(cols - g["px"]) < 4)
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.75, gray * 0.5])


class KangarooEnv(ArcadeEnv):
    GAME_CLS = KangarooGame


# ---------------------------------------------------------------------------
# UpNDown: vertical road, jump over or land on opposing cars.
# ---------------------------------------------------------------------------

_UD_N = 4


class UpNDownGame(ArcadeGame):
    action_set_size = 6  # NOOP FIRE(jump) UP DOWN UPFIRE DOWNFIRE
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "pv": jnp.float32(1.5),        # own speed along the road
            "road": jnp.float32(0.0),      # own road position
            "jump": jnp.float32(0.0),      # airborne timer
            "c_pos": jax.random.uniform(
                k1, (_UD_N,), jnp.float32, 40.0, 400.0
            ),
            "c_v": jax.random.uniform(
                k2, (_UD_N,), jnp.float32, 0.8, 1.6
            ),
            "c_alive": jnp.ones((_UD_N,), bool),
            "lives": jnp.int32(4),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        jump = (action == 1) | (action == 4) | (action == 5)
        up = (action == 2) | (action == 4)
        down = (action == 3) | (action == 5)
        pv = jnp.clip(
            g["pv"] + 0.2 * (up.astype(jnp.float32)
                             - down.astype(jnp.float32)),
            0.5, 3.0,
        )
        road = g["road"] + pv
        airborne = g["jump"] > 0
        jstart = jump & ~airborne
        jt = jnp.where(jstart, 10.0, jnp.maximum(g["jump"] - 1.0, 0.0))
        c_pos = g["c_pos"] + g["c_v"]
        rel = jnp.mod(c_pos - road + 240.0, 480.0) - 240.0
        close = g["c_alive"] & (jnp.abs(rel) < 6.0)
        # Landing on a car (descending from a jump) squashes it (+100);
        # contact on the ground costs a life.
        landing = (g["jump"] > 0) & (jt == 0)
        squash = close & landing
        crash = jnp.any(close) & (jt == 0) & ~landing
        reward = jnp.sum(squash) * 100.0
        k1, k2 = jax.random.split(key)
        c_alive = g["c_alive"] & ~squash
        respawn = ~c_alive
        c_pos = jnp.where(
            respawn,
            road + jax.random.uniform(
                k1, (_UD_N,), jnp.float32, 120.0, 400.0
            ),
            c_pos,
        )
        c_alive = c_alive | respawn
        g2 = {
            "pv": pv, "road": road, "jump": jt,
            "c_pos": c_pos, "c_v": g["c_v"], "c_alive": c_alive,
            "lives": g["lives"] - crash.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        # Zig-zag road: x center varies with road-space coordinate.
        space = g["road"] + (RAW_H - rows) * 1.2
        cx = RAW_W / 2 + 40.0 * jnp.sin(space / 60.0)
        on_road = jnp.abs(cols - cx) < 16.0
        frame = jnp.where(on_road, 100.0, 40.0)
        for i in range(_UD_N):
            rel = jnp.mod(g["c_pos"][i] - g["road"] + 240.0, 480.0) - 240.0
            cy = 170.0 - rel * 1.2 / 1.0
            ccx = RAW_W / 2 + 40.0 * jnp.sin(
                (g["road"] + rel + (0.0)) / 60.0
            )
            car = (
                g["c_alive"][i]
                & (jnp.abs(rows - cy) < 5) & (jnp.abs(cols - ccx) < 6)
                & (cy > 10) & (cy < RAW_H - 10)
            )
            frame = jnp.where(car, 200.0, frame)
        py = 170.0 - g["jump"] * 2.0
        pcx = RAW_W / 2 + 40.0 * jnp.sin(g["road"] / 60.0)
        pl = (jnp.abs(rows - py) < 6) & (jnp.abs(cols - pcx) < 6)
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.8, gray * 0.9])


class UpNDownEnv(ArcadeEnv):
    GAME_CLS = UpNDownGame


# ---------------------------------------------------------------------------
# RoadRunner: run along the road eating seeds; coyote chases; trucks.
# ---------------------------------------------------------------------------

_RRN_SEEDS = 6


class RoadRunnerGame(ArcadeGame):
    action_set_size = 18
    has_fire = False

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "px": jnp.float32(110.0), "py": jnp.float32(140.0),
            "cx": jnp.float32(RAW_W + 20.0), "cy": jnp.float32(140.0),
            "seed_x": jax.random.uniform(
                k1, (_RRN_SEEDS,), jnp.float32, 0, RAW_W
            ),
            "seed_y": 110.0 + jax.random.uniform(
                k2, (_RRN_SEEDS,), jnp.float32, 0, 70.0
            ),
            "seed": jnp.ones((_RRN_SEEDS,), bool),
            "truck_x": jnp.float32(-30.0),
            "truck_y": jnp.float32(125.0),
            "lives": jnp.int32(3),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        up = (action == 2) | (action == 6) | (action == 7)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        down = (action == 5) | (action == 8) | (action == 9)
        px = jnp.clip(
            g["px"] + 2.8 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            6.0, RAW_W - 6.0,
        )
        py = jnp.clip(
            g["py"] + 2.2 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            108.0, 185.0,
        )
        # World scrolls left under the runner.
        scroll = 1.5
        seed_x = jnp.mod(g["seed_x"] - scroll, jnp.float32(RAW_W))
        eat = g["seed"] & (
            jnp.abs(seed_x - px) < 6.0
        ) & (jnp.abs(g["seed_y"] - py) < 6.0)
        reward = jnp.sum(eat) * 100.0
        k1, k2 = jax.random.split(key)
        seeds = g["seed"] & ~eat
        refill = ~jnp.any(seeds)
        seeds = seeds | refill
        seed_y = jnp.where(
            refill,
            110.0 + jax.random.uniform(
                k1, (_RRN_SEEDS,), jnp.float32, 0, 70.0
            ),
            g["seed_y"],
        )
        # Coyote chases (slightly slower than the max run speed).
        cx = g["cx"] + jnp.clip(px - g["cx"], -2.2, 2.2) - scroll * 0.3
        cy = g["cy"] + jnp.clip(py - g["cy"], -1.8, 1.8)
        caught = (jnp.abs(cx - px) < 7.0) & (jnp.abs(cy - py) < 8.0)
        # Truck sweeps right-to-left along the highway lane.
        tx = g["truck_x"] - 3.5
        tx = jnp.where(tx < -40.0, RAW_W + 40.0, tx)
        squashed = (jnp.abs(tx - px) < 12.0) & (
            jnp.abs(g["truck_y"] - py) < 9.0
        )
        die = caught | squashed
        g2 = {
            "px": jnp.where(die, 110.0, px),
            "py": jnp.where(die, 140.0, py),
            "cx": jnp.where(die, RAW_W + 20.0, cx),
            "cy": jnp.where(die, 140.0, cy),
            "seed_x": seed_x, "seed_y": seed_y, "seed": seeds,
            "truck_x": tx, "truck_y": g["truck_y"],
            "lives": g["lives"] - die.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        road = (rows > 105.0) & (rows < 190.0)
        frame = jnp.where(road, 110.0, 60.0)
        lane = jnp.abs(rows - 125.0) < 1.5
        frame = jnp.where(lane & road, 160.0, frame)
        for i in range(_RRN_SEEDS):
            sd = (
                g["seed"][i]
                & (jnp.abs(rows - g["seed_y"][i]) < 2)
                & (jnp.abs(cols - g["seed_x"][i]) < 2)
            )
            frame = jnp.where(sd, 230.0, frame)
        tr = (jnp.abs(rows - g["truck_y"]) < 7) & (
            jnp.abs(cols - g["truck_x"]) < 12
        )
        frame = jnp.where(tr, 80.0, frame)
        cy = (jnp.abs(rows - g["cy"]) < 7) & (jnp.abs(cols - g["cx"]) < 5)
        frame = jnp.where(cy, 140.0, frame)
        pl = (jnp.abs(rows - g["py"]) < 7) & (jnp.abs(cols - g["px"]) < 4)
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.85, gray * 0.6])


class RoadRunnerEnv(ArcadeEnv):
    GAME_CLS = RoadRunnerGame
