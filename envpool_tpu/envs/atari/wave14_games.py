"""Arcade wave 14: DonkeyKong, MarioBros, Frogger, KeystoneKapers,
Pitfall2, MrDo — platform/arcade half of the non-57 ALE roster.

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
# DonkeyKong: four sloped girders, barrels roll down them; climb the
# ladders and jump barrels to reach the top.
# ---------------------------------------------------------------------------

_DK_ROWS = 4
_DK_BARRELS = 3


class DonkeyKongGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "px": jnp.float32(20.0), "row": jnp.int32(0),
            "jump": jnp.int32(0),
            "bx": jnp.asarray([40.0, 90.0, 140.0], jnp.float32),
            "brow": jnp.asarray([3, 2, 1], jnp.int32),
            "lives": jnp.int32(3),
            "won": jnp.bool_(False),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return (g["lives"] <= 0) | g["won"]

    @staticmethod
    def _row_y(row):
        return 190.0 - 42.0 * row.astype(jnp.float32)

    @staticmethod
    def _ladder_x(row):
        # Ladders alternate ends of each girder.
        return jnp.where(row % 2 == 0, RAW_W - 25.0, 25.0)

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        px = jnp.clip(
            g["px"] + 2.2 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            8.0, RAW_W - 8.0,
        )
        at_ladder = jnp.abs(px - self._ladder_x(g["row"])) < 6.0
        at_ladder_dn = jnp.abs(px - self._ladder_x(g["row"] - 1)) < 6.0
        row = jnp.clip(
            g["row"]
            + (up & at_ladder).astype(jnp.int32)
            - (down & at_ladder_dn).astype(jnp.int32),
            0, _DK_ROWS - 1,
        )
        jump = jnp.where(
            fire & (g["jump"] == 0), 7, jnp.maximum(g["jump"] - 1, 0)
        )
        # Barrels roll along their girder in its slope direction, then
        # drop a row at the end.
        bdir = jnp.where(g["brow"] % 2 == 0, 1.0, -1.0)
        bx = g["bx"] + 1.8 * bdir
        at_end = (bx > RAW_W - 10.0) | (bx < 10.0)
        brow = jnp.where(at_end, jnp.maximum(g["brow"] - 1, 0), g["brow"])
        bx = jnp.clip(bx, 10.0, RAW_W - 10.0)
        # Barrel off row 0's end: respawn at the top.
        gone = at_end & (g["brow"] == 0)
        brow = jnp.where(gone, _DK_ROWS - 1, brow)
        bx = jnp.where(gone, 15.0, bx)
        same = brow == row
        close = same & (jnp.abs(bx - px) < 6.0)
        hopped = jnp.any(close) & (jump > 0)
        hit = jnp.any(close) & (jump == 0)
        reward = jnp.where(hopped, 100.0, 0.0)
        lives = g["lives"] - hit.astype(jnp.int32)
        row = jnp.where(hit, 0, row)
        px = jnp.where(hit, 20.0, px)
        won = (row == _DK_ROWS - 1) & (
            jnp.abs(px - RAW_W / 2.0) < 10.0
        )
        reward = reward + jnp.where(won & ~g["won"], 2000.0, 0.0)
        g2 = {
            "px": px, "row": row, "jump": jump,
            "bx": bx, "brow": brow,
            "lives": lives, "won": won,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 10.0, jnp.float32)
        for r in range(_DK_ROWS):
            y = 190.0 - 42.0 * r
            slope = (1 if r % 2 == 0 else -1) * 0.06
            gird = jnp.abs(rows - (y + slope * (cols - 80.0)) - 5.0) < 2
            frame = jnp.where(gird, 120.0, frame)
            lx = RAW_W - 25.0 if r % 2 == 0 else 25.0
            lad = (
                (rows > y - 42.0) & (rows < y + 5.0)
                & (jnp.abs(cols - lx) < 3)
            )
            frame = jnp.where(lad, 90.0, frame)
        for i in range(_DK_BARRELS):
            y = self._row_y(g["brow"][i])
            b = (jnp.abs(rows - y) < 4) & (jnp.abs(cols - g["bx"][i]) < 4)
            frame = jnp.where(b, 200.0, frame)
        # The ape at the top.
        ape = (rows < 40) & (jnp.abs(cols - RAW_W / 2.0) < 12)
        frame = jnp.where(ape, 160.0, frame)
        py = self._row_y(g["row"]) - jnp.where(g["jump"] > 0, 9.0, 0.0)
        pl = (jnp.abs(rows - py) < 5) & (jnp.abs(cols - g["px"]) < 4)
        return jnp.where(pl, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.55, gray * 0.3])


class DonkeyKongEnv(ArcadeEnv):
    GAME_CLS = DonkeyKongGame


# ---------------------------------------------------------------------------
# MarioBros: POW floors — bump the floor under a pest to flip it, then
# kick it off while it is on its back.
# ---------------------------------------------------------------------------

_MB_PESTS = 3
_MB_ROWS = 3


class MarioBrosGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "px": jnp.float32(RAW_W / 2), "row": jnp.int32(0),
            "jump": jnp.int32(0),
            "ex": jnp.asarray([30.0, 80.0, 130.0], jnp.float32),
            "erow": jnp.asarray([1, 2, 1], jnp.int32),
            "evx": jnp.asarray([1.1, -1.3, 1.5], jnp.float32),
            "flipped": jnp.zeros((_MB_PESTS,), jnp.int32),  # frames left
            "lives": jnp.int32(3),
            "cleared": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    @staticmethod
    def _row_y(row):
        return 185.0 - 50.0 * row.astype(jnp.float32)

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        px = g["px"] + 2.4 * (right.astype(jnp.float32)
                              - left.astype(jnp.float32))
        px = px % RAW_W  # wrap-around pipes
        jump_start = fire & (g["jump"] == 0)
        jump = jnp.where(jump_start, 10, jnp.maximum(g["jump"] - 1, 0))
        # Jump apogee bumps the floor above: flips pests standing there.
        bump = jump == 5
        above = g["erow"] == (g["row"] + 1)
        bumped = (
            above & bump
            & (jnp.abs(g["ex"] - px) < 12.0)
        )
        flipped = jnp.where(bumped, 90, jnp.maximum(g["flipped"] - 1, 0))
        # Pests patrol their row unless flipped.
        ex = g["ex"] + jnp.where(flipped > 0, 0.0, g["evx"])
        ex = ex % RAW_W
        # Kick: touch a flipped pest on its own row.
        same = g["erow"] == g["row"]
        kick = same & (flipped > 0) & (jnp.abs(ex - px) < 7.0)
        reward = jnp.where(jnp.any(kick), 800.0, 0.0)
        # Kicked pests respawn at the top, unflipped and faster.
        k1 = key
        resp = kick
        ex = jnp.where(
            resp, jax.random.uniform(k1, (_MB_PESTS,), jnp.float32,
                                     10.0, RAW_W - 10.0),
            ex,
        )
        erow = jnp.where(resp, _MB_ROWS - 1, g["erow"])
        evx = jnp.where(resp, g["evx"] * 1.15, g["evx"])
        flipped = jnp.where(resp, 0, flipped)
        # Unflipped pest touching the player on the same row bites.
        bite = jnp.any(
            same & (flipped == 0) & ~kick & (jnp.abs(ex - px) < 5.0)
            & (g["jump"] == 0)
        )
        lives = g["lives"] - bite.astype(jnp.int32)
        px = jnp.where(bite, RAW_W / 2.0, px)
        # Row changes at pipe columns (edges) while jumping.
        at_pipe = (px < 14.0) | (px > RAW_W - 14.0)
        row = jnp.clip(
            g["row"]
            + (up & at_pipe).astype(jnp.int32)
            - (down & at_pipe).astype(jnp.int32),
            0, _MB_ROWS - 1,
        )
        row = jnp.where(bite, 0, row)
        g2 = {
            "px": px, "row": row, "jump": jump,
            "ex": ex, "erow": erow, "evx": evx, "flipped": flipped,
            "lives": lives,
            "cleared": g["cleared"] + jnp.sum(kick.astype(jnp.int32)),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 12.0, jnp.float32)
        for r in range(_MB_ROWS):
            y = 185.0 - 50.0 * r
            fl = jnp.abs(rows - y - 6.0) < 2
            frame = jnp.where(fl, 110.0, frame)
        for i in range(_MB_PESTS):
            y = self._row_y(g["erow"][i])
            v = jnp.where(g["flipped"][i] > 0, 230.0, 170.0)
            e = (jnp.abs(rows - y) < 4) & (jnp.abs(cols - g["ex"][i]) < 5)
            frame = jnp.where(e, v, frame)
        py = self._row_y(g["row"]) - jnp.where(g["jump"] > 0, 12.0, 0.0)
        pl = (jnp.abs(rows - py) < 5) & (jnp.abs(cols - g["px"]) < 4)
        return jnp.where(pl, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.6, gray * 0.5])


class MarioBrosEnv(ArcadeEnv):
    GAME_CLS = MarioBrosGame


# ---------------------------------------------------------------------------
# Frogger: cross five traffic lanes then five river lanes (ride the
# logs) into one of the home bays.
# ---------------------------------------------------------------------------

_FR_LANES = 10  # 5 road (rows 1-5), 5 river (rows 6-10)


class FroggerGame(ArcadeGame):
    action_set_size = 5
    has_fire = False
    minimal_set = (0, 2, 3, 4, 5)

    def init(self, key):
        k1 = key
        return {
            "col": jnp.float32(RAW_W / 2),
            "lane": jnp.int32(0),             # 0 start, 11 = home row
            "ox": jax.random.uniform(k1, (_FR_LANES,), jnp.float32,
                                     0.0, RAW_W),
            "ov": jnp.asarray(
                [1.2, -1.6, 2.0, -1.1, 1.5, -1.3, 1.8, -1.0, 1.4, -1.7],
                jnp.float32,
            ),
            "homes": jnp.zeros((3,), bool),
            "lives": jnp.int32(4),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return (g["lives"] <= 0) | jnp.all(g["homes"])

    @staticmethod
    def _lane_y(lane):
        return 195.0 - 16.0 * lane.astype(jnp.float32)

    def tick(self, g, action, key):
        over0 = self.over(g)
        up = action == 1
        right = action == 2
        left = action == 3
        down = action == 4
        lane = jnp.clip(
            g["lane"] + up.astype(jnp.int32) - down.astype(jnp.int32),
            0, 11,
        )
        hopped_up = lane > g["lane"]
        col = jnp.clip(
            g["col"] + 8.0 * (right.astype(jnp.float32)
                              - left.astype(jnp.float32)),
            5.0, RAW_W - 5.0,
        )
        ox = (g["ox"] + g["ov"]) % RAW_W
        # Lanes 1-5: cars (hit = death).  Lanes 6-10: logs (must ride).
        li = lane - 1
        on_obj_lane = (lane >= 1) & (lane <= 10)
        obj_x = jnp.where(on_obj_lane, ox[jnp.clip(li, 0, 9)], 0.0)
        obj_v = jnp.where(on_obj_lane, g["ov"][jnp.clip(li, 0, 9)], 0.0)
        dist = jnp.abs(
            ((obj_x - col + RAW_W / 2) % RAW_W) - RAW_W / 2
        )
        is_road = (lane >= 1) & (lane <= 5)
        is_river = (lane >= 6) & (lane <= 10)
        squashed = is_road & (dist < 9.0)
        drowned = is_river & (dist >= 14.0)
        col = jnp.where(is_river & ~drowned, (col + obj_v) % RAW_W, col)
        off_edge = is_river & ((col < 4.0) | (col > RAW_W - 4.0))
        died = squashed | drowned | off_edge
        # Home row: three bays.
        bay_x = jnp.asarray([30.0, 80.0, 130.0])
        at_home = lane == 11
        in_bay = jnp.abs(bay_x - col) < 10.0
        bay_ok = at_home & jnp.any(in_bay & ~g["homes"])
        bay_i = jnp.argmax(in_bay & ~g["homes"])
        homes = g["homes"] | ((jnp.arange(3) == bay_i) & bay_ok)
        bad_home = at_home & ~bay_ok
        died = died | bad_home
        reward = (
            jnp.where(hopped_up & ~died, 10.0, 0.0)
            + jnp.where(bay_ok, 500.0, 0.0)
            + jnp.where(jnp.all(homes) & ~jnp.all(g["homes"]), 1000.0, 0.0)
        )
        lives = g["lives"] - died.astype(jnp.int32)
        lane = jnp.where(died | bay_ok, 0, lane)
        col = jnp.where(died | bay_ok, RAW_W / 2.0, col)
        g2 = {
            "col": col, "lane": lane, "ox": ox, "ov": g["ov"],
            "homes": homes, "lives": lives,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 25.0, jnp.float32)
        river = (rows > self._lane_y(jnp.int32(10)) - 8) & (
            rows < self._lane_y(jnp.int32(6)) + 8
        )
        frame = jnp.where(river, 45.0, frame)
        for i in range(_FR_LANES):
            y = 195.0 - 16.0 * (i + 1)
            w = 8 if i < 5 else 13
            v = 180.0 if i < 5 else 95.0
            d = jnp.abs(
                ((g["ox"][i] - cols + RAW_W / 2) % RAW_W) - RAW_W / 2
            )
            o = (jnp.abs(rows - y) < 5) & (d < w)
            frame = jnp.where(o, v, frame)
        for b, bx in enumerate((30.0, 80.0, 130.0)):
            bay = (rows < self._lane_y(jnp.int32(11)) + 6) & (
                jnp.abs(cols - bx) < 10
            )
            v = jnp.where(g["homes"][b], 220.0, 60.0)
            frame = jnp.where(bay, v, frame)
        fy = self._lane_y(g["lane"])
        fr = (jnp.abs(rows - fy) < 5) & (jnp.abs(cols - g["col"]) < 4)
        return jnp.where(fr, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.5, gray, gray * 0.5])


class FroggerEnv(ArcadeEnv):
    GAME_CLS = FroggerGame


# ---------------------------------------------------------------------------
# KeystoneKapers: chase the krook through the department store floors
# (escalators at alternating ends) before the timer runs out, hurdling
# shopping carts.
# ---------------------------------------------------------------------------

_KK_FLOORS = 4
_KK_CARTS = 3


class KeystoneKapersGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "px": jnp.float32(10.0), "floor": jnp.int32(0),
            "jump": jnp.int32(0),
            "kx": jnp.float32(60.0), "kfloor": jnp.int32(0),
            "cx": jnp.asarray([50.0, 100.0, 140.0], jnp.float32),
            "cfloor": jnp.asarray([0, 1, 2], jnp.int32),
            "timer": jnp.float32(50.0 * 60.0),  # frames
            "lives": jnp.int32(3),
            "caught": jnp.bool_(False),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return (g["lives"] <= 0) | g["caught"] | (g["timer"] <= 0.0)

    @staticmethod
    def _floor_y(f):
        return 188.0 - 44.0 * f.astype(jnp.float32)

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        px = jnp.clip(
            g["px"] + 2.6 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            6.0, RAW_W - 6.0,
        )
        esc_x = jnp.where(g["floor"] % 2 == 0, RAW_W - 12.0, 12.0)
        at_esc = jnp.abs(px - esc_x) < 6.0
        floor = jnp.clip(
            g["floor"] + (up & at_esc).astype(jnp.int32)
            - (down & at_esc).astype(jnp.int32),
            0, _KK_FLOORS - 1,
        )
        jump = jnp.where(
            fire & (g["jump"] == 0), 7, jnp.maximum(g["jump"] - 1, 0)
        )
        # The krook runs up the store, one escalator ahead.
        kdir = jnp.where(g["kfloor"] % 2 == 0, 1.0, -1.0)
        kx = g["kx"] + 1.6 * kdir
        kesc = jnp.where(g["kfloor"] % 2 == 0, RAW_W - 10.0, 10.0)
        k_up = jnp.abs(kx - kesc) < 4.0
        kfloor = jnp.minimum(
            g["kfloor"] + k_up.astype(jnp.int32), _KK_FLOORS - 1
        )
        kx = jnp.clip(kx, 8.0, RAW_W - 8.0)
        # Carts roll toward the kop on his floor.
        cx = g["cx"] - 2.0
        cx = jnp.where(cx < 5.0, RAW_W - 5.0, cx)
        same = g["cfloor"] == floor
        bump = jnp.any(
            same & (jnp.abs(cx - px) < 6.0) & (jump == 0)
        )
        timer = g["timer"] - 1.0 - 120.0 * bump.astype(jnp.float32)
        caught = (floor == g["kfloor"]) & (jnp.abs(px - kx) < 7.0)
        reward = jnp.where(
            caught & ~g["caught"],
            100.0 + jnp.maximum(timer, 0.0) / 10.0, 0.0,
        )
        g2 = {
            "px": px, "floor": floor, "jump": jump,
            "kx": kx, "kfloor": kfloor,
            "cx": cx, "cfloor": g["cfloor"],
            "timer": timer, "lives": g["lives"],
            "caught": caught | g["caught"],
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 20.0, jnp.float32)
        for f in range(_KK_FLOORS):
            y = 188.0 - 44.0 * f
            fl = jnp.abs(rows - y - 6.0) < 2
            frame = jnp.where(fl, 100.0, frame)
            ex = RAW_W - 12.0 if f % 2 == 0 else 12.0
            esc = (
                (rows > y - 44.0) & (rows < y + 6.0)
                & (jnp.abs(cols - ex) < 4)
            )
            frame = jnp.where(esc, 70.0, frame)
        for i in range(_KK_CARTS):
            y = self._floor_y(g["cfloor"][i])
            c = (jnp.abs(rows - y) < 4) & (jnp.abs(cols - g["cx"][i]) < 5)
            frame = jnp.where(c, 150.0, frame)
        ky = self._floor_y(g["kfloor"])
        kr = (jnp.abs(rows - ky) < 5) & (jnp.abs(cols - g["kx"]) < 4)
        frame = jnp.where(kr, 200.0, frame)
        py = self._floor_y(g["floor"]) - jnp.where(g["jump"] > 0, 9.0, 0.0)
        pl = (jnp.abs(rows - py) < 5) & (jnp.abs(cols - g["px"]) < 4)
        frame = jnp.where(pl, 255.0, frame)
        bar = (rows < 6) & (cols < g["timer"] / (50.0 * 60.0) * RAW_W)
        return jnp.where(bar, 180.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.6, gray * 0.8, gray])


class KeystoneKapersEnv(ArcadeEnv):
    GAME_CLS = KeystoneKapersGame


# ---------------------------------------------------------------------------
# Pitfall2: cavern descent — fall/climb through shafts collecting
# treasures; losses warp you back to the last checkpoint instead of
# costing lives (the sequel's signature rule).
# ---------------------------------------------------------------------------

_P2_LEVELS = 4
_P2_ITEMS = 4


class Pitfall2Game(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "px": jnp.float32(20.0),
            "depth": jnp.int32(0),
            "ix": jax.random.uniform(k1, (_P2_ITEMS,), jnp.float32,
                                     20.0, RAW_W - 20.0),
            "ilvl": jnp.arange(_P2_ITEMS, dtype=jnp.int32),
            "got": jnp.zeros((_P2_ITEMS,), bool),
            "bat_x": jnp.float32(RAW_W),
            "bat_lvl": jnp.int32(1),
            "check_depth": jnp.int32(0),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return jnp.all(g["got"])

    @staticmethod
    def _lvl_y(lvl):
        return 50.0 + 40.0 * lvl.astype(jnp.float32)

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        px = jnp.clip(
            g["px"] + 2.4 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            6.0, RAW_W - 6.0,
        )
        # Shafts at thirds: move between cavern levels there.
        shaft = (
            (jnp.abs(px - RAW_W * 0.33) < 6.0)
            | (jnp.abs(px - RAW_W * 0.66) < 6.0)
        )
        depth = jnp.clip(
            g["depth"] + (down & shaft).astype(jnp.int32)
            - (up & shaft).astype(jnp.int32),
            0, _P2_LEVELS - 1,
        )
        # The bat patrols its level.
        bat_x = (g["bat_x"] - 2.2) % RAW_W
        hit = (depth == g["bat_lvl"]) & (jnp.abs(bat_x - px) < 6.0)
        # Sequel rule: no lives — warp to checkpoint, score decays.
        px = jnp.where(hit, 20.0, px)
        depth = jnp.where(hit, g["check_depth"], depth)
        penalty = jnp.where(hit, 100.0, 0.0)
        grab = (
            ~g["got"] & (g["ilvl"] == depth)
            & (jnp.abs(g["ix"] - px) < 7.0)
        )
        got = g["got"] | grab
        # Each treasure is also a checkpoint.
        any_grab = jnp.any(grab)
        check = jnp.where(any_grab, depth, g["check_depth"])
        reward = jnp.where(any_grab, 5000.0, 0.0) - penalty
        g2 = {
            "px": px, "depth": depth, "ix": g["ix"], "ilvl": g["ilvl"],
            "got": got, "bat_x": bat_x, "bat_lvl": g["bat_lvl"],
            "check_depth": check,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 18.0, jnp.float32)
        for lvl in range(_P2_LEVELS):
            y = 50.0 + 40.0 * lvl
            ledge = jnp.abs(rows - y - 8.0) < 2
            frame = jnp.where(ledge, 85.0, frame)
        for sx in (RAW_W * 0.33, RAW_W * 0.66):
            sh = (jnp.abs(cols - sx) < 5) & (rows > 45) & (rows < 180)
            frame = jnp.where(sh, 35.0, frame)
        for i in range(_P2_ITEMS):
            y = self._lvl_y(g["ilvl"][i])
            it = (
                ~g["got"][i]
                & (jnp.abs(rows - y) < 4)
                & (jnp.abs(cols - g["ix"][i]) < 4)
            )
            frame = jnp.where(it, 230.0, frame)
        by = self._lvl_y(g["bat_lvl"])
        bat = (jnp.abs(rows - by + 10.0) < 3) & (
            jnp.abs(cols - g["bat_x"]) < 6
        )
        frame = jnp.where(bat, 170.0, frame)
        py = self._lvl_y(g["depth"])
        pl = (jnp.abs(rows - py) < 5) & (jnp.abs(cols - g["px"]) < 4)
        return jnp.where(pl, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.7, gray * 0.9, gray * 0.5])


class Pitfall2Env(ArcadeEnv):
    GAME_CLS = Pitfall2Game


# ---------------------------------------------------------------------------
# MrDo: dig through the orchard grid eating cherries; throw the
# power-ball at the chasing creature.
# ---------------------------------------------------------------------------

_MD_H, _MD_W = 13, 10  # cell grid


class MrDoGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        cherries = jnp.ones((_MD_H, _MD_W), bool)
        return {
            "pr": jnp.int32(_MD_H - 1), "pc": jnp.int32(_MD_W // 2),
            "dug": jnp.zeros((_MD_H, _MD_W), bool),
            "cherries": cherries,
            "er": jnp.int32(0), "ec": jnp.int32(0),
            "ball": jnp.int32(0),       # cooldown
            "lives": jnp.int32(3),
            "eaten": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return (g["lives"] <= 0) | (g["eaten"] >= _MD_H * _MD_W)

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        pr = jnp.clip(
            g["pr"] + down.astype(jnp.int32) - up.astype(jnp.int32),
            0, _MD_H - 1,
        )
        pc = jnp.clip(
            g["pc"] + right.astype(jnp.int32) - left.astype(jnp.int32),
            0, _MD_W - 1,
        )
        cell = (jnp.arange(_MD_H)[:, None] == pr) & (
            jnp.arange(_MD_W)[None, :] == pc
        )
        dug = g["dug"] | cell
        ate = jnp.any(cell & g["cherries"])
        cherries = g["cherries"] & ~cell
        reward = jnp.where(ate, 50.0, 0.0)
        # The creature chases through DUG tunnels only (it must follow
        # the player's paths); if no dug route closer, it waits.
        dr = jnp.sign(pr - g["er"])
        dc = jnp.sign(pc - g["ec"])
        try_r = jnp.clip(g["er"] + dr, 0, _MD_H - 1)
        try_c = jnp.clip(g["ec"] + dc, 0, _MD_W - 1)
        can_r = dug[try_r, g["ec"]]
        can_c = dug[g["er"], try_c]
        er = jnp.where(can_r, try_r, g["er"])
        ec = jnp.where(~can_r & can_c, try_c, g["ec"])
        # Power-ball: kills the creature at range ≤ 2 along the row/col.
        aligned = (er == pr) | (ec == pc)
        near = (jnp.abs(er - pr) + jnp.abs(ec - pc)) <= 3
        zap = fire & (g["ball"] == 0) & aligned & near
        reward = reward + jnp.where(zap, 500.0, 0.0)
        k1, k2 = jax.random.split(key)
        er = jnp.where(zap, 0, er)
        ec = jnp.where(
            zap, jax.random.randint(k2, (), 0, _MD_W), ec
        )
        ball = jnp.where(zap, 60, jnp.maximum(g["ball"] - 1, 0))
        bitten = (er == pr) & (ec == pc) & ~zap
        lives = g["lives"] - bitten.astype(jnp.int32)
        pr = jnp.where(bitten, _MD_H - 1, pr)
        pc = jnp.where(bitten, _MD_W // 2, pc)
        g2 = {
            "pr": pr, "pc": pc, "dug": dug, "cherries": cherries,
            "er": er, "ec": ec, "ball": ball, "lives": lives,
            "eaten": g["eaten"] + ate.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        ch, cw = 14, 15
        rr = jnp.clip((rows - 15) // ch, 0, _MD_H - 1).astype(jnp.int32)
        cc = jnp.clip((cols - 5) // cw, 0, _MD_W - 1).astype(jnp.int32)
        dug = g["dug"][rr, cc]
        cherry = g["cherries"][rr, cc]
        frame = jnp.where(dug, 30.0, 90.0)
        in_cell = ((rows - 15) % ch < 5) & ((cols - 5) % cw < 5)
        frame = jnp.where(cherry & in_cell, 180.0, frame)
        em = (rr == g["er"]) & (cc == g["ec"]) & in_cell
        frame = jnp.where(em, 220.0, frame)
        pm = (rr == g["pr"]) & (cc == g["pc"])
        frame = jnp.where(pm & in_cell, 255.0, frame)
        return jnp.where(rows < 15, 10.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.75, gray * 0.75])


class MrDoEnv(ArcadeEnv):
    GAME_CLS = MrDoGame
