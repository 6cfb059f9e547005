"""Arcade wave 9: Centipede, MontezumaRevenge, Hero, Gravitar, Pooyan,
Carnival.

Behavioral reference: the corresponding ALE games registered by
``envpool/atari/registration.py:21-35``; faithful-behavior cores under
``XxxLite-v5`` ids as in waves 1-8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame
from .wave3_games import _freeze_when, _grids


# ---------------------------------------------------------------------------
# Centipede: the segment chain descends through mushrooms; shoot it apart.
# ---------------------------------------------------------------------------

_CP_SEG = 8
_CP_COLS = 16
_CP_ROWS = 10   # mushroom field rows


class CentipedeGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        mush = jax.random.uniform(key, (_CP_ROWS, _CP_COLS)) < 0.15
        return {
            "px": jnp.float32(RAW_W / 2),
            "seg_col": jnp.arange(_CP_SEG, dtype=jnp.float32),
            "seg_row": jnp.zeros((_CP_SEG,)),
            "seg_dir": jnp.ones((_CP_SEG,)),
            "seg_alive": jnp.ones((_CP_SEG,), bool),
            "mush": mush,
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
        fire = (action == 1) | (action >= 10)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        px = jnp.clip(
            g["px"] + 2.6 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            8.0, RAW_W - 8.0,
        )
        colw = RAW_W / _CP_COLS
        # Segments march laterally; at walls or mushrooms they drop a row
        # and reverse.
        spd = (0.12 + 0.03 * g["wave"].astype(jnp.float32))
        ncol = g["seg_col"] + g["seg_dir"] * spd
        icol = jnp.clip(ncol.astype(jnp.int32), 0, _CP_COLS - 1)
        irow = jnp.clip(g["seg_row"].astype(jnp.int32), 0, _CP_ROWS - 1)
        # one-hot mushroom lookup (no vector-index gather on TPU)
        ohr = jax.nn.one_hot(irow, _CP_ROWS)
        ohc = jax.nn.one_hot(icol, _CP_COLS)
        on_mush = jnp.einsum(
            "sh,hw,sw->s", ohr, g["mush"].astype(jnp.float32), ohc
        ) > 0.5
        at_wall = (ncol < 0.0) | (ncol > _CP_COLS - 1.0)
        turn = at_wall | on_mush
        seg_dir = jnp.where(turn, -g["seg_dir"], g["seg_dir"])
        seg_row = g["seg_row"] + jnp.where(turn, 1.0, 0.0)
        seg_col = jnp.clip(ncol, 0.0, _CP_COLS - 1.0)
        # Wrap from the bottom back to the top (player zone pressure).
        seg_row = jnp.where(seg_row >= _CP_ROWS, 0.0, seg_row)
        # Shot: nearest segment in the player's column; leaves a mushroom.
        can_f = fire & (g["fire_cool"] == 0)
        seg_x = (seg_col + 0.5) * colw
        in_col = g["seg_alive"] & (jnp.abs(seg_x - px) < 6.0)
        tgt = jnp.argmax(in_col * (seg_row + 1.0))
        hit = can_f & jnp.any(in_col)
        seg_alive = g["seg_alive"] & ~((jnp.arange(_CP_SEG) == tgt) & hit)
        reward = jnp.where(hit, 10.0, 0.0)
        mush = g["mush"]
        hit_r = jnp.clip(seg_row[tgt].astype(jnp.int32), 0, _CP_ROWS - 1)
        hit_c = jnp.clip(seg_col[tgt].astype(jnp.int32), 0, _CP_COLS - 1)
        mush = jnp.where(
            hit, mush.at[hit_r, hit_c].set(True), mush
        )
        # Segment reaching the player band stings.
        seg_y = 30.0 + seg_row * 14.0
        stung = jnp.any(
            seg_alive & (seg_y > 180.0) & (jnp.abs(seg_x - px) < 8.0)
        )
        # Wave clear.
        clear = ~jnp.any(seg_alive)
        reward = reward + jnp.where(clear, 100.0, 0.0)
        seg_alive = seg_alive | clear
        seg_row = jnp.where(clear, jnp.zeros_like(seg_row), seg_row)
        seg_col = jnp.where(
            clear, jnp.arange(_CP_SEG, dtype=jnp.float32), seg_col
        )
        g2 = {
            "px": px, "seg_col": seg_col, "seg_row": seg_row,
            "seg_dir": seg_dir, "seg_alive": seg_alive, "mush": mush,
            "fire_cool": jnp.where(
                can_f, 3, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "wave": g["wave"] + clear.astype(jnp.int32),
            "lives": g["lives"] - stung.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 20.0, jnp.float32)
        colw = RAW_W / _CP_COLS
        # mushrooms via constant one-hot upsample
        ohr = jnp.asarray(np.eye(_CP_ROWS, dtype=np.float32)[
            np.clip(((np.arange(RAW_H) - 30.0) / 14.0).astype(int), 0,
                    _CP_ROWS - 1)
        ])
        ohc = jnp.asarray(np.eye(_CP_COLS, dtype=np.float32)[
            np.clip((np.arange(RAW_W) / colw).astype(int), 0,
                    _CP_COLS - 1)
        ])
        mush_img = ohr @ g["mush"].astype(jnp.float32) @ ohc.T
        band = (rows > 30.0) & (rows < 30.0 + _CP_ROWS * 14.0)
        blob = (jnp.mod(rows, 14.0) < 7.0) & (jnp.mod(cols, colw) > 3.0)
        frame = jnp.where(band & blob & (mush_img > 0.5), 110.0, frame)
        for i in range(_CP_SEG):
            sx = (g["seg_col"][i] + 0.5) * colw
            sy = 30.0 + g["seg_row"][i] * 14.0
            seg = (
                g["seg_alive"][i]
                & (((cols - sx) ** 2 + (rows - sy) ** 2) < 22.0)
            )
            frame = jnp.where(seg, 200.0, frame)
        pl = (jnp.abs(rows - 195.0) < 6) & (jnp.abs(cols - g["px"]) < 4)
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.7, gray, gray * 0.6])


class CentipedeEnv(ArcadeEnv):
    GAME_CLS = CentipedeGame


# ---------------------------------------------------------------------------
# Montezuma's Revenge: first room — ladders, a rolling skull, the key
# and the door (the canonical hard-exploration layout).
# ---------------------------------------------------------------------------


class MontezumaRevengeGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "px": jnp.float32(RAW_W / 2), "py": jnp.float32(50.0),
            "jump": jnp.float32(0.0),
            "on_ladder": jnp.bool_(False),
            "skull_x": jnp.float32(60.0), "skull_dir": jnp.float32(1.0),
            "has_key": jnp.bool_(False),
            "key_there": jnp.bool_(True),
            "door_open": jnp.bool_(False),
            "room": jnp.int32(1),
            "lives": jnp.int32(6),
            "score": jnp.int32(0),
        }

    # Platform rows (y) and ladder x positions of the first room.
    _PLAT = (50.0, 105.0, 160.0)
    _LADDERS = ((110.0, 50.0, 105.0), (40.0, 105.0, 160.0),
                (110.0, 105.0, 160.0))
    _KEY_POS = (15.0, 160.0)
    _DOOR_X = RAW_W - 12.0

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire_jump = (action == 1) | (action >= 10)
        up = (action == 2) | (action == 6) | (action == 7)
        down = (action == 5) | (action == 8) | (action == 9)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        px = jnp.clip(
            g["px"] + 2.2 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            8.0, RAW_W - 8.0,
        )
        plats = jnp.asarray(self._PLAT)
        # Which platform row are we on (nearest below)?
        on_row = jnp.argmin(jnp.abs(plats - g["py"]))
        # Ladders: climb when aligned.
        at_ladder = jnp.bool_(False)
        dy = 0.0
        py = g["py"]
        for lx, y_top, y_bot in self._LADDERS:
            aligned = (
                (jnp.abs(px - lx) < 6.0)
                & (py >= y_top - 2.0) & (py <= y_bot + 2.0)
            )
            at_ladder = at_ladder | aligned
            move = jnp.where(
                aligned,
                2.0 * (down.astype(jnp.float32) - up.astype(jnp.float32)),
                0.0,
            )
            py = jnp.clip(py + move, y_top, jnp.float32(200.0))
        # Off-ladder: snap to the platform row; small jumps.
        jump = jnp.where(
            fire_jump & (g["jump"] <= 0) & ~at_ladder, 8.0,
            jnp.maximum(g["jump"] - 1.0, 0.0),
        )
        snap = plats[on_row]
        py = jnp.where(at_ladder, py, snap)
        # Skull patrols the bottom platform.
        skull_x = g["skull_x"] + g["skull_dir"] * 1.4
        skull_dir = jnp.where(
            (skull_x < 30.0) | (skull_x > 130.0), -g["skull_dir"],
            g["skull_dir"],
        )
        hit_skull = (
            (jnp.abs(py - plats[2]) < 6.0)
            & (jnp.abs(px - skull_x) < 7.0) & (jump <= 0)
        )
        # Key pickup on the bottom-left.
        got_key = (
            g["key_there"]
            & (jnp.abs(px - self._KEY_POS[0]) < 7.0)
            & (jnp.abs(py - self._KEY_POS[1]) < 8.0)
        )
        reward = jnp.where(got_key, 100.0, 0.0)
        has_key = g["has_key"] | got_key
        key_there = g["key_there"] & ~got_key
        # Door on the top-right: opening it completes the room.
        at_door = (jnp.abs(px - self._DOOR_X) < 7.0) & (
            jnp.abs(py - plats[0]) < 6.0
        )
        opened = at_door & has_key & ~g["door_open"]
        reward = reward + jnp.where(opened, 300.0, 0.0)
        # Next room: relock everything, skull speeds up via dir magnitude.
        room_up = opened
        has_key = has_key & ~opened
        key_there = key_there | room_up
        g2 = {
            "px": jnp.where(hit_skull | room_up, RAW_W / 2, px),
            "py": jnp.where(hit_skull | room_up, plats[0], py),
            "jump": jump,
            "on_ladder": at_ladder,
            "skull_x": skull_x, "skull_dir": skull_dir,
            "has_key": has_key,
            "key_there": key_there,
            "door_open": jnp.bool_(False),
            "room": g["room"] + room_up.astype(jnp.int32),
            "lives": g["lives"] - hit_skull.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 25.0, jnp.float32)
        for y in self._PLAT:
            pf = jnp.abs(rows - (y + 8.0)) < 3.0
            frame = jnp.where(pf, 120.0, frame)
        for lx, y_top, y_bot in self._LADDERS:
            ld = (
                (jnp.abs(cols - lx) < 4.0)
                & (rows > y_top) & (rows < y_bot + 10.0)
                & (jnp.mod(rows, 6.0) < 3.0)
            )
            frame = jnp.where(ld, 90.0, frame)
        keym = (
            g["key_there"]
            & (jnp.abs(cols - self._KEY_POS[0]) < 4)
            & (jnp.abs(rows - self._KEY_POS[1]) < 5)
        )
        frame = jnp.where(keym, 230.0, frame)
        door = (jnp.abs(cols - self._DOOR_X) < 5) & (
            jnp.abs(rows - 42.0) < 12
        )
        frame = jnp.where(door, 160.0, frame)
        sk = ((cols - g["skull_x"]) ** 2 + (rows - 162.0) ** 2) < 22.0
        frame = jnp.where(sk, 200.0, frame)
        ph = g["py"] - jnp.where(g["jump"] > 0, 6.0, 0.0)
        pl = (jnp.abs(rows - ph) < 8) & (jnp.abs(cols - g["px"]) < 4)
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.75, gray * 0.5])


class MontezumaRevengeEnv(ArcadeEnv):
    GAME_CLS = MontezumaRevengeGame


# ---------------------------------------------------------------------------
# H.E.R.O.: descend the mineshaft by rotor, dynamite walls, save the
# miner, watch the power meter.
# ---------------------------------------------------------------------------

_HR_LEVELS = 4   # shaft segments per miner


class HeroGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1 = key
        return {
            "px": jnp.float32(RAW_W / 2), "py": jnp.float32(40.0),
            "depth": jnp.int32(0),        # shaft segment index
            "wall_x": jax.random.uniform(
                k1, (_HR_LEVELS,), jnp.float32, 40.0, RAW_W - 40.0
            ),
            "wall_up": jnp.ones((_HR_LEVELS,), bool),
            "power": jnp.float32(100.0),
            "dyn_t": jnp.float32(0.0),
            "lives": jnp.int32(4),
            "rescued": jnp.int32(0),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 10)   # dynamite
        up = (action == 2) | (action == 6) | (action == 7)   # rotor
        down = (action == 5) | (action == 8) | (action == 9)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        px = jnp.clip(
            g["px"] + 2.4 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            10.0, RAW_W - 10.0,
        )
        py = jnp.clip(
            g["py"]
            + 2.0 * (down.astype(jnp.float32) - up.astype(jnp.float32))
            + 0.6,                          # gravity; rotor counters it
            30.0, 190.0,
        )
        # Segment boundary at py > 170: descend if its wall is blown.
        seg = jnp.clip(g["depth"], 0, _HR_LEVELS - 1)
        wall_here = g["wall_up"][seg]
        wx = g["wall_x"][seg]
        blocked = wall_here & (py > 150.0) & (jnp.abs(px - wx) < 20.0)
        py = jnp.where(blocked, 150.0, py)
        # Dynamite: blow the wall when close.
        k1 = key
        dyn = fire & (g["dyn_t"] <= 0)
        dyn_t = jnp.where(dyn, 8.0, jnp.maximum(g["dyn_t"] - 1.0, 0.0))
        blast = dyn & wall_here & (jnp.abs(px - wx) < 26.0) & (py > 120.0)
        wall_up = jnp.where(
            blast, g["wall_up"].at[seg].set(False), g["wall_up"]
        )
        reward = jnp.where(blast, 75.0, 0.0)
        # Passing the bottom advances a segment; last segment = miner.
        descend = (py >= 189.0) & ~wall_up[seg]
        at_miner = descend & (g["depth"] >= _HR_LEVELS - 1)
        reward = reward + jnp.where(at_miner, 1000.0, 0.0)
        depth = jnp.where(
            at_miner, 0, g["depth"] + descend.astype(jnp.int32)
        )
        py = jnp.where(descend, 40.0, py)
        wall_up = jnp.where(at_miner, jnp.ones_like(wall_up), wall_up)
        wall_x = jnp.where(
            at_miner,
            jax.random.uniform(k1, (_HR_LEVELS,), jnp.float32, 40.0,
                               RAW_W - 40.0),
            g["wall_x"],
        )
        # Power drains (rotor drains faster); empty = lose a life.
        power = g["power"] - 0.1 - 0.1 * up.astype(jnp.float32)
        power = jnp.where(at_miner, 100.0, power)
        out = power <= 0.0
        g2 = {
            "px": jnp.where(out, RAW_W / 2, px),
            "py": jnp.where(out, 40.0, py),
            "depth": jnp.where(out, 0, depth),
            "wall_x": wall_x, "wall_up": wall_up,
            "power": jnp.where(out, 100.0, power),
            "dyn_t": dyn_t,
            "lives": g["lives"] - out.astype(jnp.int32),
            "rescued": g["rescued"] + at_miner.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        shaft = (cols > 20) & (cols < RAW_W - 20)
        frame = jnp.where(shaft, 40.0, 100.0)
        seg = jnp.clip(g["depth"], 0, _HR_LEVELS - 1)
        wall = (
            g["wall_up"][seg]
            & (rows > 160) & (rows < 175)
            & (jnp.abs(cols - g["wall_x"][seg]) < 20.0)
        )
        frame = jnp.where(wall, 140.0, frame)
        miner = (
            (g["depth"] >= _HR_LEVELS - 1)
            & (rows > 178) & (rows < 190)
            & (jnp.abs(cols - RAW_W / 2) < 5)
        )
        frame = jnp.where(miner, 220.0, frame)
        pl = (jnp.abs(rows - g["py"]) < 7) & (jnp.abs(cols - g["px"]) < 5)
        frame = jnp.where(pl, 250.0, frame)
        bar = (rows > RAW_H - 7) & (cols < g["power"] * (RAW_W / 100.0))
        return jnp.where(bar, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.8, gray * 0.4])


class HeroEnv(ArcadeEnv):
    GAME_CLS = HeroGame


# ---------------------------------------------------------------------------
# Gravitar: thrust-and-gravity flight; shoot bunkers, mind the fuel.
# ---------------------------------------------------------------------------

_GV_B = 3


class GravitarGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1 = key
        return {
            "px": jnp.float32(RAW_W / 2), "py": jnp.float32(60.0),
            "vx": jnp.float32(0.8), "vy": jnp.float32(0.0),
            "ang": jnp.float32(-np.pi / 2),
            "bx": jax.random.uniform(
                k1, (_GV_B,), jnp.float32, 30.0, RAW_W - 30.0
            ),
            "b_alive": jnp.ones((_GV_B,), bool),
            "fuel": jnp.float32(100.0),
            "fire_cool": jnp.int32(0),
            "lives": jnp.int32(6),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 10)
        thrust = (action == 2) | (action == 6) | (action == 7)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        ang = g["ang"] + 0.12 * (
            right.astype(jnp.float32) - left.astype(jnp.float32)
        )
        th = thrust.astype(jnp.float32) * 0.22
        vx = g["vx"] + th * jnp.cos(ang)
        vy = g["vy"] + th * jnp.sin(ang) + 0.08    # planet gravity
        vx = jnp.clip(vx, -3.0, 3.0)
        vy = jnp.clip(vy, -3.0, 3.0)
        px = jnp.mod(g["px"] + vx, jnp.float32(RAW_W))
        py = g["py"] + vy
        # Terrain: jagged floor.
        floor_y = 180.0 - 12.0 * jnp.sin(px / 23.0)
        crashed = py >= floor_y - 3.0
        ceiling = py <= 20.0
        py = jnp.clip(py, 20.0, 200.0)
        # Shot along the nose: hits a bunker in the heading half-plane.
        can_f = fire & (g["fire_cool"] == 0)
        bdx = g["bx"] - px
        bfy = (180.0 - 12.0 * jnp.sin(g["bx"] / 23.0)) - 6.0
        bdy = bfy - py
        angoff = jnp.abs(
            jnp.mod(jnp.arctan2(bdy, bdx) - ang + np.pi, 2 * np.pi) - np.pi
        )
        in_sight = g["b_alive"] & (angoff < 0.25)
        tgt = jnp.argmin(
            jnp.where(in_sight, jnp.abs(bdx) + jnp.abs(bdy), 1e9)
        )
        hit = can_f & jnp.any(in_sight)
        b_alive = g["b_alive"] & ~((jnp.arange(_GV_B) == tgt) & hit)
        reward = jnp.where(hit, 250.0, 0.0)
        # Planet clear.
        k1 = key
        clear = ~jnp.any(b_alive)
        reward = reward + jnp.where(clear, 500.0, 0.0)
        b_alive = b_alive | clear
        bx = jnp.where(
            clear,
            jax.random.uniform(k1, (_GV_B,), jnp.float32, 30.0,
                               RAW_W - 30.0),
            g["bx"],
        )
        fuel = g["fuel"] - 0.05 - 0.15 * thrust.astype(jnp.float32)
        die = crashed | (fuel <= 0.0)
        g2 = {
            "px": jnp.where(die, RAW_W / 2, px),
            "py": jnp.where(die, 60.0, py),
            "vx": jnp.where(die, 0.8, vx),
            "vy": jnp.where(die, 0.0, vy),
            "ang": ang, "bx": bx, "b_alive": b_alive,
            "fuel": jnp.where(die, 100.0, fuel),
            "fire_cool": jnp.where(
                can_f, 6, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "lives": g["lives"] - die.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        del ceiling
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 12.0, jnp.float32)
        floor_y = 180.0 - 12.0 * jnp.sin(cols / 23.0)
        terr = rows > floor_y
        frame = jnp.where(terr, 90.0, frame)
        for i in range(_GV_B):
            by = (180.0 - 12.0 * jnp.sin(g["bx"][i] / 23.0)) - 6.0
            bk = (
                g["b_alive"][i]
                & (jnp.abs(rows - by) < 5) & (jnp.abs(cols - g["bx"][i]) < 6)
            )
            frame = jnp.where(bk, 180.0, frame)
        pl = ((cols - g["px"]) ** 2 + (rows - g["py"]) ** 2) < 16.0
        frame = jnp.where(pl, 250.0, frame)
        nx = g["px"] + 7.0 * jnp.cos(g["ang"])
        ny = g["py"] + 7.0 * jnp.sin(g["ang"])
        nose = ((cols - nx) ** 2 + (rows - ny) ** 2) < 4.0
        frame = jnp.where(nose, 255.0, frame)
        bar = (rows > RAW_H - 6) & (cols < g["fuel"] * (RAW_W / 100.0))
        return jnp.where(bar, 200.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.6, gray * 0.7, gray])


class GravitarEnv(ArcadeEnv):
    GAME_CLS = GravitarGame


# ---------------------------------------------------------------------------
# Pooyan: shoot the balloon-descending wolves from the elevator basket.
# ---------------------------------------------------------------------------

_PY_N = 5


class PooyanGame(ArcadeGame):
    action_set_size = 6  # NOOP FIRE UP DOWN UPFIRE DOWNFIRE
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "py": jnp.float32(105.0),
            "wy": jax.random.uniform(
                k1, (_PY_N,), jnp.float32, -150.0, 20.0
            ),
            "wx": jax.random.uniform(
                k2, (_PY_N,), jnp.float32, 20.0, 110.0
            ),
            "w_live": jnp.ones((_PY_N,), bool),
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
        up = (action == 2) | (action == 4)
        down = (action == 3) | (action == 5)
        py = jnp.clip(
            g["py"] + 2.5 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            35.0, 185.0,
        )
        fall = 0.9 + 0.2 * g["wave"].astype(jnp.float32)
        wy = g["wy"] + jnp.where(g["w_live"], fall, 0.0)
        # Arrow: horizontal from the right-side basket; pops the nearest
        # balloon on the row.
        can_f = fire & (g["fire_cool"] == 0)
        on_row = g["w_live"] & (jnp.abs(wy - py) < 8.0)
        tgt = jnp.argmax(on_row * (RAW_W - g["wx"]))
        hit = can_f & jnp.any(on_row)
        reward = jnp.where(hit, 50.0, 0.0)
        w_live = g["w_live"] & ~((jnp.arange(_PY_N) == tgt) & hit)
        # A wolf landing climbs to the basket.
        landed = jnp.any(w_live & (wy > 190.0))
        k1, k2 = jax.random.split(key)
        gone = ~w_live | (wy > 195.0)
        wy = jnp.where(
            gone,
            jax.random.uniform(k1, (_PY_N,), jnp.float32, -150.0, -10.0),
            wy,
        )
        wx = jnp.where(
            gone, jax.random.uniform(k2, (_PY_N,), jnp.float32, 20.0,
                                     110.0),
            g["wx"],
        )
        kills_for_wave = jnp.mod(
            g["score"] + reward.astype(jnp.int32), 500
        ) < jnp.mod(g["score"], 500)
        g2 = {
            "py": py, "wy": wy, "wx": wx, "w_live": w_live | gone,
            "fire_cool": jnp.where(
                can_f, 5, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "wave": g["wave"] + kills_for_wave.astype(jnp.int32),
            "lives": g["lives"] - landed.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 70.0, jnp.float32)
        cliff = cols > RAW_W - 25
        frame = jnp.where(cliff, 110.0, frame)
        for i in range(_PY_N):
            balloon = (
                g["w_live"][i]
                & (((cols - g["wx"][i]) ** 2
                    + (rows - (g["wy"][i] - 8.0)) ** 2) < 30.0)
            )
            wolf = (
                g["w_live"][i]
                & (jnp.abs(rows - g["wy"][i]) < 5)
                & (jnp.abs(cols - g["wx"][i]) < 4)
            )
            frame = jnp.where(balloon, 200.0, frame)
            frame = jnp.where(wolf, 40.0, frame)
        basket = (
            (jnp.abs(rows - g["py"]) < 8)
            & (cols > RAW_W - 24) & (cols < RAW_W - 10)
        )
        return jnp.where(basket, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.8, gray * 0.8])


class PooyanEnv(ArcadeEnv):
    GAME_CLS = PooyanGame


# ---------------------------------------------------------------------------
# Carnival: shooting gallery — rows of targets, the ammo-eating ducks.
# ---------------------------------------------------------------------------

_CV_N = 9   # 3 rows x 3 targets


class CarnivalGame(ArcadeGame):
    action_set_size = 6  # NOOP FIRE RIGHT LEFT RIGHTFIRE LEFTFIRE
    has_fire = True

    def init(self, key):
        return {
            "px": jnp.float32(RAW_W / 2),
            "tx": jnp.tile(
                jnp.asarray([20.0, 80.0, 140.0]), 3
            ),
            "t_live": jnp.ones((_CV_N,), bool),
            "t_duck": jnp.zeros((_CV_N,), bool),   # dropped ducks
            "ty_drop": jnp.zeros((_CV_N,)),
            "ammo": jnp.float32(40.0),
            "round": jnp.int32(1),
            "fire_cool": jnp.int32(0),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return g["ammo"] <= 0.0

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action == 4) | (action == 5)
        right = (action == 2) | (action == 4)
        left = (action == 3) | (action == 5)
        px = jnp.clip(
            g["px"] + 2.8 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            10.0, RAW_W - 10.0,
        )
        # Rows scroll in alternating directions.
        row = jnp.arange(_CV_N) // 3
        dirs = jnp.where(jnp.mod(row, 2) == 0, 1.0, -1.0)
        tx = jnp.mod(g["tx"] + dirs * 1.2, jnp.float32(RAW_W))
        row_y = 40.0 + row.astype(jnp.float32) * 25.0
        # Ducks drop toward the ammo tray.
        k1, k2 = jax.random.split(key)
        start_drop = (
            g["t_live"] & (row == 0) & ~g["t_duck"]
            & (jax.random.uniform(k1, (_CV_N,)) < 0.004)
        )
        t_duck = g["t_duck"] | start_drop
        ty = jnp.where(
            t_duck, jnp.maximum(g["ty_drop"], row_y) + 2.0, g["ty_drop"]
        )
        ate = t_duck & (ty > 185.0)
        ammo = g["ammo"] - jnp.sum(ate) * 4.0
        # Shot: topmost live target in the column.
        can_f = fire & (g["fire_cool"] == 0)
        eff_y = jnp.where(t_duck, ty, row_y)
        in_col = g["t_live"] & (jnp.abs(tx - px) < 7.0)
        tgt = jnp.argmax(in_col * (200.0 - eff_y))
        hit = can_f & jnp.any(in_col)
        t_live = g["t_live"] & ~((jnp.arange(_CV_N) == tgt) & hit)
        was_duck = g["t_duck"][tgt]
        reward = jnp.where(
            hit, jnp.where(was_duck, 30.0, 15.0), 0.0
        )
        ammo = ammo - can_f.astype(jnp.float32)
        t_duck = t_duck & t_live & ~ate
        t_live = t_live & ~ate
        # Round clear: all targets down → refill.
        clear = ~jnp.any(t_live)
        reward = reward + jnp.where(clear, ammo * 10.0, 0.0)
        t_live = t_live | clear
        t_duck = jnp.where(clear, jnp.zeros_like(t_duck), t_duck)
        ty = jnp.where(clear, jnp.zeros_like(ty), ty)
        ammo = jnp.where(clear, 40.0, ammo)
        g2 = {
            "px": px, "tx": tx, "t_live": t_live, "t_duck": t_duck,
            "ty_drop": ty,
            "ammo": ammo,
            "round": g["round"] + clear.astype(jnp.int32),
            "fire_cool": jnp.where(
                can_f, 4, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 35.0, jnp.float32)
        row = jnp.arange(_CV_N) // 3
        row_y = 40.0 + row.astype(jnp.float32) * 25.0
        for i in range(_CV_N):
            y = jnp.where(g["t_duck"][i], g["ty_drop"][i], row_y[i])
            t = (
                g["t_live"][i]
                & (jnp.abs(rows - y) < 6)
                & (jnp.abs(cols - g["tx"][i]) < 6)
            )
            frame = jnp.where(
                t, jnp.where(g["t_duck"][i], 220.0, 160.0), frame
            )
        pl = (jnp.abs(rows - 190.0) < 6) & (jnp.abs(cols - g["px"]) < 5)
        frame = jnp.where(pl, 250.0, frame)
        bar = (rows > RAW_H - 6) & (cols < g["ammo"] * (RAW_W / 40.0))
        return jnp.where(bar, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.7, gray * 0.9])


class CarnivalEnv(ArcadeEnv):
    GAME_CLS = CarnivalGame
