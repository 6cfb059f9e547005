"""Arcade wave 6: DemonAttack, Gopher, ChopperCommand, IceHockey,
FishingDerby, Amidar.

Behavioral reference: the corresponding ALE games registered by
``envpool/atari/registration.py:21-35``; faithful-behavior cores under
``XxxLite-v5`` ids as in waves 1-5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame
from .wave3_games import _freeze_when, _grids


# ---------------------------------------------------------------------------
# DemonAttack: demons hover in ranks and split when hit; divers bomb.
# ---------------------------------------------------------------------------

_DA_N = 6


class DemonAttackGame(ArcadeGame):
    action_set_size = 6  # NOOP FIRE RIGHT LEFT RIGHTFIRE LEFTFIRE
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "px": jnp.float32(RAW_W / 2),
            "dx": jax.random.uniform(
                k1, (_DA_N,), jnp.float32, 15.0, RAW_W - 15.0
            ),
            "dy": 35.0 + 16.0 * (
                jnp.arange(_DA_N, dtype=jnp.float32) % 3
            ),
            "ddir": jnp.where(
                jax.random.uniform(k2, (_DA_N,)) < 0.5, -1.0, 1.0
            ),
            "alive": jnp.ones((_DA_N,), bool),
            "small": jnp.zeros((_DA_N,), bool),   # split halves
            "dive": jnp.full((_DA_N,), -1.0),
            "fire_cool": jnp.int32(0),
            "wave": jnp.int32(1),
            "lives": jnp.int32(4),
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
            g["px"] + 2.4 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            10.0, RAW_W - 10.0,
        )
        spd = 1.0 + 0.2 * g["wave"].astype(jnp.float32)
        dx = g["dx"] + g["ddir"] * spd
        ddir = jnp.where((dx < 12) | (dx > RAW_W - 12), -g["ddir"],
                         g["ddir"])
        # Dives toward the player.
        k1, k2 = jax.random.split(key)
        start = (
            (g["dive"] < 0) & g["alive"]
            & (jax.random.uniform(k1, (_DA_N,)) < 0.008)
        )
        dive = jnp.where(start, 0.0, g["dive"])
        diving = dive >= 0
        dy = g["dy"] + jnp.where(diving, 2.6, 0.0)
        dx = dx + jnp.where(diving, jnp.clip(px - dx, -1.6, 1.6), 0.0)
        off = dy > 200.0
        dy = jnp.where(off, 35.0 + (dy % 40.0), dy)
        dive = jnp.where(off, -1.0, dive + diving)
        # Shot: nearest demon in the column; big demons split in two.
        can_f = fire & (g["fire_cool"] == 0)
        in_col = g["alive"] & (jnp.abs(dx - px) < 7.0)
        tgt = jnp.argmax(in_col * dy)
        hit = can_f & jnp.any(in_col)
        was_small = g["small"][tgt]
        reward = jnp.where(hit, jnp.where(was_small, 30.0, 10.0), 0.0)
        # Split: a big demon becomes two smalls (mark both halves small;
        # the "second half" respawns in-place as a small).
        alive = g["alive"] & ~((jnp.arange(_DA_N) == tgt) & hit & was_small)
        small = g["small"] | ((jnp.arange(_DA_N) == tgt) & hit)
        # Collision with a diving demon.
        rammed = jnp.any(
            alive & diving & (jnp.abs(dx - px) < 8.0)
            & (jnp.abs(dy - 185.0) < 8.0)
        )
        # Wave clear.
        clear = ~jnp.any(alive)
        reward = reward + jnp.where(clear, 100.0, 0.0)
        alive = alive | clear
        small = jnp.where(clear, jnp.zeros_like(small), small)
        dx = jnp.where(
            clear,
            jax.random.uniform(k2, (_DA_N,), jnp.float32, 15.0,
                               RAW_W - 15.0),
            dx,
        )
        g2 = {
            "px": px, "dx": dx, "dy": dy, "ddir": ddir,
            "alive": alive, "small": small,
            "dive": jnp.where(clear, -jnp.ones(_DA_N), dive),
            "fire_cool": jnp.where(
                can_f, 5, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "wave": g["wave"] + clear.astype(jnp.int32),
            "lives": g["lives"] - rammed.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 12.0, jnp.float32)
        for i in range(_DA_N):
            w = jnp.where(g["small"][i], 4.0, 8.0)
            d = (
                g["alive"][i]
                & (jnp.abs(rows - g["dy"][i]) < 4)
                & (jnp.abs(cols - g["dx"][i]) < w)
            )
            frame = jnp.where(d, 200.0, frame)
        pl = (jnp.abs(rows - 185.0) < 5) & (jnp.abs(cols - g["px"]) < 6)
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.5, gray * 0.8])


class DemonAttackEnv(ArcadeEnv):
    GAME_CLS = DemonAttackGame


# ---------------------------------------------------------------------------
# Gopher: fill the gopher's tunnels, bonk it when it surfaces; 3 carrots.
# ---------------------------------------------------------------------------

_GO_COLS = 8   # tunnel columns


class GopherGame(ArcadeGame):
    action_set_size = 8  # NOOP FIRE(bonk/fill) RIGHT LEFT UPFIRE RF LF UP
    has_fire = True

    def init(self, key):
        return {
            "px": jnp.float32(RAW_W / 2),
            "depth": jnp.zeros((_GO_COLS,)),     # tunnel progress 0..3
            "g_col": jnp.int32(0),
            "g_up": jnp.bool_(False),            # gopher surfaced
            "carrots": jnp.asarray([True, True, True]),
            "bonk_cool": jnp.int32(0),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return jnp.sum(g["carrots"]).astype(jnp.int32)

    def over(self, g):
        return ~jnp.any(g["carrots"])

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 4)
        right = (action == 2) | (action == 5)
        left = (action == 3) | (action == 6)
        px = jnp.clip(
            g["px"] + 3.0 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            10.0, RAW_W - 10.0,
        )
        colw = RAW_W / _GO_COLS
        pcol = jnp.clip((px / colw).astype(jnp.int32), 0, _GO_COLS - 1)
        k1, k2, k3 = jax.random.split(key, 3)
        # Gopher digs its column deeper; at depth 3 it surfaces to grab a
        # carrot; sometimes it relocates.
        depth = g["depth"]
        digging = ~g["g_up"]
        depth = depth.at[g["g_col"]].add(jnp.where(digging, 0.04, 0.0))
        surfaced = depth[g["g_col"]] >= 3.0
        g_up = g["g_up"] | surfaced
        steal = g_up & (jax.random.uniform(k1, ()) < 0.02)
        first_c = jnp.argmax(g["carrots"])
        carrots = jnp.where(
            steal, g["carrots"].at[first_c].set(False), g["carrots"]
        )
        relocate = (~g_up) & (jax.random.uniform(k2, ()) < 0.01)
        g_col = jnp.where(
            relocate, jax.random.randint(k3, (), 0, _GO_COLS), g["g_col"]
        )
        # Player: fill the tunnel in own column / bonk the surfaced gopher.
        can = fire & (g["bonk_cool"] == 0)
        filling = can & (pcol == g["g_col"]) & ~g_up
        depth = depth.at[pcol].set(
            jnp.where(
                can, jnp.maximum(depth[pcol] - 1.0, 0.0), depth[pcol]
            )
        )
        bonk = can & g_up & (pcol == g["g_col"])
        reward = (
            jnp.where(filling, 20.0, 0.0) + jnp.where(bonk, 100.0, 0.0)
        )
        g_up = g_up & ~bonk
        depth = jnp.where(
            bonk, depth.at[g["g_col"]].set(0.0), depth
        )
        g2 = {
            "px": px, "depth": depth, "g_col": g_col, "g_up": g_up,
            "carrots": carrots,
            "bonk_cool": jnp.where(
                can, 4, jnp.maximum(g["bonk_cool"] - 1, 0)
            ),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        ground = 140.0
        frame = jnp.where(rows < ground, 120.0, 80.0)  # sky / dirt
        colw = RAW_W / _GO_COLS
        # per-pixel-column depth via repeat (no [H,W]-index gather —
        # TPU dynamic-slice pathology)
        depth_cols = jnp.repeat(g["depth"], RAW_W // _GO_COLS)
        tunnel = (
            (rows > ground)
            & (rows < ground + depth_cols[None, :] * 18.0)
            & (jnp.mod(cols, colw) > 4)
        )
        frame = jnp.where(tunnel, 30.0, frame)
        for c in range(3):
            cx = 40.0 + c * 40.0
            car = (
                g["carrots"][c]
                & (rows > ground - 14) & (rows < ground)
                & (jnp.abs(cols - cx) < 4)
            )
            frame = jnp.where(car, 200.0, frame)
        gx = (g["g_col"].astype(jnp.float32) + 0.5) * colw
        gy = jnp.where(g["g_up"], ground - 8.0, ground + 20.0)
        go = (jnp.abs(rows - gy) < 6) & (jnp.abs(cols - gx) < 6)
        frame = jnp.where(go, 170.0, frame)
        pl = (jnp.abs(rows - (ground - 10)) < 8) & (
            jnp.abs(cols - g["px"]) < 4
        )
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.8, gray, gray * 0.5])


class GopherEnv(ArcadeEnv):
    GAME_CLS = GopherGame


# ---------------------------------------------------------------------------
# ChopperCommand: defend the convoy; enemy jets strafe the trucks.
# ---------------------------------------------------------------------------

_CH_J = 4   # jets
_CH_T = 4   # trucks


class ChopperCommandGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "px": jnp.float32(RAW_W / 2), "py": jnp.float32(90.0),
            "jx": jax.random.uniform(
                k1, (_CH_J,), jnp.float32, 0.0, RAW_W
            ),
            "jy": 50.0 + 25.0 * jnp.arange(_CH_J, dtype=jnp.float32) % 75,
            "jdir": jnp.where(
                jax.random.uniform(k2, (_CH_J,)) < 0.5, -1.0, 1.0
            ),
            "j_alive": jnp.ones((_CH_J,), bool),
            "trucks": jnp.ones((_CH_T,), bool),
            "fire_cool": jnp.int32(0),
            "lives": jnp.int32(3),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return (g["lives"] <= 0) | ~jnp.any(g["trucks"])

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 10)
        up = (action == 2) | (action == 6) | (action == 7)
        down = (action == 5) | (action == 8) | (action == 9)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        px = jnp.clip(
            g["px"] + 2.8 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            8.0, RAW_W - 8.0,
        )
        py = jnp.clip(
            g["py"] + 2.2 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            30.0, 150.0,
        )
        jx = jnp.mod(g["jx"] + g["jdir"] * 2.2, jnp.float32(RAW_W))
        # Shot: horizontal hitscan at the chopper's row, facing by jdir of
        # the last lateral input (simplify: hits nearest jet on the row).
        can_f = fire & (g["fire_cool"] == 0)
        on_row = g["j_alive"] & (jnp.abs(g["jy"] - py) < 8.0)
        dxs = jnp.abs(jx - px)
        tgt = jnp.argmin(jnp.where(on_row, dxs, 1e9))
        hit = can_f & jnp.any(on_row)
        j_alive = g["j_alive"] & ~((jnp.arange(_CH_J) == tgt) & hit)
        reward = jnp.where(hit, 100.0, 0.0)
        # Jets bomb trucks when overhead; collide with the chopper.
        k1, k2 = jax.random.split(key)
        truck_x = 20.0 + 35.0 * jnp.arange(_CH_T, dtype=jnp.float32)
        over_truck = (
            j_alive[:, None]
            & (jnp.abs(jx[:, None] - truck_x[None, :]) < 6.0)
        )
        bombed = jnp.any(over_truck, 0) & (
            jax.random.uniform(k1, (_CH_T,)) < 0.02
        )
        trucks = g["trucks"] & ~bombed
        crashed = jnp.any(
            j_alive & (jnp.abs(jx - px) < 8.0) & (jnp.abs(g["jy"] - py) < 7.0)
        )
        # Respawn downed jets.
        dead = ~j_alive
        jx = jnp.where(
            dead, jax.random.uniform(k2, (_CH_J,), jnp.float32, 0, RAW_W),
            jx,
        )
        g2 = {
            "px": px, "py": py, "jx": jx, "jy": g["jy"],
            "jdir": g["jdir"], "j_alive": j_alive | dead,
            "trucks": trucks,
            "fire_cool": jnp.where(
                can_f, 4, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "lives": g["lives"] - crashed.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.where(rows < 160.0, 90.0, 130.0)  # sky / desert
        truck_x = 20.0 + 35.0 * jnp.arange(_CH_T, dtype=jnp.float32)
        for t in range(_CH_T):
            tr = (
                g["trucks"][t]
                & (jnp.abs(rows - 170.0) < 5)
                & (jnp.abs(cols - truck_x[t]) < 8)
            )
            frame = jnp.where(tr, 60.0, frame)
        for j in range(_CH_J):
            jet = (
                g["j_alive"][j]
                & (jnp.abs(rows - g["jy"][j]) < 4)
                & (jnp.abs(cols - g["jx"][j]) < 8)
            )
            frame = jnp.where(jet, 40.0, frame)
        pl = (jnp.abs(rows - g["py"]) < 5) & (jnp.abs(cols - g["px"]) < 9)
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.8, gray * 0.55])


class ChopperCommandEnv(ArcadeEnv):
    GAME_CLS = ChopperCommandGame


# ---------------------------------------------------------------------------
# IceHockey: 2v2; skate, steal, shoot at the top goal; defend the bottom.
# ---------------------------------------------------------------------------


class IceHockeyGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "px": jnp.float32(80.0), "py": jnp.float32(140.0),
            "bx": jnp.float32(80.0), "by": jnp.float32(105.0),
            "bvx": jnp.float32(0.0), "bvy": jnp.float32(0.0),
            "o1": jnp.asarray([60.0, 80.0]),
            "o2": jnp.asarray([100.0, 60.0]),
            "my_goals": jnp.int32(0), "their_goals": jnp.int32(0),
            "t": jnp.int32(0),
            "score": jnp.int32(0),
        }

    def over(self, g):
        return g["t"] >= 6000  # three 1-minute periods at 30fps-ish

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
            14.0, RAW_W - 14.0,
        )
        py = jnp.clip(
            g["py"] + 2.0 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            35.0, 185.0,
        )
        # Puck physics with rink-wall bounces and friction.
        bx = g["bx"] + g["bvx"]
        by = g["by"] + g["bvy"]
        bvx = jnp.where((bx < 14) | (bx > RAW_W - 14), -g["bvx"], g["bvx"])
        bvy = jnp.where((by < 32) | (by > 188), -g["bvy"], g["bvy"])
        bx = jnp.clip(bx, 14.0, RAW_W - 14.0)
        by = jnp.clip(by, 32.0, 188.0)
        bvx = bvx * 0.97
        bvy = bvy * 0.97
        # Possession: touching the puck; fire shoots it at the top goal.
        have = (jnp.abs(bx - px) < 7.0) & (jnp.abs(by - py) < 8.0)
        goal = jnp.asarray([RAW_W / 2, 32.0])
        shoot = have & fire
        dir_ = goal - jnp.stack([bx, by])
        nrm = jnp.linalg.norm(dir_) + 1e-6
        bvx = jnp.where(shoot, dir_[0] / nrm * 4.2, bvx)
        bvy = jnp.where(shoot, dir_[1] / nrm * 4.2, bvy)
        # carry the puck while skating (no shot)
        bx = jnp.where(have & ~shoot, px, bx)
        by = jnp.where(have & ~shoot, py - 8.0, by)
        # Opponents: one chases the puck, one guards their goal.
        o1 = g["o1"] + jnp.clip(jnp.stack([bx, by]) - g["o1"], -1.8, 1.8)
        guard = jnp.asarray([RAW_W / 2, 45.0])
        o2 = g["o2"] + jnp.clip(
            jnp.stack([bx, guard[1]]) - g["o2"], -1.5, 1.5
        )
        k1, k2 = jax.random.split(key)
        o_have = (jnp.abs(bx - o1[0]) < 6.0) & (jnp.abs(by - o1[1]) < 7.0)
        # Opponent clears toward OUR goal (bottom).
        my_goal = jnp.asarray([RAW_W / 2, 188.0])
        odir = my_goal - jnp.stack([bx, by])
        onrm = jnp.linalg.norm(odir) + 1e-6
        o_shoot = o_have & (jax.random.uniform(k1, ()) < 0.1)
        bvx = jnp.where(o_shoot, odir[0] / onrm * 3.8, bvx)
        bvy = jnp.where(o_shoot, odir[1] / onrm * 3.8, bvy)
        # Goals: puck crossing a goal mouth.
        in_mouth = jnp.abs(bx - RAW_W / 2) < 12.0
        i_score = (by <= 33.0) & in_mouth
        they_score = (by >= 187.0) & in_mouth & (jnp.abs(bvy) > 0.5)
        reward = (
            i_score.astype(jnp.float32) - they_score.astype(jnp.float32)
        )
        reset = i_score | they_score
        bx = jnp.where(reset, RAW_W / 2, bx)
        by = jnp.where(reset, 105.0, by)
        bvx = jnp.where(reset, 0.0, bvx)
        bvy = jnp.where(reset, 0.0, bvy)
        g2 = {
            "px": px, "py": py, "bx": bx, "by": by,
            "bvx": bvx, "bvy": bvy, "o1": o1, "o2": o2,
            "my_goals": g["my_goals"] + i_score.astype(jnp.int32),
            "their_goals": g["their_goals"] + they_score.astype(jnp.int32),
            "t": g["t"] + 1,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        rink = (rows > 30) & (rows < 190) & (cols > 12) & (
            cols < RAW_W - 12
        )
        frame = jnp.where(rink, 190.0, 60.0)
        for gy in (32.0, 188.0):
            mouth = (jnp.abs(rows - gy) < 3) & (
                jnp.abs(cols - RAW_W / 2) < 12
            )
            frame = jnp.where(mouth, 90.0, frame)
        for p, lum in ((g["o1"], 70.0), (g["o2"], 70.0)):
            m = (jnp.abs(rows - p[1]) < 7) & (jnp.abs(cols - p[0]) < 4)
            frame = jnp.where(m, lum, frame)
        pl = (jnp.abs(rows - g["py"]) < 7) & (jnp.abs(cols - g["px"]) < 4)
        frame = jnp.where(pl, 20.0, frame)
        puck = ((cols - g["bx"]) ** 2 + (rows - g["by"]) ** 2) < 5.0
        return jnp.where(puck, 0.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.85, gray * 0.9, gray])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[62].set(g["my_goals"].astype(jnp.uint8))
        ram = ram.at[63].set(g["their_goals"].astype(jnp.uint8))
        return ram


class IceHockeyEnv(ArcadeEnv):
    GAME_CLS = IceHockeyGame


# ---------------------------------------------------------------------------
# FishingDerby: reel fish from six depths before the rival; the shark
# steals hooked fish near the surface.
# ---------------------------------------------------------------------------

_FD_ROWS = 6


class FishingDerbyGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1 = key
        return {
            "hook_x": jnp.float32(55.0), "hook_y": jnp.float32(100.0),
            "hooked": jnp.int32(-1),
            "fish_x": jax.random.uniform(
                k1, (_FD_ROWS,), jnp.float32, 30.0, RAW_W - 30.0
            ),
            "fish_dir": jnp.where(
                jnp.arange(_FD_ROWS) % 2 == 0, 1.0, -1.0
            ),
            "shark_x": jnp.float32(80.0),
            "my_pts": jnp.int32(0), "riv_pts": jnp.int32(0),
            "riv_t": jnp.float32(0.0),
            "score": jnp.int32(0),
        }

    def over(self, g):
        return (g["my_pts"] >= 99) | (g["riv_pts"] >= 99)

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 10)   # reel faster
        up = (action == 2) | (action == 6) | (action == 7)
        down = (action == 5) | (action == 8) | (action == 9)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        hx = jnp.clip(
            g["hook_x"] + 1.8 * (right.astype(jnp.float32)
                                 - left.astype(jnp.float32)),
            20.0, RAW_W / 2,
        )
        reel = 1.2 + 1.3 * fire.astype(jnp.float32)
        hy = jnp.clip(
            g["hook_y"]
            + 1.5 * (down.astype(jnp.float32) - up.astype(jnp.float32))
            - jnp.where(g["hooked"] >= 0, reel, 0.0),
            62.0, 190.0,
        )
        row_y = 80.0 + 20.0 * jnp.arange(_FD_ROWS, dtype=jnp.float32)
        fx = g["fish_x"] + g["fish_dir"] * (
            0.8 + 0.1 * jnp.arange(_FD_ROWS, dtype=jnp.float32)
        )
        fdir = jnp.where(
            (fx < 15) | (fx > RAW_W - 15), -g["fish_dir"], g["fish_dir"]
        )
        fx = jnp.clip(fx, 15.0, RAW_W - 15.0)
        # Hook a fish when touching its row.
        can_hook = g["hooked"] < 0
        near = (jnp.abs(fx - hx) < 6.0) & (jnp.abs(row_y - hy) < 6.0)
        new_hook = can_hook & jnp.any(near)
        hooked = jnp.where(new_hook, jnp.argmax(near), g["hooked"])
        # A hooked fish rides the hook.
        fx = jnp.where(
            (jnp.arange(_FD_ROWS) == hooked) & (hooked >= 0), hx, fx
        )
        # Shark patrols near the surface; eats the catch passing its x.
        k1, k2 = jax.random.split(key)
        sx = g["shark_x"] + jnp.clip(hx - g["shark_x"], -1.4, 1.4)
        eaten = (
            (hooked >= 0) & (hy < 75.0) & (jnp.abs(sx - hx) < 9.0)
        )
        landed = (hooked >= 0) & (hy <= 62.5) & ~eaten
        pts = jnp.where(
            landed, (hooked + 1).astype(jnp.float32), 0.0
        )  # deeper = more
        reward = pts - 0.0
        # The rival fisherman scores steadily.
        riv_t = g["riv_t"] + 1.0
        riv_scores = riv_t >= 110.0
        riv_t = jnp.where(riv_scores, 0.0, riv_t)
        reward = reward - 2.0 * riv_scores.astype(jnp.float32)
        done_hook = landed | eaten
        hooked = jnp.where(done_hook, -1, hooked)
        fx = jnp.where(
            done_hook & (jnp.arange(_FD_ROWS) == g["hooked"]),
            jax.random.uniform(k2, (_FD_ROWS,), jnp.float32, 30.0,
                               RAW_W - 30.0),
            fx,
        )
        hy = jnp.where(done_hook, 100.0, hy)
        g2 = {
            "hook_x": hx, "hook_y": hy, "hooked": hooked.astype(jnp.int32),
            "fish_x": fx, "fish_dir": fdir, "shark_x": sx,
            "my_pts": g["my_pts"] + pts.astype(jnp.int32),
            "riv_pts": g["riv_pts"] + 2 * riv_scores.astype(jnp.int32),
            "riv_t": riv_t,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.where(rows < 60.0, 150.0, 75.0)  # docks / water
        line = (
            (rows > 55.0) & (rows < g["hook_y"])
            & (jnp.abs(cols - g["hook_x"]) < 1.0)
        )
        frame = jnp.where(line, 220.0, frame)
        row_y = 80.0 + 20.0 * jnp.arange(_FD_ROWS, dtype=jnp.float32)
        for i in range(_FD_ROWS):
            f = (
                (jnp.abs(rows - row_y[i]) < 3)
                & (jnp.abs(cols - g["fish_x"][i]) < 5)
            )
            frame = jnp.where(f, 180.0, frame)
        sh = (jnp.abs(rows - 68.0) < 4) & (
            jnp.abs(cols - g["shark_x"]) < 10
        )
        frame = jnp.where(sh, 40.0, frame)
        hook = ((cols - g["hook_x"]) ** 2 + (rows - g["hook_y"]) ** 2) < 4.0
        return jnp.where(hook, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.5, gray * 0.75, gray])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[61].set(g["my_pts"].astype(jnp.uint8))
        ram = ram.at[62].set(g["riv_pts"].astype(jnp.uint8))
        return ram


class FishingDerbyEnv(ArcadeEnv):
    GAME_CLS = FishingDerbyGame


# ---------------------------------------------------------------------------
# Amidar: paint the lattice edges; chasers patrol; corners flip pursuit.
# ---------------------------------------------------------------------------

_AM_N = 6   # lattice nodes per side
_AM_E = 5   # chasers


class AmidarGame(ArcadeGame):
    action_set_size = 10
    has_fire = True

    def init(self, key):
        k1 = key
        return {
            # player starts bottom-left; chasers enter from the top row
            "pr": jnp.int32(_AM_N - 1), "pc": jnp.int32(0),
            "h_done": jnp.zeros((_AM_N, _AM_N - 1), bool),
            "v_done": jnp.zeros((_AM_N - 1, _AM_N), bool),
            "er": jnp.zeros((_AM_E,), jnp.int32),
            "ec": jax.random.randint(k1, (_AM_E,), 0, _AM_N),
            "jump": jnp.int32(3),        # escape jumps left
            "jump_t": jnp.float32(0.0),
            "move_cool": jnp.int32(0),
            "lives": jnp.int32(3),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 6)   # jump (escape)
        up = (action == 2) | (action == 6)
        right = (action == 3) | (action == 7)
        left = (action == 4) | (action == 8)
        down = (action == 5) | (action == 9)
        can = g["move_cool"] == 0
        dr = (down.astype(jnp.int32) - up.astype(jnp.int32)) * can
        dc = (right.astype(jnp.int32) - left.astype(jnp.int32)) * can
        nr = jnp.clip(g["pr"] + dr, 0, _AM_N - 1)
        nc = jnp.clip(g["pc"] + dc, 0, _AM_N - 1)
        # Paint the traversed edge.
        h_done = g["h_done"]
        v_done = g["v_done"]
        moved_h = (nr == g["pr"]) & (nc != g["pc"])
        moved_v = (nc == g["pc"]) & (nr != g["pr"])
        he_c = jnp.minimum(nc, g["pc"])
        ve_r = jnp.minimum(nr, g["pr"])
        fresh_h = moved_h & ~h_done[nr, he_c]
        fresh_v = moved_v & ~v_done[ve_r, nc]
        h_done = h_done.at[nr, he_c].set(h_done[nr, he_c] | moved_h)
        v_done = v_done.at[ve_r, nc].set(v_done[ve_r, nc] | moved_v)
        reward = jnp.where(fresh_h | fresh_v, 1.0, 0.0)
        # Board clear bonus.
        clear = jnp.all(h_done) & jnp.all(v_done)
        reward = reward + jnp.where(clear, 100.0, 0.0)
        h_done = jnp.where(clear, jnp.zeros_like(h_done), h_done)
        v_done = jnp.where(clear, jnp.zeros_like(v_done), v_done)
        # Chasers: Amidar movement — mostly along their column, random
        # lateral turns at nodes.
        k1, k2 = jax.random.split(key)
        turn = jax.random.uniform(k1, (_AM_E,)) < 0.25
        step_r = jnp.where(
            turn, 0, jnp.where(jnp.arange(_AM_E) % 2 == 0, 1, -1)
        )
        step_c = jnp.where(
            turn, jax.random.randint(k2, (_AM_E,), -1, 2), 0
        )
        er = jnp.clip(g["er"] + step_r * can, 0, _AM_N - 1)
        ec = jnp.clip(g["ec"] + step_c * can, 0, _AM_N - 1)
        jump_t = jnp.maximum(g["jump_t"] - 1.0, 0.0)
        jumping = fire & (g["jump"] > 0) & (jump_t <= 0)
        jump_t = jnp.where(jumping, 12.0, jump_t)
        caught = jnp.any(
            (er == nr) & (ec == nc)
        ) & (jump_t <= 0)
        lives = g["lives"] - caught.astype(jnp.int32)
        nr = jnp.where(caught, _AM_N - 1, nr)
        nc = jnp.where(caught, 0, nc)
        g2 = {
            "pr": nr, "pc": nc, "h_done": h_done, "v_done": v_done,
            "er": er, "ec": ec,
            "jump": g["jump"] - jumping.astype(jnp.int32),
            "jump_t": jump_t,
            "move_cool": jnp.where(can, 2, g["move_cool"] - 1),
            "lives": lives,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def _xy(self, r, c):
        return 20.0 + c * 24.0, 30.0 + r * 30.0

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 25.0, jnp.float32)
        # lattice edges (dim = unpainted, bright = painted)
        for r in range(_AM_N):
            for c in range(_AM_N - 1):
                x0, y0 = self._xy(r, c)
                e = (jnp.abs(rows - y0) < 1.5) & (cols > x0) & (
                    cols < x0 + 24.0
                )
                lum = jnp.where(g["h_done"][r, c], 220.0, 90.0)
                frame = jnp.where(e, lum, frame)
        for r in range(_AM_N - 1):
            for c in range(_AM_N):
                x0, y0 = self._xy(r, c)
                e = (jnp.abs(cols - x0) < 1.5) & (rows > y0) & (
                    rows < y0 + 30.0
                )
                lum = jnp.where(g["v_done"][r, c], 220.0, 90.0)
                frame = jnp.where(e, lum, frame)
        for i in range(_AM_E):
            x, y = self._xy(g["er"][i], g["ec"][i])
            en = ((cols - x) ** 2 + (rows - y) ** 2) < 18.0
            frame = jnp.where(en, 150.0, frame)
        x, y = self._xy(g["pr"], g["pc"])
        pl = ((cols - x) ** 2 + (rows - y) ** 2) < 18.0
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.85, gray * 0.4])


class AmidarEnv(ArcadeEnv):
    GAME_CLS = AmidarGame
