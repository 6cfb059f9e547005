"""Arcade wave 17: Crossbow, Darkchambers, Entombed, Et, Turmoil,
Koolaid — misc-action carts of the non-57 ALE roster.

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
# Crossbow: escort the friend across the screen — your crosshair must
# shoot the vermin that dive at the walking path.
# ---------------------------------------------------------------------------

_CB_N = 3


class CrossbowGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "cx": jnp.float32(RAW_W / 2), "cy": jnp.float32(100.0),
            "fx": jnp.float32(5.0),               # friend walks right
            "vx": jax.random.uniform(k1, (_CB_N,), jnp.float32,
                                     20.0, RAW_W - 20.0),
            "vy": jax.random.uniform(k2, (_CB_N,), jnp.float32,
                                     20.0, 60.0),
            "friends": jnp.int32(3),
            "crossed": jnp.int32(0),
        }

    def lives(self, g):
        return g["friends"]

    def over(self, g):
        return g["friends"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        cx = jnp.clip(
            g["cx"] + 3.0 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            5.0, RAW_W - 5.0,
        )
        cy = jnp.clip(
            g["cy"] + 3.0 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            15.0, 195.0,
        )
        fx = g["fx"] + 1.0
        # Vermin dive toward the path row (y=170) above the friend.
        vx = g["vx"] + jnp.sign(fx - g["vx"]) * 1.2
        vy = g["vy"] + 1.6
        shot = fire & (
            (jnp.abs(g["vx"] - cx) < 9.0) & (jnp.abs(g["vy"] - cy) < 9.0)
        ).any()
        hit = fire & (jnp.abs(vx - cx) < 9.0) & (jnp.abs(vy - cy) < 9.0)
        reward = jnp.sum(jnp.where(hit, 30.0, 0.0))
        k1, k2 = jax.random.split(key)
        resp = hit | (vy > 168.0)
        got_friend = jnp.any((vy > 168.0) & (jnp.abs(vx - fx) < 10.0))
        friends = g["friends"] - got_friend.astype(jnp.int32)
        vx = jnp.where(
            resp, jax.random.uniform(k1, (_CB_N,), jnp.float32,
                                     20.0, RAW_W - 20.0), vx
        )
        vy = jnp.where(
            resp, jax.random.uniform(k2, (_CB_N,), jnp.float32,
                                     15.0, 50.0), vy
        )
        made_it = fx > RAW_W - 5.0
        reward = reward + jnp.where(made_it, 500.0, 0.0)
        fx = jnp.where(made_it | got_friend, 5.0, fx)
        g2 = {
            "cx": cx, "cy": cy, "fx": fx, "vx": vx, "vy": vy,
            "friends": friends,
            "crossed": g["crossed"] + made_it.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 24.0, jnp.float32)
        path = jnp.abs(rows - 176.0) < 3
        frame = jnp.where(path, 70.0, frame)
        fr = (jnp.abs(rows - 170.0) < 6) & (jnp.abs(cols - g["fx"]) < 4)
        frame = jnp.where(fr, 220.0, frame)
        for i in range(_CB_N):
            v = (
                (jnp.abs(rows - g["vy"][i]) < 5)
                & (jnp.abs(cols - g["vx"][i]) < 5)
            )
            frame = jnp.where(v, 170.0, frame)
        ch = (
            (jnp.abs(rows - g["cy"]) < 7) & (jnp.abs(cols - g["cx"]) < 1)
        ) | (
            (jnp.abs(cols - g["cx"]) < 7) & (jnp.abs(rows - g["cy"]) < 1)
        )
        return jnp.where(ch, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.75, gray * 0.5])


class CrossbowEnv(ArcadeEnv):
    GAME_CLS = CrossbowGame


# ---------------------------------------------------------------------------
# Darkchambers: Gauntlet-style room — zap the zombies streaming in
# from the edges, grab treasure, health drains on touch.
# ---------------------------------------------------------------------------

_DC_N = 5


class DarkchambersGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        side = jax.random.randint(k1, (_DC_N,), 0, 4)
        return {
            "px": jnp.float32(RAW_W / 2), "py": jnp.float32(105.0),
            "zx": jnp.where(side % 2 == 0, 10.0, RAW_W - 10.0),
            "zy": jax.random.uniform(k2, (_DC_N,), jnp.float32,
                                     30.0, 180.0),
            "tx": jax.random.uniform(k3, (3,), jnp.float32,
                                     30.0, RAW_W - 30.0),
            "ty": jnp.asarray([60.0, 105.0, 150.0]),
            "got_t": jnp.zeros((3,), bool),
            "hp": jnp.float32(100.0),
            "facing_x": jnp.float32(1.0), "facing_y": jnp.float32(0.0),
            "level": jnp.int32(1),
        }

    def lives(self, g):
        return (g["hp"] > 0).astype(jnp.int32)

    def over(self, g):
        return g["hp"] <= 0.0

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        mx = (right.astype(jnp.float32) - left.astype(jnp.float32))
        my = (down.astype(jnp.float32) - up.astype(jnp.float32))
        px = jnp.clip(g["px"] + 2.2 * mx, 8.0, RAW_W - 8.0)
        py = jnp.clip(g["py"] + 2.2 * my, 25.0, 195.0)
        moving = (mx != 0.0) | (my != 0.0)
        fx = jnp.where(moving, mx, g["facing_x"])
        fy = jnp.where(moving, my, g["facing_y"])
        # Zombies shamble toward the player.
        zx = g["zx"] + jnp.sign(px - g["zx"]) * 0.8
        zy = g["zy"] + jnp.sign(py - g["zy"]) * 0.8
        # Zap: a bolt along the facing direction (line test).
        rel_x = zx - px
        rel_y = zy - py
        along = rel_x * fx + rel_y * fy
        across = jnp.abs(rel_x * fy - rel_y * fx)
        zapped = fire & (along > 0.0) & (along < 70.0) & (across < 8.0)
        reward = jnp.sum(jnp.where(zapped, 20.0, 0.0))
        k1, k2 = jax.random.split(key)
        side = jax.random.randint(k1, (_DC_N,), 0, 4)
        zx = jnp.where(zapped, jnp.where(side % 2 == 0, 10.0,
                                         RAW_W - 10.0), zx)
        zy = jnp.where(
            zapped, jax.random.uniform(k2, (_DC_N,), jnp.float32,
                                       30.0, 180.0), zy
        )
        touch = (jnp.abs(zx - px) < 6.0) & (jnp.abs(zy - py) < 7.0)
        hp = g["hp"] - 2.5 * jnp.sum(touch.astype(jnp.float32)) - 0.01
        grab = (
            ~g["got_t"] & (jnp.abs(g["tx"] - px) < 7.0)
            & (jnp.abs(g["ty"] - py) < 7.0)
        )
        got_t = g["got_t"] | grab
        reward = reward + jnp.sum(jnp.where(grab, 100.0, 0.0))
        # All treasure: next chamber (heal a little, new layout).
        nxt = jnp.all(got_t)
        k3 = jax.random.fold_in(key, 7)
        tx = jnp.where(
            nxt, jax.random.uniform(k3, (3,), jnp.float32,
                                    30.0, RAW_W - 30.0), g["tx"]
        )
        got_t = got_t & ~nxt
        hp = jnp.where(nxt, jnp.minimum(hp + 25.0, 100.0), hp)
        g2 = {
            "px": px, "py": py, "zx": zx, "zy": zy,
            "tx": tx, "ty": g["ty"], "got_t": got_t, "hp": hp,
            "facing_x": fx, "facing_y": fy,
            "level": g["level"] + nxt.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 18.0, jnp.float32)
        wall = (rows < 22) | (rows > 198) | (cols < 5) | (cols > 155)
        frame = jnp.where(wall, 60.0, frame)
        for i in range(3):
            t = (
                ~g["got_t"][i]
                & (jnp.abs(rows - g["ty"][i]) < 4)
                & (jnp.abs(cols - g["tx"][i]) < 4)
            )
            frame = jnp.where(t, 235.0, frame)
        for i in range(_DC_N):
            z = (
                (jnp.abs(rows - g["zy"][i]) < 6)
                & (jnp.abs(cols - g["zx"][i]) < 4)
            )
            frame = jnp.where(z, 140.0, frame)
        pl = (jnp.abs(rows - g["py"]) < 5) & (jnp.abs(cols - g["px"]) < 4)
        frame = jnp.where(pl, 255.0, frame)
        bar = (rows < 8) & (cols < g["hp"] * (RAW_W / 100.0))
        return jnp.where(bar, 190.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.8, gray * 0.6, gray])


class DarkchambersEnv(ArcadeEnv):
    GAME_CLS = DarkchambersGame


# ---------------------------------------------------------------------------
# Entombed: the descending maze — rows scroll up, keep finding gaps
# downward; the make-break potion opens a wall when cornered.
# ---------------------------------------------------------------------------

_EN_W = 10  # maze columns


class EntombedGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        # Rolling window of maze rows as bitmasks (1 = wall).
        rows = jax.random.bernoulli(key, 0.35, (16, _EN_W))
        rows = rows.at[:, 4].set(False)  # guaranteed channel at start
        return {
            "maze": rows,
            "pc": jnp.int32(4),
            "pr": jnp.float32(4.0),   # row within window (float scroll)
            "potions": jnp.int32(2),
            "depth": jnp.float32(0.0),
            "dead": jnp.bool_(False),
        }

    def lives(self, g):
        return 1 - g["dead"].astype(jnp.int32)

    def over(self, g):
        return g["dead"]

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        scroll = 0.08 + 0.00001 * g["depth"]
        pr = g["pr"] - scroll  # the maze rises
        pr_i = jnp.clip(pr.astype(jnp.int32), 0, 15)
        # Lateral/vertical movement blocked by walls.
        pc_try = jnp.clip(
            g["pc"] + right.astype(jnp.int32) - left.astype(jnp.int32),
            0, _EN_W - 1,
        )
        blocked_lat = g["maze"][pr_i, pc_try]
        pc = jnp.where(blocked_lat, g["pc"], pc_try)
        down_try = jnp.clip(pr_i + down.astype(jnp.int32), 0, 15)
        up_try = jnp.clip(pr_i - up.astype(jnp.int32), 0, 15)
        tgt = jnp.where(down, down_try, jnp.where(up, up_try, pr_i))
        blocked_ver = g["maze"][tgt, pc]
        pr = jnp.where(
            blocked_ver, pr, pr + (down.astype(jnp.float32)
                                   - up.astype(jnp.float32))
        )
        pr = jnp.clip(pr, 0.0, 15.0)
        # Make-break: spend a potion to clear the cell below.
        use = fire & (g["potions"] > 0) & blocked_ver & down
        maze = jnp.where(
            use, g["maze"].at[tgt, pc].set(False), g["maze"]
        )
        potions = g["potions"] - use.astype(jnp.int32)
        # Window recycle: when the top row scrolls past, shift and
        # append a fresh row (keeps at least one gap).
        recycle = pr < 1.0
        k1, k2 = jax.random.split(key)
        new_row = jax.random.bernoulli(k1, 0.4, (_EN_W,))
        gap = jax.random.randint(k2, (), 0, _EN_W)
        new_row = new_row.at[gap].set(False)
        maze = jnp.where(
            recycle, jnp.concatenate([maze[1:], new_row[None]]), maze
        )
        pr = jnp.where(recycle, pr + 1.0, pr)
        reward = jnp.where(recycle, 10.0, 0.0)
        # Squashed against the (virtual) top edge.
        dead = pr <= 0.5
        g2 = {
            "maze": maze, "pc": pc, "pr": pr, "potions": potions,
            "depth": g["depth"] + scroll, "dead": dead,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        ch, cw = 13, 16
        rr = jnp.clip(rows // ch, 0, 15).astype(jnp.int32)
        cc = jnp.clip(cols // cw, 0, _EN_W - 1).astype(jnp.int32)
        wall = g["maze"][rr, cc]
        frame = jnp.where(wall, 120.0, 25.0)
        py = g["pr"] * ch + ch / 2
        px = g["pc"].astype(jnp.float32) * cw + cw / 2
        pl = (jnp.abs(rows - py) < 5) & (jnp.abs(cols - px) < 5)
        frame = jnp.where(pl, 255.0, frame)
        pot = (rows < 8) & (
            cols < g["potions"].astype(jnp.float32) * 20.0
        )
        return jnp.where(pot, 200.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.6, gray, gray * 0.8])


class EntombedEnv(ArcadeEnv):
    GAME_CLS = EntombedGame


# ---------------------------------------------------------------------------
# Et: find the three phone pieces at the bottoms of wells; hold FIRE
# to levitate out; the agent confiscates a piece on touch.
# ---------------------------------------------------------------------------

_ET_WELLS = 4


class EtGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        piece_wells = jax.random.permutation(k1, jnp.arange(_ET_WELLS))[:3]
        return {
            "px": jnp.float32(20.0),
            "depth": jnp.float32(0.0),    # 0 = surface
            "well": jnp.int32(-1),
            "piece_wells": piece_wells,
            "got": jnp.zeros((3,), bool),
            "ax": jnp.float32(RAW_W - 20.0),
            "energy": jnp.float32(400.0),
            "won": jnp.bool_(False),
        }

    def lives(self, g):
        return (g["energy"] > 0.0).astype(jnp.int32)

    def over(self, g):
        return g["won"] | (g["energy"] <= 0.0)

    @staticmethod
    def _well_x(i):
        return 25.0 + 36.0 * i.astype(jnp.float32)

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        on_surface = g["depth"] <= 0.0
        px = jnp.where(
            on_surface,
            jnp.clip(
                g["px"] + 2.2 * (right.astype(jnp.float32)
                                 - left.astype(jnp.float32)),
                8.0, RAW_W - 8.0,
            ),
            g["px"],
        )
        # Fall into a well when walking over its mouth.
        wells_x = self._well_x(jnp.arange(_ET_WELLS))
        over_well = jnp.abs(wells_x - px) < 6.0
        fell = on_surface & jnp.any(over_well)
        well = jnp.where(fell, jnp.argmax(over_well), g["well"])
        depth = jnp.where(fell, 1.0, g["depth"])
        # In-well: sink, or levitate with FIRE (costs energy).
        depth = jnp.where(
            ~on_surface | fell,
            jnp.clip(
                depth + 1.5 * (~fire).astype(jnp.float32)
                - 2.2 * fire.astype(jnp.float32),
                0.0, 90.0,
            ),
            depth,
        )
        at_bottom = depth >= 89.0
        has_piece = jnp.any(
            (g["piece_wells"] == well) & ~g["got"]
        )
        slot = jnp.argmax((g["piece_wells"] == well) & ~g["got"])
        grab = at_bottom & has_piece
        got = g["got"] | ((jnp.arange(3) == slot) & grab)
        reward = jnp.where(grab, 100.0, 0.0)
        # Out of the well.
        surfaced = ~on_surface & (depth <= 0.0)
        well = jnp.where(surfaced, -1, well)
        # The agent patrols the surface and confiscates a piece.
        ax = g["ax"] + jnp.sign(px - g["ax"]) * 1.3
        caught = on_surface & (jnp.abs(ax - px) < 6.0) & jnp.any(got)
        lose_slot = jnp.argmax(got)
        got = got & ~((jnp.arange(3) == lose_slot) & caught)
        reward = reward - jnp.where(caught, 50.0, 0.0)
        energy = g["energy"] - 0.2 - 1.2 * fire.astype(jnp.float32)
        won = jnp.all(got) & on_surface & (px < 12.0)
        reward = reward + jnp.where(won & ~g["won"], 1000.0, 0.0)
        g2 = {
            "px": px, "depth": depth, "well": well,
            "piece_wells": g["piece_wells"], "got": got, "ax": ax,
            "energy": energy, "won": won,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 30.0, jnp.float32)
        surface = jnp.abs(rows - 60.0) < 2
        frame = jnp.where(surface, 90.0, frame)
        for i in range(_ET_WELLS):
            x = 25.0 + 36.0 * i
            wellm = (rows > 60) & (rows < 185) & (jnp.abs(cols - x) < 8)
            frame = jnp.where(wellm, 15.0, frame)
        ag = (jnp.abs(rows - 52.0) < 6) & (jnp.abs(cols - g["ax"]) < 4)
        frame = jnp.where(ag, 150.0, frame)
        py = jnp.where(g["depth"] > 0.0, 62.0 + g["depth"] * 1.3, 52.0)
        wx = jnp.where(
            g["well"] >= 0, self._well_x(jnp.maximum(g["well"], 0)),
            g["px"],
        )
        et = (jnp.abs(rows - py) < 6) & (jnp.abs(cols - wx) < 4)
        frame = jnp.where(et, 255.0, frame)
        bar = (rows < 8) & (cols < g["energy"] * (RAW_W / 400.0))
        return jnp.where(bar, 200.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.6, gray * 0.9, gray * 0.6])


class EtEnv(ArcadeEnv):
    GAME_CLS = EtGame


# ---------------------------------------------------------------------------
# Turmoil: seven lanes, you sit in the center column; ships dash in
# from both sides — snap to a lane and fire the right way, fast.
# ---------------------------------------------------------------------------

_TM_LANES = 7


class TurmoilGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        from_left = jax.random.bernoulli(k1, 0.5, (_TM_LANES,))
        return {
            "lane": jnp.int32(3),
            "ex": jnp.where(from_left, 0.0, float(RAW_W)),
            "ev": jnp.where(from_left, 1.0, -1.0)
            * jax.random.uniform(k2, (_TM_LANES,), jnp.float32, 1.5, 3.5),
            "shot_x": jnp.float32(-1.0),
            "shot_v": jnp.float32(0.0),
            "shot_lane": jnp.int32(0),
            "lives": jnp.int32(3),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    @staticmethod
    def _lane_y(lane):
        return 40.0 + 22.0 * lane.astype(jnp.float32)

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        lane = jnp.clip(
            g["lane"] + down.astype(jnp.int32) - up.astype(jnp.int32),
            0, _TM_LANES - 1,
        )
        ex = g["ex"] + g["ev"]
        # Fire left or right from the center column.
        mid = RAW_W / 2.0
        can_f = fire & (g["shot_x"] < 0.0) & (left | right)
        shot_v = jnp.where(can_f, jnp.where(right, 7.0, -7.0), g["shot_v"])
        shot_x = jnp.where(can_f, mid, g["shot_x"])
        shot_lane = jnp.where(can_f, lane, g["shot_lane"])
        shot_x = jnp.where(
            (shot_x >= 0.0) & ~can_f, shot_x + shot_v, shot_x
        )
        shot_x = jnp.where((shot_x < 0.0) | (shot_x > RAW_W), -1.0, shot_x)
        hit = (
            (shot_x >= 0.0)
            & (jnp.arange(_TM_LANES) == shot_lane)
            & (jnp.abs(ex - shot_x) < 8.0)
        )
        any_hit = jnp.any(hit)
        # Faster ships pay more.
        speed_bonus = jnp.sum(
            jnp.where(hit, jnp.abs(g["ev"]) * 20.0, 0.0)
        )
        reward = jnp.where(any_hit, speed_bonus, 0.0)
        shot_x = jnp.where(any_hit, -1.0, shot_x)
        # A ship crossing the center column while you sit on its lane
        # rams you.
        at_mid = jnp.abs(ex - mid) < 6.0
        ram = jnp.any(at_mid & (jnp.arange(_TM_LANES) == lane))
        lives = g["lives"] - ram.astype(jnp.int32)
        # Recycle crossed/shot ships.
        k1, k2 = jax.random.split(key)
        crossed = (ex < -5.0) | (ex > RAW_W + 5.0)
        resp = hit | crossed
        from_left = jax.random.bernoulli(k1, 0.5, (_TM_LANES,))
        ex = jnp.where(resp, jnp.where(from_left, 0.0, float(RAW_W)), ex)
        ev = jnp.where(
            resp,
            jnp.where(from_left, 1.0, -1.0)
            * jax.random.uniform(k2, (_TM_LANES,), jnp.float32, 1.5, 4.5),
            g["ev"],
        )
        g2 = {
            "lane": lane, "ex": ex, "ev": ev,
            "shot_x": shot_x, "shot_v": shot_v, "shot_lane": shot_lane,
            "lives": lives,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 12.0, jnp.float32)
        for i in range(_TM_LANES):
            y = 40.0 + 22.0 * i
            lm = jnp.abs(rows - y - 11.0) < 1
            frame = jnp.where(lm, 45.0, frame)
            e = (jnp.abs(rows - y) < 6) & (jnp.abs(cols - g["ex"][i]) < 7)
            frame = jnp.where(e, 180.0, frame)
        sh = (
            (g["shot_x"] >= 0.0)
            & (jnp.abs(rows - self._lane_y(g["shot_lane"])) < 2)
            & (jnp.abs(cols - g["shot_x"]) < 4)
        )
        frame = jnp.where(sh, 255.0, frame)
        py = self._lane_y(g["lane"])
        pl = (jnp.abs(rows - py) < 7) & (
            jnp.abs(cols - RAW_W / 2.0) < 5
        )
        return jnp.where(pl, 240.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.5, gray])


class TurmoilEnv(ArcadeEnv):
    GAME_CLS = TurmoilGame


# ---------------------------------------------------------------------------
# Koolaid: the pool is draining — tackle the Thirsties before they
# drink it dry; touching one while "Oh yeah!"-charged scores.
# ---------------------------------------------------------------------------

_KA_N = 3


class KoolaidGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "px": jnp.float32(RAW_W / 2), "py": jnp.float32(120.0),
            "tx": jax.random.uniform(k1, (_KA_N,), jnp.float32,
                                     15.0, RAW_W - 15.0),
            "ty": jax.random.uniform(k2, (_KA_N,), jnp.float32,
                                     40.0, 90.0),
            "drinking": jnp.zeros((_KA_N,), bool),
            "water": jnp.float32(100.0),
            "smashed": jnp.int32(0),
        }

    def lives(self, g):
        return (g["water"] > 0.0).astype(jnp.int32)

    def over(self, g):
        return g["water"] <= 0.0

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        px = jnp.clip(
            g["px"] + 2.6 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            8.0, RAW_W - 8.0,
        )
        py = jnp.clip(
            g["py"] + 2.6 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            30.0, 190.0,
        )
        # Water line rises as the pool drains (level drops).
        water_y = 200.0 - g["water"]
        # Thirsties dive to the water line and drink.
        ty = g["ty"] + jnp.where(g["drinking"], 0.0, 1.1)
        drinking = g["drinking"] | (ty >= water_y)
        ty = jnp.minimum(ty, water_y)
        drain = 0.05 + 0.12 * jnp.sum(drinking.astype(jnp.float32))
        water = g["water"] - drain
        # Tackle: touch a thirsty.
        tackle = (
            (jnp.abs(g["tx"] - px) < 7.0) & (jnp.abs(ty - py) < 8.0)
        )
        reward = jnp.sum(jnp.where(tackle, 100.0, 0.0))
        k1, k2 = jax.random.split(key)
        tx = jnp.where(
            tackle,
            jax.random.uniform(k1, (_KA_N,), jnp.float32,
                               15.0, RAW_W - 15.0),
            g["tx"],
        )
        ty = jnp.where(
            tackle,
            jax.random.uniform(k2, (_KA_N,), jnp.float32, 35.0, 60.0),
            ty,
        )
        drinking = drinking & ~tackle
        # Tackles splash some water back in.
        water = jnp.minimum(
            water + 2.0 * jnp.sum(tackle.astype(jnp.float32)), 100.0
        )
        g2 = {
            "px": px, "py": py, "tx": tx, "ty": ty,
            "drinking": drinking, "water": water,
            "smashed": g["smashed"] + jnp.sum(tackle.astype(jnp.int32)),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 20.0, jnp.float32)
        water_y = 200.0 - g["water"]
        pool = rows > water_y
        frame = jnp.where(pool, 80.0, frame)
        for i in range(_KA_N):
            t = (
                (jnp.abs(rows - g["ty"][i]) < 6)
                & (jnp.abs(cols - g["tx"][i]) < 5)
            )
            v = jnp.where(g["drinking"][i], 220.0, 160.0)
            frame = jnp.where(t, v, frame)
        man = (jnp.abs(rows - g["py"]) < 7) & (jnp.abs(cols - g["px"]) < 6)
        return jnp.where(man, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.4, gray * 0.6])


class KoolaidEnv(ArcadeEnv):
    GAME_CLS = KoolaidGame
