"""Arcade wave 2: Asterix, Skiing, Boxing, Seaquest, Enduro, Bowling.

Behavioral reference: the corresponding ALE games registered by
``envpool/atari/registration.py:21-35``.  As for the first four cores
(pong.py, breakout.py, freeway.py, space_invaders.py) these are
faithful-behavior reimplementations — same control schemes, scoring
rules, life/terminal structure and visual layout class — not bit-exact
6502/TIA emulation, hence the honest ``XxxLite-v5`` ids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame


# ---------------------------------------------------------------------------
# Asterix: 8 lanes of scrolling objects; collect rewards, avoid lyres.
# ---------------------------------------------------------------------------

_AX_LANES = 8
_AX_LANE_Y = np.linspace(40, 180, _AX_LANES)
_AX_SPEED = 1.2
_AX_PX = RAW_W / 2


class AsterixGame(ArcadeGame):
    action_set_size = 9  # NOOP + 8 directions
    has_fire = False

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        xs = jax.random.uniform(k1, (_AX_LANES,), jnp.float32, 0, RAW_W)
        dirs = jnp.where(
            jax.random.uniform(k2, (_AX_LANES,)) < 0.5, -1.0, 1.0
        )
        good = jax.random.uniform(k3, (_AX_LANES,)) < 0.6
        return {
            "px": jnp.float32(_AX_PX),
            "lane": jnp.int32(4),
            "obj_x": xs,
            "obj_dir": dirs,
            "obj_good": good,
            "lives": jnp.int32(3),
            "dead_cool": jnp.int32(0),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        # Directions: 1 up? ALE: 1=UP? minimal set: 0 NOOP 1 UP 2 RIGHT
        # 3 LEFT 4 DOWN 5..8 diagonals.
        up = (action == 1) | (action == 5) | (action == 6)
        down = (action == 4) | (action == 7) | (action == 8)
        right = (action == 2) | (action == 5) | (action == 7)
        left = (action == 3) | (action == 6) | (action == 8)
        lane = jnp.clip(
            g["lane"] + down.astype(jnp.int32) - up.astype(jnp.int32),
            0,
            _AX_LANES - 1,
        )
        px = jnp.clip(
            g["px"] + 2.0 * (right.astype(jnp.float32) - left.astype(jnp.float32)),
            8.0,
            RAW_W - 8.0,
        )
        obj_x = g["obj_x"] + g["obj_dir"] * _AX_SPEED
        wrap = (obj_x < 0) | (obj_x > RAW_W)
        k1, k2 = jax.random.split(key)
        new_good = jax.random.uniform(k1, (_AX_LANES,)) < 0.6
        obj_x = jnp.mod(obj_x, RAW_W)
        obj_good = jnp.where(wrap, new_good, g["obj_good"])
        # Collision with the object in the player's lane.
        hit = (
            jnp.abs(obj_x[lane] - px) < 8.0
        ) & (g["dead_cool"] == 0)
        collect = hit & obj_good[lane]
        die = hit & ~obj_good[lane]
        reward = jnp.where(collect, 50.0, 0.0)
        # Collected objects respawn at the edge.
        obj_x = obj_x.at[lane].set(
            jnp.where(collect, 0.0, obj_x[lane])
        )
        lives = g["lives"] - die.astype(jnp.int32)
        g2 = {
            "px": px,
            "lane": lane,
            "obj_x": obj_x,
            "obj_dir": g["obj_dir"],
            "obj_good": obj_good,
            "lives": lives,
            "dead_cool": jnp.where(
                die, 60, jnp.maximum(g["dead_cool"] - 1, 0)
            ).astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2 = jax.tree_util.tree_map(
            lambda old, new: jnp.where(over0, old, new), g, g2
        )
        return g2, jnp.where(over0, 0.0, reward), self.over(g2)

    def render_gray(self, g):
        rows = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 0)
        cols = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 1)
        frame = jnp.full((RAW_H, RAW_W), 60.0, jnp.float32)
        lane_y = jnp.asarray(_AX_LANE_Y, jnp.float32)
        for i in range(_AX_LANES):
            obj = (
                (jnp.abs(rows - lane_y[i]) < 4)
                & (jnp.abs(cols - g["obj_x"][i]) < 5)
            )
            luma = jnp.where(g["obj_good"][i], 220.0, 130.0)
            frame = jnp.where(obj, luma, frame)
        py = lane_y[g["lane"]]
        player = (jnp.abs(rows - py) < 5) & (jnp.abs(cols - g["px"]) < 4)
        return jnp.where(player, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.8, gray * 0.5])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[96].set((g["score"] % 256).astype(jnp.uint8))
        ram = ram.at[83].set(g["lives"].astype(jnp.uint8))
        return ram


class AsterixEnv(ArcadeEnv):
    GAME_CLS = AsterixGame


# ---------------------------------------------------------------------------
# Skiing: steer through gates; reward = negative elapsed time + gate misses.
# ---------------------------------------------------------------------------

_SKI_GATES = 20
_SKI_COURSE = 3200.0  # course length in rows


class SkiingGame(ArcadeGame):
    action_set_size = 3  # NOOP, RIGHT, LEFT
    has_fire = False

    def init(self, key):
        gx = jax.random.uniform(
            key, (_SKI_GATES,), jnp.float32, 30.0, RAW_W - 30.0
        )
        gy = jnp.linspace(150.0, _SKI_COURSE, _SKI_GATES)
        return {
            "px": jnp.float32(RAW_W / 2),
            "vx": jnp.float32(0.0),
            "dist": jnp.float32(0.0),
            "gate_x": gx,
            "gate_y": gy,
            "passed": jnp.zeros(_SKI_GATES, bool),
            "missed": jnp.zeros(_SKI_GATES, bool),
            "t": jnp.int32(0),
            "done": jnp.bool_(False),
        }

    def over(self, g):
        return g["done"]

    def tick(self, g, action, key):
        over0 = g["done"]
        vx = jnp.clip(
            g["vx"]
            + 0.25 * ((action == 1).astype(jnp.float32)
                      - (action == 2).astype(jnp.float32)),
            -2.5,
            2.5,
        )
        px = jnp.clip(g["px"] + vx, 8.0, RAW_W - 8.0)
        speed = 2.0
        dist = g["dist"] + speed
        # Gate crossing: gate line passes the player's row this frame.
        crossing = (g["gate_y"] > dist - speed) & (g["gate_y"] <= dist)
        within = jnp.abs(g["gate_x"] - px) < 12.0
        newly_passed = crossing & within & ~g["passed"] & ~g["missed"]
        newly_missed = crossing & ~within & ~g["passed"] & ~g["missed"]
        passed = g["passed"] | newly_passed
        missed = g["missed"] | newly_missed
        finished = dist >= _SKI_COURSE
        # ALE skiing: reward is given at the end (-time, 5s penalty per
        # missed gate, in centiseconds); per-step we emit -1 per frame
        # and the miss penalties at the finish.
        reward = jnp.where(
            finished & ~over0,
            -(missed.sum().astype(jnp.float32)) * 500.0,
            -1.0,
        )
        g2 = {
            "px": px,
            "vx": vx,
            "dist": dist,
            "gate_x": g["gate_x"],
            "gate_y": g["gate_y"],
            "passed": passed,
            "missed": missed,
            "t": g["t"] + 1,
            "done": finished,
        }
        g2 = jax.tree_util.tree_map(
            lambda old, new: jnp.where(over0, old, new), g, g2
        )
        return g2, jnp.where(over0, 0.0, reward), g2["done"]

    def render_gray(self, g):
        rows = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 0)
        cols = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 1)
        frame = jnp.full((RAW_H, RAW_W), 236.0, jnp.float32)  # snow
        # Gates ahead (screen y = gate_y - dist + player row 40).
        for i in range(_SKI_GATES):
            sy = g["gate_y"][i] - g["dist"] + 40.0
            vis = (sy > 0) & (sy < RAW_H)
            pole_l = (
                vis
                & (jnp.abs(rows - sy) < 6)
                & (jnp.abs(cols - (g["gate_x"][i] - 12)) < 2)
            )
            pole_r = (
                vis
                & (jnp.abs(rows - sy) < 6)
                & (jnp.abs(cols - (g["gate_x"][i] + 12)) < 2)
            )
            frame = jnp.where(pole_l | pole_r, 80.0, frame)
        player = (jnp.abs(rows - 40.0) < 5) & (
            jnp.abs(cols - g["px"]) < 3
        )
        return jnp.where(player, 20.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray, jnp.minimum(gray * 1.05, 255.0)])


class SkiingEnv(ArcadeEnv):
    GAME_CLS = SkiingGame


# ---------------------------------------------------------------------------
# Boxing: two boxers in a ring; jab scoring, 2-minute bout.
# ---------------------------------------------------------------------------

_BOX_TIME = 2 * 60 * 60  # 2 minutes of raw frames


class BoxingGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "px": jnp.float32(40.0),
            "py": jnp.float32(105.0),
            "ex": jnp.float32(120.0),
            "ey": jnp.float32(105.0),
            "p_cool": jnp.int32(0),
            "e_cool": jnp.int32(0),
            "p_score": jnp.int32(0),
            "e_score": jnp.int32(0),
            "t": jnp.int32(0),
        }

    def over(self, g):
        return (
            (g["t"] >= _BOX_TIME)
            | (g["p_score"] >= 100)
            | (g["e_score"] >= 100)
        )

    def tick(self, g, action, key):
        over0 = self.over(g)
        # ALE full action set: extract direction + fire bits.
        fire = (action == 1) | (action >= 10)
        a = action
        up = (a == 2) | (a == 6) | (a == 7) | (a == 10) | (a == 14) | (a == 15)
        right = (a == 3) | (a == 6) | (a == 8) | (a == 11) | (a == 14) | (a == 16)
        left = (a == 4) | (a == 7) | (a == 9) | (a == 12) | (a == 15) | (a == 17)
        down = (a == 5) | (a == 8) | (a == 9) | (a == 13) | (a == 16) | (a == 17)
        px = jnp.clip(
            g["px"] + (right.astype(jnp.float32) - left.astype(jnp.float32)),
            20.0, RAW_W - 40.0,
        )
        py = jnp.clip(
            g["py"] + (down.astype(jnp.float32) - up.astype(jnp.float32)),
            40.0, 170.0,
        )
        # Enemy AI: drift toward the player, jab when close.
        k1, k2 = jax.random.split(key)
        ex = g["ex"] + jnp.clip(px + 24.0 - g["ex"], -0.7, 0.7)
        ey = g["ey"] + jnp.clip(py - g["ey"], -0.7, 0.7)
        dist = jnp.abs(ex - px) + jnp.abs(ey - py)
        in_range = dist < 30.0
        p_hit = fire & in_range & (g["p_cool"] == 0)
        e_hit = (
            in_range
            & (g["e_cool"] == 0)
            & (jax.random.uniform(k1, ()) < 0.04)
        )
        reward = p_hit.astype(jnp.float32) - e_hit.astype(jnp.float32)
        g2 = {
            "px": px,
            "py": py,
            "ex": ex,
            "ey": ey,
            "p_cool": jnp.where(p_hit, 15, jnp.maximum(g["p_cool"] - 1, 0)),
            "e_cool": jnp.where(e_hit, 15, jnp.maximum(g["e_cool"] - 1, 0)),
            "p_score": g["p_score"] + p_hit.astype(jnp.int32),
            "e_score": g["e_score"] + e_hit.astype(jnp.int32),
            "t": g["t"] + 1,
        }
        g2 = jax.tree_util.tree_map(
            lambda old, new: jnp.where(over0, old, new), g, g2
        )
        return g2, jnp.where(over0, 0.0, reward), self.over(g2)

    def render_gray(self, g):
        rows = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 0)
        cols = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 1)
        frame = jnp.full((RAW_H, RAW_W), 110.0, jnp.float32)  # ring
        ring = (rows > 35) & (rows < 180) & (cols > 15) & (cols < 145)
        frame = jnp.where(ring, 150.0, frame)
        p = (jnp.abs(rows - g["py"]) < 8) & (jnp.abs(cols - g["px"]) < 5)
        e = (jnp.abs(rows - g["ey"]) < 8) & (jnp.abs(cols - g["ex"]) < 5)
        frame = jnp.where(p, 240.0, frame)
        return jnp.where(e, 40.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.9, gray * 0.7])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[18].set(jnp.clip(g["p_score"], 0, 255).astype(jnp.uint8))
        ram = ram.at[19].set(jnp.clip(g["e_score"], 0, 255).astype(jnp.uint8))
        return ram


class BoxingEnv(ArcadeEnv):
    GAME_CLS = BoxingGame


# ---------------------------------------------------------------------------
# Seaquest: submarine shoots fish, rescues divers, surfaces for oxygen.
# ---------------------------------------------------------------------------

_SQ_LANES = 4
_SQ_LANE_Y = np.linspace(90, 170, _SQ_LANES)


class SeaquestGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        fx = jax.random.uniform(k1, (_SQ_LANES,), jnp.float32, 0, RAW_W)
        fd = jnp.where(jax.random.uniform(k2, (_SQ_LANES,)) < 0.5, -1.0, 1.0)
        dv = jax.random.uniform(k3, (_SQ_LANES,)) < 0.3
        return {
            "px": jnp.float32(RAW_W / 2),
            "py": jnp.float32(100.0),
            "fish_x": fx,
            "fish_d": fd,
            "fish_live": jnp.ones(_SQ_LANES, bool),
            "diver": dv,
            "divers_held": jnp.int32(0),
            "oxygen": jnp.float32(1.0),
            "torp_x": jnp.float32(-1.0),
            "torp_y": jnp.float32(0.0),
            "torp_d": jnp.float32(1.0),
            "lives": jnp.int32(4),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        a = action
        fire = (a == 1) | (a >= 10)
        up = (a == 2) | (a == 6) | (a == 7) | (a == 10) | (a == 14) | (a == 15)
        right = (a == 3) | (a == 6) | (a == 8) | (a == 11) | (a == 14) | (a == 16)
        left = (a == 4) | (a == 7) | (a == 9) | (a == 12) | (a == 15) | (a == 17)
        down = (a == 5) | (a == 8) | (a == 9) | (a == 13) | (a == 16) | (a == 17)
        px = jnp.clip(
            g["px"] + 1.5 * (right.astype(jnp.float32) - left.astype(jnp.float32)),
            8.0, RAW_W - 8.0,
        )
        py = jnp.clip(
            g["py"] + 1.5 * (down.astype(jnp.float32) - up.astype(jnp.float32)),
            55.0, 180.0,
        )
        fish_x = jnp.mod(g["fish_x"] + g["fish_d"] * 1.0, RAW_W)
        # Torpedo: fires horizontally from the sub.
        t_active = g["torp_x"] >= 0
        facing = jnp.where(right, 1.0, jnp.where(left, -1.0, g["torp_d"]))
        torp_x = jnp.where(
            t_active, g["torp_x"] + 4.0 * g["torp_d"],
            jnp.where(fire, px, -1.0),
        )
        torp_y = jnp.where(t_active, g["torp_y"], py)
        torp_d = jnp.where(t_active, g["torp_d"], facing)
        torp_x = jnp.where((torp_x < 0) | (torp_x > RAW_W), -1.0, torp_x)
        # Torpedo hits fish in its lane.
        lane_y = jnp.asarray(_SQ_LANE_Y, jnp.float32)
        t_lane_hit = (
            (jnp.abs(lane_y - torp_y) < 8.0)
            & (jnp.abs(fish_x - torp_x) < 6.0)
            & g["fish_live"]
            & (torp_x >= 0)
        )
        any_hit = t_lane_hit.any()
        reward = jnp.where(any_hit, 20.0, 0.0)
        fish_live = g["fish_live"] & ~t_lane_hit
        torp_x = jnp.where(any_hit, -1.0, torp_x)
        # Respawn dead fish at the edge occasionally.
        k1, k2 = jax.random.split(key)
        respawn = (
            ~fish_live & (jax.random.uniform(k1, (_SQ_LANES,)) < 0.01)
        )
        fish_live = fish_live | respawn
        # Sub-fish collision costs a life.
        sub_hit = (
            (jnp.abs(lane_y - py) < 8.0)
            & (jnp.abs(fish_x - px) < 8.0)
            & fish_live
        ).any()
        # Divers: rescue when touching a diver lane marker.
        dive_touch = (
            (jnp.abs(lane_y - py) < 6.0)
            & (jnp.abs(fish_x - px) < 6.0)
            & g["diver"]
        )
        rescued = dive_touch.any() & (g["divers_held"] < 6)
        diver = g["diver"] & ~dive_touch
        divers_held = g["divers_held"] + rescued.astype(jnp.int32)
        # Oxygen: depletes underwater, refills at the surface; surfacing
        # with divers scores.
        at_surface = py <= 58.0
        oxygen = jnp.clip(
            g["oxygen"] + jnp.where(at_surface, 0.02, -0.0008),
            0.0, 1.0,
        )
        surface_score = at_surface & (g["divers_held"] > 0)
        reward = reward + jnp.where(
            surface_score, 50.0 * g["divers_held"].astype(jnp.float32), 0.0
        )
        divers_held = jnp.where(surface_score, 0, divers_held)
        lose_life = sub_hit | (oxygen <= 0.0)
        lives = g["lives"] - lose_life.astype(jnp.int32)
        oxygen = jnp.where(lose_life, 1.0, oxygen)
        py = jnp.where(lose_life, 100.0, py)
        g2 = {
            "px": px, "py": py, "fish_x": fish_x, "fish_d": g["fish_d"],
            "fish_live": fish_live, "diver": diver,
            "divers_held": divers_held, "oxygen": oxygen,
            "torp_x": torp_x, "torp_y": torp_y, "torp_d": torp_d,
            "lives": lives,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2 = jax.tree_util.tree_map(
            lambda old, new: jnp.where(over0, old, new), g, g2
        )
        return g2, jnp.where(over0, 0.0, reward), self.over(g2)

    def render_gray(self, g):
        rows = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 0)
        cols = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 1)
        frame = jnp.where(rows < 55, 170.0, 90.0)  # sky / water
        lane_y = jnp.asarray(_SQ_LANE_Y, jnp.float32)
        for i in range(_SQ_LANES):
            fish = (
                g["fish_live"][i]
                & (jnp.abs(rows - lane_y[i]) < 3)
                & (jnp.abs(cols - g["fish_x"][i]) < 5)
            )
            frame = jnp.where(fish, 200.0, frame)
        torp = (
            (g["torp_x"] >= 0)
            & (jnp.abs(rows - g["torp_y"]) < 2)
            & (jnp.abs(cols - g["torp_x"]) < 3)
        )
        frame = jnp.where(torp, 255.0, frame)
        sub = (jnp.abs(rows - g["py"]) < 5) & (jnp.abs(cols - g["px"]) < 8)
        frame = jnp.where(sub, 230.0, frame)
        # Oxygen bar.
        bar = (rows > 190) & (rows < 196) & (
            cols < g["oxygen"] * RAW_W
        )
        return jnp.where(bar, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.6, gray * 0.8, gray])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[59].set(jnp.clip(g["lives"], 0, 255).astype(jnp.uint8))
        ram = ram.at[102].set(
            (jnp.clip(g["oxygen"], 0, 1) * 64).astype(jnp.uint8)
        )
        return ram


class SeaquestEnv(ArcadeEnv):
    GAME_CLS = SeaquestGame


# ---------------------------------------------------------------------------
# Enduro: pass cars on an endless road, day by day.
# ---------------------------------------------------------------------------

_EN_CARS = 6


class EnduroGame(ArcadeGame):
    action_set_size = 9
    has_fire = True  # FIRE accelerates

    def init(self, key):
        k1, k2 = jax.random.split(key)
        cx = jax.random.uniform(k1, (_EN_CARS,), jnp.float32, 40, RAW_W - 40)
        cd = jax.random.uniform(k2, (_EN_CARS,), jnp.float32, 50, 800)
        return {
            "px": jnp.float32(RAW_W / 2),
            "speed": jnp.float32(1.0),
            "car_x": cx,
            "car_d": cd,       # distance ahead of the player
            "passed": jnp.int32(0),
            "day": jnp.int32(1),
            "quota": jnp.int32(200),
            "t": jnp.int32(0),
            "failed": jnp.bool_(False),
        }

    def over(self, g):
        return g["failed"]

    def tick(self, g, action, key):
        over0 = g["failed"]
        a = action
        accel = (a == 1) | (a == 5) | (a == 6)
        brake = (a == 4) | (a == 7) | (a == 8)
        right = (a == 2) | (a == 5) | (a == 7)
        left = (a == 3) | (a == 6) | (a == 8)
        speed = jnp.clip(
            g["speed"]
            + 0.02 * accel.astype(jnp.float32)
            - 0.05 * brake.astype(jnp.float32),
            0.3,
            4.0,
        )
        px = jnp.clip(
            g["px"]
            + 1.5 * (right.astype(jnp.float32) - left.astype(jnp.float32)),
            30.0,
            RAW_W - 30.0,
        )
        # Traffic approaches at (player speed - 1).
        car_d = g["car_d"] - (speed - 1.0)
        near = jnp.abs(car_d) < 6.0
        collide = (near & (jnp.abs(g["car_x"] - px) < 10.0)).any()
        speed = jnp.where(collide, 0.3, speed)
        newly_passed = car_d < -5.0
        n_pass = newly_passed.sum().astype(jnp.int32)
        k1, k2 = jax.random.split(key)
        new_x = jax.random.uniform(k1, (_EN_CARS,), jnp.float32, 40, RAW_W - 40)
        new_d = jax.random.uniform(k2, (_EN_CARS,), jnp.float32, 400, 900)
        car_x = jnp.where(newly_passed, new_x, g["car_x"])
        car_d = jnp.where(newly_passed, new_d, car_d)
        passed = g["passed"] + n_pass
        day_done = passed >= g["quota"]
        day = g["day"] + day_done.astype(jnp.int32)
        passed = jnp.where(day_done, 0, passed)
        t = g["t"] + 1
        # A day lasts ~3 minutes of frames; failing the quota ends it.
        day_up = (t % (3 * 60 * 60)) == 0
        failed = g["failed"] | (day_up & ~day_done & (passed < g["quota"]))
        reward = n_pass.astype(jnp.float32)
        g2 = {
            "px": px, "speed": speed, "car_x": car_x, "car_d": car_d,
            "passed": passed, "day": day, "quota": g["quota"], "t": t,
            "failed": failed,
        }
        g2 = jax.tree_util.tree_map(
            lambda old, new: jnp.where(over0, old, new), g, g2
        )
        return g2, jnp.where(over0, 0.0, reward), g2["failed"]

    def render_gray(self, g):
        rows = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 0)
        cols = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 1)
        frame = jnp.where(rows < 70, 140.0, 95.0)  # horizon / road
        # Road edges narrow with distance (fake perspective).
        half = 20.0 + (rows - 70.0) * 0.45
        edge = (rows >= 70) & (
            (jnp.abs(cols - RAW_W / 2) > half)
        )
        frame = jnp.where(edge, 50.0, frame)
        # Cars ahead: screen row from distance.
        for i in range(_EN_CARS):
            sy = 190.0 - jnp.clip(g["car_d"][i], 0.0, 800.0) * 0.15
            vis = (g["car_d"][i] > 0) & (sy > 70)
            car = (
                vis
                & (jnp.abs(rows - sy) < 4)
                & (jnp.abs(cols - g["car_x"][i]) < 6)
            )
            frame = jnp.where(car, 210.0, frame)
        me = (jnp.abs(rows - 185.0) < 5) & (jnp.abs(cols - g["px"]) < 6)
        return jnp.where(me, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.85, gray * 0.7])


class EnduroEnv(ArcadeEnv):
    GAME_CLS = EnduroGame


# ---------------------------------------------------------------------------
# Bowling: aim, roll, curve; 10 frames of pins.
# ---------------------------------------------------------------------------

_PIN_X = np.asarray([120, 128, 128, 136, 136, 136, 144, 144, 144, 144],
                    np.float32)
_PIN_Y = np.asarray([105, 97, 113, 89, 105, 121, 81, 97, 113, 129],
                    np.float32)


class BowlingGame(ArcadeGame):
    action_set_size = 6
    has_fire = True

    def init(self, key):
        return {
            "phase": jnp.int32(0),   # 0 aim, 1 rolling
            "by": jnp.float32(105.0),
            "bx": jnp.float32(20.0),
            "curve": jnp.float32(0.0),
            "pins": jnp.ones(10, bool),
            "balls": jnp.int32(0),   # balls thrown in this frame
            "frame_i": jnp.int32(0),
            "score": jnp.int32(0),
        }

    def over(self, g):
        return g["frame_i"] >= 10

    def tick(self, g, action, key):
        over0 = self.over(g)
        aiming = g["phase"] == 0
        up = action == 2
        down = action == 3
        by = jnp.clip(
            g["by"]
            + jnp.where(aiming, 1.2, g["curve"])
            * jnp.where(aiming, up.astype(jnp.float32)
                        - down.astype(jnp.float32), 1.0),
            75.0, 135.0,
        )
        fire = action == 1
        phase = jnp.where(aiming & fire, 1, g["phase"])
        # While rolling: steer applies curve.
        curve = jnp.where(
            g["phase"] == 1,
            jnp.clip(
                g["curve"]
                + 0.05 * (up.astype(jnp.float32) - down.astype(jnp.float32)),
                -0.8, 0.8,
            ),
            0.0,
        )
        bx = jnp.where(g["phase"] == 1, g["bx"] + 3.0, g["bx"])
        # Pin collisions.
        pin_x = jnp.asarray(_PIN_X)
        pin_y = jnp.asarray(_PIN_Y)
        hit = (
            g["pins"]
            & (jnp.abs(pin_x - bx) < 5.0)
            & (jnp.abs(pin_y - by) < 9.0)
            & (g["phase"] == 1)
        )
        n_hit = hit.sum()
        pins = g["pins"] & ~hit
        reward = n_hit.astype(jnp.float32)
        done_roll = bx > 150.0
        balls = g["balls"] + done_roll.astype(jnp.int32)
        all_down = ~pins.any()
        frame_over = done_roll & ((balls >= 2) | all_down)
        frame_i = g["frame_i"] + frame_over.astype(jnp.int32)
        pins = jnp.where(frame_over, jnp.ones(10, bool), pins)
        balls = jnp.where(frame_over, 0, balls)
        bx = jnp.where(done_roll, 20.0, bx)
        phase = jnp.where(done_roll, 0, phase)
        g2 = {
            "phase": phase, "by": by, "bx": bx, "curve": curve,
            "pins": pins, "balls": balls, "frame_i": frame_i,
            "score": g["score"] + n_hit.astype(jnp.int32),
        }
        g2 = jax.tree_util.tree_map(
            lambda old, new: jnp.where(over0, old, new), g, g2
        )
        return g2, jnp.where(over0, 0.0, reward), self.over(g2)

    def render_gray(self, g):
        rows = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 0)
        cols = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 1)
        frame = jnp.full((RAW_H, RAW_W), 120.0, jnp.float32)
        lane = (rows > 70) & (rows < 140)
        frame = jnp.where(lane, 160.0, frame)
        pin_x = jnp.asarray(_PIN_X)
        pin_y = jnp.asarray(_PIN_Y)
        for i in range(10):
            pin = (
                g["pins"][i]
                & (jnp.abs(rows - pin_y[i]) < 3)
                & (jnp.abs(cols - pin_x[i]) < 2)
            )
            frame = jnp.where(pin, 240.0, frame)
        ball = (jnp.abs(rows - g["by"]) < 4) & (jnp.abs(cols - g["bx"]) < 4)
        return jnp.where(ball, 30.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.95, gray * 0.85])


class BowlingEnv(ArcadeEnv):
    GAME_CLS = BowlingGame
