"""Arcade wave 10: Asteroids, Defender, KungFuMaster, PrivateEye,
Robotank — five of the Atari-57 games missing from waves 1-9.

Behavioral reference: the corresponding ALE games registered by
``envpool/atari/registration.py:21-35``; faithful-behavior cores under
``XxxLite-v5`` ids as in earlier waves (mechanics, action semantics,
scoring shapes — not bit-exact ALE emulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame
from .wave3_games import _freeze_when, _grids


# ---------------------------------------------------------------------------
# Asteroids: rotate/thrust/fire; rocks split when shot.
# ---------------------------------------------------------------------------

_AS_N = 12      # asteroid slots
_AS_SHOTS = 4


class AsteroidsGame(ArcadeGame):
    action_set_size = 18  # ALE minimal set is 14; the 18-set covers it
    has_fire = True

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        # 4 big rocks alive; the rest are split slots.
        pos = jax.random.uniform(
            k1, (_AS_N, 2), jnp.float32,
            jnp.asarray([10.0, 30.0]), jnp.asarray([RAW_W - 10.0, 180.0]),
        )
        ang = jax.random.uniform(k2, (_AS_N,), jnp.float32, 0, 2 * np.pi)
        vel = 0.7 * jnp.stack([jnp.cos(ang), jnp.sin(ang)], 1)
        alive = jnp.arange(_AS_N) < 4
        return {
            "px": jnp.float32(RAW_W / 2), "py": jnp.float32(105.0),
            "pvx": jnp.float32(0.0), "pvy": jnp.float32(0.0),
            "pang": jnp.float32(-np.pi / 2),
            "rock": pos, "rvel": vel,
            "ralive": alive,
            "rbig": jnp.ones((_AS_N,), bool),
            "shot": jnp.zeros((_AS_SHOTS, 2)),
            "svel": jnp.zeros((_AS_SHOTS, 2)),
            "slive": jnp.zeros((_AS_SHOTS,), bool),
            "cool": jnp.int32(0),
            "inv": jnp.int32(0),   # respawn invulnerability
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
        up = (action == 2) | (action == 6) | (action == 7) | (
            action == 10) | (action == 14) | (action == 15)
        right = (action == 3) | (action == 6) | (action == 8) | (
            action == 11) | (action == 14) | (action == 16)
        left = (action == 4) | (action == 7) | (action == 9) | (
            action == 12) | (action == 15) | (action == 17)
        pang = g["pang"] + 0.12 * (
            right.astype(jnp.float32) - left.astype(jnp.float32)
        )
        thrust = up.astype(jnp.float32) * 0.12
        pvx = jnp.clip(g["pvx"] + thrust * jnp.cos(pang), -2.0, 2.0)
        pvy = jnp.clip(g["pvy"] + thrust * jnp.sin(pang), -2.0, 2.0)
        px = jnp.mod(g["px"] + pvx, jnp.float32(RAW_W))
        py = 30.0 + jnp.mod(g["py"] + pvy - 30.0, 170.0)

        rock = g["rock"] + g["rvel"]
        rock = rock.at[:, 0].set(jnp.mod(rock[:, 0], jnp.float32(RAW_W)))
        rock = rock.at[:, 1].set(30.0 + jnp.mod(rock[:, 1] - 30.0, 170.0))

        # Shots march; spawn from the nose on fire.
        shot = g["shot"] + g["svel"]
        slive = g["slive"] & (shot[:, 1] > 25.0) & (shot[:, 1] < 205.0)
        can_f = fire & (g["cool"] == 0)
        free = jnp.argmin(slive)
        spawn = can_f & ~slive[free]
        nose = jnp.stack([px + 6 * jnp.cos(pang), py + 6 * jnp.sin(pang)])
        shot = jnp.where(
            (jnp.arange(_AS_SHOTS) == free)[:, None] & spawn, nose, shot
        )
        svel = jnp.where(
            (jnp.arange(_AS_SHOTS) == free)[:, None] & spawn,
            3.2 * jnp.stack([jnp.cos(pang), jnp.sin(pang)]),
            g["svel"],
        )
        slive = slive | ((jnp.arange(_AS_SHOTS) == free) & spawn)

        # Shot-rock hits: big rocks split into two smalls (reuse slots).
        rsize = jnp.where(g["rbig"], 9.0, 5.0)
        d = jnp.linalg.norm(
            shot[:, None, :] - rock[None, :, :], axis=-1
        )  # [S, R]
        hit = slive[:, None] & g["ralive"][None, :] & (d < rsize[None, :])
        rock_hit = hit.any(0)
        shot_used = hit.any(1)
        reward = jnp.sum(
            rock_hit & g["rbig"]) * 20.0 + jnp.sum(rock_hit & ~g["rbig"]
        ) * 50.0
        slive = slive & ~shot_used
        # Splitting: a hit big rock becomes small + awakens one dead slot.
        was_big = rock_hit & g["rbig"]
        rbig = g["rbig"] & ~was_big
        ralive = g["ralive"] & ~(rock_hit & ~g["rbig"])
        n_spawn = jnp.sum(was_big)
        dead_order = jnp.cumsum(~ralive) * (~ralive)
        wake = (~ralive) & (dead_order <= n_spawn) & (dead_order > 0)
        src = jnp.argmax(was_big)
        rock = jnp.where(wake[:, None], rock[src][None, :], rock)
        kv = jax.random.split(key)[0]
        ang2 = jax.random.uniform(kv, (_AS_N,), jnp.float32, 0, 2 * np.pi)
        rvel = jnp.where(
            wake[:, None],
            1.2 * jnp.stack([jnp.cos(ang2), jnp.sin(ang2)], 1),
            g["rvel"],
        )
        ralive = ralive | wake
        rbig = rbig & ~wake

        # Rock-ship collision.
        pd = jnp.linalg.norm(rock - jnp.stack([px, py]), axis=-1)
        crash = (g["inv"] == 0) & jnp.any(ralive & (pd < rsize + 3.0))
        lives = g["lives"] - crash.astype(jnp.int32)
        px = jnp.where(crash, RAW_W / 2, px)
        py = jnp.where(crash, 105.0, py)
        pvx = jnp.where(crash, 0.0, pvx)
        pvy = jnp.where(crash, 0.0, pvy)

        # Field cleared → new wave of 4 big rocks.
        clear = ~jnp.any(ralive)
        reward = reward + jnp.where(clear, 100.0, 0.0)
        ralive = ralive | (clear & (jnp.arange(_AS_N) < 4))
        rbig = jnp.where(clear, jnp.arange(_AS_N) < 4, rbig)

        g2 = {
            "px": px, "py": py, "pvx": pvx, "pvy": pvy, "pang": pang,
            "rock": rock, "rvel": rvel, "ralive": ralive, "rbig": rbig,
            "shot": shot, "svel": svel, "slive": slive,
            "cool": jnp.where(spawn, 6, jnp.maximum(g["cool"] - 1, 0)),
            "inv": jnp.where(
                crash, 60, jnp.maximum(g["inv"] - 1, 0)
            ).astype(jnp.int32),
            "lives": lives,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.zeros((RAW_H, RAW_W), jnp.float32)
        rsize = jnp.where(g["rbig"], 9.0, 5.0)
        for i in range(_AS_N):
            rk = (
                g["ralive"][i]
                & (jnp.abs(rows - g["rock"][i, 1]) < rsize[i])
                & (jnp.abs(cols - g["rock"][i, 0]) < rsize[i])
            )
            frame = jnp.where(rk, 150.0, frame)
        for i in range(_AS_SHOTS):
            sh = (
                g["slive"][i]
                & (jnp.abs(rows - g["shot"][i, 1]) < 2)
                & (jnp.abs(cols - g["shot"][i, 0]) < 2)
            )
            frame = jnp.where(sh, 255.0, frame)
        ship = (jnp.abs(rows - g["py"]) < 4) & (jnp.abs(cols - g["px"]) < 4)
        nose = (
            (jnp.abs(rows - (g["py"] + 5 * jnp.sin(g["pang"]))) < 2)
            & (jnp.abs(cols - (g["px"] + 5 * jnp.cos(g["pang"]))) < 2)
        )
        frame = jnp.where(ship | nose, 230.0, frame)
        return frame

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray, gray])


class AsteroidsEnv(ArcadeEnv):
    GAME_CLS = AsteroidsGame


# ---------------------------------------------------------------------------
# Defender: horizontally scrolling shooter; landers dive at humanoids.
# ---------------------------------------------------------------------------

_DF_N = 8


class DefenderGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        ex = jax.random.uniform(k1, (_DF_N,), jnp.float32, 0.0, RAW_W)
        ey = jax.random.uniform(k2, (_DF_N,), jnp.float32, 40.0, 120.0)
        return {
            "px": jnp.float32(40.0), "py": jnp.float32(100.0),
            "facing": jnp.float32(1.0),
            "ex": ex, "ey": ey,
            "elive": jnp.ones((_DF_N,), bool),
            "beam": jnp.float32(-1.0),  # beam age; <0 = off
            "beam_y": jnp.float32(0.0),
            "beam_x": jnp.float32(0.0),
            "beam_dir": jnp.float32(1.0),
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
        up = (action == 2) | (action == 6) | (action == 7) | (
            action == 10) | (action == 14) | (action == 15)
        down = (action == 5) | (action == 8) | (action == 9) | (
            action == 13) | (action == 16) | (action == 17)
        right = (action == 3) | (action == 6) | (action == 8) | (
            action == 11) | (action == 14) | (action == 16)
        left = (action == 4) | (action == 7) | (action == 9) | (
            action == 12) | (action == 15) | (action == 17)
        px = jnp.clip(
            g["px"] + 2.5 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            8.0, RAW_W - 8.0,
        )
        py = jnp.clip(
            g["py"] + 2.0 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            35.0, 185.0,
        )
        facing = jnp.where(right, 1.0, jnp.where(left, -1.0, g["facing"]))

        # Landers drift toward the player.
        spd = 0.5 + 0.1 * g["wave"].astype(jnp.float32)
        ex = g["ex"] + jnp.sign(px - g["ex"]) * spd * 0.7
        ey = g["ey"] + jnp.sign(py - g["ey"]) * spd * 0.4

        # Horizontal beam: spawn on fire, advance 6 px/frame, 12-frame life.
        beam_on = g["beam"] >= 0.0
        can_f = fire & ~beam_on
        beam_x = jnp.where(can_f, px, g["beam_x"] + g["beam_dir"] * 6.0)
        beam_y = jnp.where(can_f, py, g["beam_y"])
        beam_dir = jnp.where(can_f, facing, g["beam_dir"])
        beam = jnp.where(
            can_f, 0.0, jnp.where(beam_on, g["beam"] + 1.0, -1.0)
        )
        beam = jnp.where(beam > 12.0, -1.0, beam)
        beam_live = beam >= 0.0

        hit = (
            g["elive"] & beam_live
            & (jnp.abs(ey - beam_y) < 6.0)
            & (jnp.abs(ex - beam_x) < 10.0)
        )
        first = jnp.argmax(hit)
        any_hit = jnp.any(hit)
        elive = g["elive"] & ~((jnp.arange(_DF_N) == first) & any_hit)
        reward = jnp.where(any_hit, 15.0, 0.0)
        beam = jnp.where(any_hit, -1.0, beam)

        # Lander touch kills.
        caught = jnp.any(
            elive & (jnp.abs(ex - px) < 6.0) & (jnp.abs(ey - py) < 6.0)
        )
        lives = g["lives"] - caught.astype(jnp.int32)
        px = jnp.where(caught, 40.0, px)
        py = jnp.where(caught, 100.0, py)

        clear = ~jnp.any(elive)
        reward = reward + jnp.where(clear, 100.0, 0.0)
        kv1, kv2 = jax.random.split(key)
        ex = jnp.where(
            clear, jax.random.uniform(kv1, (_DF_N,), jnp.float32, 0, RAW_W),
            ex,
        )
        ey = jnp.where(
            clear,
            jax.random.uniform(kv2, (_DF_N,), jnp.float32, 40.0, 120.0),
            ey,
        )
        elive = elive | clear

        g2 = {
            "px": px, "py": py, "facing": facing,
            "ex": ex, "ey": ey, "elive": elive,
            "beam": beam, "beam_y": beam_y, "beam_x": beam_x,
            "beam_dir": beam_dir,
            "wave": g["wave"] + clear.astype(jnp.int32),
            "lives": lives,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 20.0, jnp.float32)
        ground = rows > 190
        frame = jnp.where(ground, 70.0, frame)
        for i in range(_DF_N):
            e = (
                g["elive"][i]
                & (jnp.abs(rows - g["ey"][i]) < 5)
                & (jnp.abs(cols - g["ex"][i]) < 5)
            )
            frame = jnp.where(e, 170.0, frame)
        beam = (
            (g["beam"] >= 0.0)
            & (jnp.abs(rows - g["beam_y"]) < 2)
            & (jnp.abs(cols - g["beam_x"]) < 8)
        )
        frame = jnp.where(beam, 255.0, frame)
        ship = (jnp.abs(rows - g["py"]) < 4) & (jnp.abs(cols - g["px"]) < 7)
        return jnp.where(ship, 240.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.6, gray, gray * 0.8])


class DefenderEnv(ArcadeEnv):
    GAME_CLS = DefenderGame


# ---------------------------------------------------------------------------
# KungFuMaster: walk the corridor, strike grippers from both sides.
# ---------------------------------------------------------------------------

_KF_N = 6


class KungFuMasterGame(ArcadeGame):
    action_set_size = 18  # ALE minimal is 14
    has_fire = True

    def init(self, key):
        side = jax.random.uniform(key, (_KF_N,)) < 0.5
        ex = jnp.where(
            side, jnp.float32(-10.0), jnp.float32(RAW_W + 10.0)
        ) + jax.random.uniform(key, (_KF_N,), jnp.float32, -40.0, 40.0)
        return {
            "px": jnp.float32(RAW_W / 2),
            "ex": ex,
            "elive": jnp.ones((_KF_N,), bool),
            "strike": jnp.int32(0),   # frames of active strike
            "health": jnp.float32(30.0),
            "timer": jnp.int32(3000),
            "lives": jnp.int32(3),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return (g["lives"] <= 0) | (g["timer"] <= 0)

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 10)
        right = (action == 3) | (action == 6) | (action == 8) | (
            action == 11) | (action == 14) | (action == 16)
        left = (action == 4) | (action == 7) | (action == 9) | (
            action == 12) | (action == 15) | (action == 17)
        px = jnp.clip(
            g["px"] + 1.8 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            8.0, RAW_W - 8.0,
        )
        # Grippers close in on the player.
        ex = g["ex"] + jnp.sign(px - g["ex"]) * 1.0
        strike = jnp.where(
            fire & (g["strike"] == 0), 4, jnp.maximum(g["strike"] - 1, 0)
        )
        striking = strike > 0
        hit = g["elive"] & striking & (jnp.abs(ex - px) < 12.0)
        reward = jnp.sum(hit) * 20.0
        elive = g["elive"] & ~hit
        # Grabbed: enemies in contact drain health.
        grabbed = jnp.sum(g["elive"] & (jnp.abs(ex - px) < 5.0))
        health = g["health"] - 0.2 * grabbed.astype(jnp.float32)
        died = health <= 0.0
        lives = g["lives"] - died.astype(jnp.int32)
        health = jnp.where(died, 30.0, health)
        # Respawn downed grippers from a random side.
        kv = jax.random.split(key)[0]
        side = jax.random.uniform(kv, (_KF_N,)) < 0.5
        fresh = jnp.where(side, -10.0, RAW_W + 10.0)
        respawn = ~elive & (jax.random.uniform(key, (_KF_N,)) < 0.03)
        ex = jnp.where(respawn, fresh, ex)
        elive = elive | respawn
        g2 = {
            "px": px, "ex": ex, "elive": elive,
            "strike": strike.astype(jnp.int32),
            "health": health,
            "timer": g["timer"] - 1,
            "lives": lives,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 30.0, jnp.float32)
        floor = rows > 160
        frame = jnp.where(floor, 60.0, frame)
        for i in range(_KF_N):
            e = (
                g["elive"][i]
                & (jnp.abs(rows - 140.0) < 16)
                & (jnp.abs(cols - g["ex"][i]) < 4)
            )
            frame = jnp.where(e, 150.0, frame)
        pl = (jnp.abs(rows - 140.0) < 18) & (jnp.abs(cols - g["px"]) < 4)
        frame = jnp.where(pl, 250.0, frame)
        arm = (
            (g["strike"] > 0)
            & (jnp.abs(rows - 136.0) < 3)
            & (jnp.abs(cols - g["px"]) < 13)
        )
        frame = jnp.where(arm, 255.0, frame)
        bar = (rows < 8) & (cols < g["health"] * (RAW_W / 30.0))
        return jnp.where(bar, 220.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.8, gray * 0.5])


class KungFuMasterEnv(ArcadeEnv):
    GAME_CLS = KungFuMasterGame


# ---------------------------------------------------------------------------
# PrivateEye: drive the avenue, collect clues, dodge thrown bottles.
# ---------------------------------------------------------------------------

_PE_ITEMS = 5
_PE_BOTTLES = 4


class PrivateEyeGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        ix = jax.random.uniform(
            k1, (_PE_ITEMS,), jnp.float32, 20.0, RAW_W - 20.0
        )
        bx = jax.random.uniform(k2, (_PE_BOTTLES,), jnp.float32, 0, RAW_W)
        by = jax.random.uniform(k3, (_PE_BOTTLES,), jnp.float32, 30.0, 60.0)
        return {
            "px": jnp.float32(20.0),
            "py": jnp.float32(150.0),  # 150 = street, can hop (jump)
            "jump": jnp.int32(0),
            "ix": ix,
            "ilive": jnp.ones((_PE_ITEMS,), bool),
            "bx": bx, "by": by,
            "stun": jnp.int32(0),
            "timer": jnp.int32(4000),
            "score": jnp.int32(0),
            "clues": jnp.int32(0),
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return g["timer"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        up = (action == 2) | (action == 6) | (action == 7) | (action == 10)
        right = (action == 3) | (action == 6) | (action == 8) | (
            action == 11) | (action == 14) | (action == 16)
        left = (action == 4) | (action == 7) | (action == 9) | (
            action == 12) | (action == 15) | (action == 17)
        stunned = g["stun"] > 0
        vx = jnp.where(
            stunned, 0.0,
            3.0 * (right.astype(jnp.float32) - left.astype(jnp.float32)),
        )
        px = jnp.mod(g["px"] + vx, jnp.float32(RAW_W))
        jump = jnp.where(
            up & (g["jump"] == 0) & ~stunned, 14, jnp.maximum(g["jump"] - 1, 0)
        )
        py = jnp.where(jump > 7, 150.0 - 3.0 * (14 - jump), 150.0 - 3.0 * jump)

        # Clues: touch to collect.
        got = g["ilive"] & (jnp.abs(g["ix"] - px) < 7.0) & (py > 140.0)
        reward = jnp.sum(got) * 100.0
        ilive = g["ilive"] & ~got
        clues = g["clues"] + jnp.sum(got).astype(jnp.int32)
        # All clues → case closed bonus, new set.
        closed = ~jnp.any(ilive)
        reward = reward + jnp.where(closed, 500.0, 0.0)
        kv = jax.random.split(key)[0]
        ix = jnp.where(
            closed,
            jax.random.uniform(
                kv, (_PE_ITEMS,), jnp.float32, 20.0, RAW_W - 20.0
            ),
            g["ix"],
        )
        ilive = ilive | closed

        # Bottles arc down; hit → stun + penalty.
        by = g["by"] + 2.0
        bx = g["bx"]
        respawn = by > 200.0
        k1, k2 = jax.random.split(key)
        bx = jnp.where(
            respawn, jax.random.uniform(k1, (_PE_BOTTLES,), jnp.float32,
                                        0, RAW_W), bx
        )
        by = jnp.where(
            respawn,
            jax.random.uniform(k2, (_PE_BOTTLES,), jnp.float32, 30.0, 60.0),
            by,
        )
        struck = (~stunned) & jnp.any(
            (jnp.abs(bx - px) < 5.0) & (jnp.abs(by - py) < 8.0)
        )
        reward = reward - jnp.where(struck, 100.0, 0.0)
        g2 = {
            "px": px, "py": py, "jump": jump.astype(jnp.int32),
            "ix": ix, "ilive": ilive,
            "bx": bx, "by": by,
            "stun": jnp.where(
                struck, 20, jnp.maximum(g["stun"] - 1, 0)
            ).astype(jnp.int32),
            "timer": g["timer"] - 1,
            "score": g["score"] + reward.astype(jnp.int32),
            "clues": clues,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 40.0, jnp.float32)
        street = rows > 158
        frame = jnp.where(street, 90.0, frame)
        for i in range(_PE_ITEMS):
            it = (
                g["ilive"][i]
                & (jnp.abs(rows - 152.0) < 4)
                & (jnp.abs(cols - g["ix"][i]) < 4)
            )
            frame = jnp.where(it, 220.0, frame)
        for i in range(_PE_BOTTLES):
            bt = (
                (jnp.abs(rows - g["by"][i]) < 3)
                & (jnp.abs(cols - g["bx"][i]) < 3)
            )
            frame = jnp.where(bt, 170.0, frame)
        pl = (jnp.abs(rows - g["py"]) < 8) & (jnp.abs(cols - g["px"]) < 5)
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.8, gray * 0.7, gray])


class PrivateEyeEnv(ArcadeEnv):
    GAME_CLS = PrivateEyeGame


# ---------------------------------------------------------------------------
# Robotank: rotate the turret; enemy tanks cross the crosshair band.
# ---------------------------------------------------------------------------

_RT_N = 5


class RobotankGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        bearing = jax.random.uniform(
            k1, (_RT_N,), jnp.float32, -np.pi, np.pi
        )
        rng = jax.random.uniform(k2, (_RT_N,), jnp.float32, 40.0, 120.0)
        return {
            "heading": jnp.float32(0.0),
            "eb": bearing,      # enemy bearing (world)
            "er": rng,          # enemy range
            "elive": jnp.ones((_RT_N,), bool),
            "cool": jnp.int32(0),
            "squad": jnp.int32(0),   # squadrons destroyed
            "damage": jnp.int32(0),  # 4 hits kills the tank
            "lives": jnp.int32(1),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["damage"] >= 4

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 10)
        right = (action == 3) | (action == 6) | (action == 8) | (
            action == 11) | (action == 14) | (action == 16)
        left = (action == 4) | (action == 7) | (action == 9) | (
            action == 12) | (action == 15) | (action == 17)
        up = (action == 2) | (action == 6) | (action == 7) | (action == 10)
        heading = g["heading"] + 0.05 * (
            right.astype(jnp.float32) - left.astype(jnp.float32)
        )
        # Driving forward closes the range on targets near the crosshair.
        rel = jnp.mod(g["eb"] - heading + np.pi, 2 * np.pi) - np.pi
        closing = up.astype(jnp.float32) * jnp.where(
            jnp.abs(rel) < 0.5, 0.8, -0.2
        )
        er = jnp.clip(g["er"] - closing - 0.1, 15.0, 150.0)
        # Enemies strafe slowly.
        kv = jax.random.split(key)[0]
        eb = g["eb"] + jax.random.uniform(
            kv, (_RT_N,), jnp.float32, -0.02, 0.02
        )
        # Fire: hit if an enemy sits in the crosshair cone.
        can_f = fire & (g["cool"] == 0)
        aim = g["elive"] & (jnp.abs(rel) < 0.08)
        tgt = jnp.argmax(aim * (150.0 - er))
        hit = can_f & jnp.any(aim)
        elive = g["elive"] & ~((jnp.arange(_RT_N) == tgt) & hit)
        reward = jnp.where(hit, 1.0, 0.0)  # Robotank scores tanks
        # Enemy shots: close-range enemies land hits occasionally.
        shot_in = jnp.any(
            elive & (er < 35.0)
            & (jax.random.uniform(key, (_RT_N,)) < 0.01)
        )
        damage = g["damage"] + shot_in.astype(jnp.int32)
        # Squadron (all 5 down) → bonus + fresh squad.
        clear = ~jnp.any(elive)
        reward = reward + jnp.where(clear, 10.0, 0.0)
        k1, k2 = jax.random.split(kv)
        eb = jnp.where(
            clear,
            jax.random.uniform(k1, (_RT_N,), jnp.float32, -np.pi, np.pi),
            eb,
        )
        er = jnp.where(
            clear,
            jax.random.uniform(k2, (_RT_N,), jnp.float32, 40.0, 120.0),
            er,
        )
        elive = elive | clear
        g2 = {
            "heading": heading, "eb": eb, "er": er, "elive": elive,
            "cool": jnp.where(can_f, 8, jnp.maximum(g["cool"] - 1, 0)),
            "squad": g["squad"] + clear.astype(jnp.int32),
            "damage": damage,
            "lives": g["lives"],
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 50.0, jnp.float32)
        sky = rows < 100
        frame = jnp.where(sky, 110.0, frame)
        rel = jnp.mod(g["eb"] - g["heading"] + np.pi, 2 * np.pi) - np.pi
        sx = RAW_W / 2 + rel * (RAW_W / 2.4)
        size = jnp.clip(900.0 / g["er"], 3.0, 18.0)
        for i in range(_RT_N):
            e = (
                g["elive"][i]
                & (jnp.abs(rows - 115.0) < size[i] * 0.6)
                & (jnp.abs(cols - sx[i]) < size[i])
                & (jnp.abs(rel[i]) < 1.3)
            )
            frame = jnp.where(e, 180.0, frame)
        cross = (
            ((jnp.abs(cols - RAW_W / 2) < 1) & (jnp.abs(rows - 115.0) < 10))
            | ((jnp.abs(rows - 115.0) < 1) & (jnp.abs(cols - RAW_W / 2) < 10))
        )
        frame = jnp.where(cross, 255.0, frame)
        # Damage pips.
        pips = (rows > RAW_H - 8) & (
            cols < g["damage"].astype(jnp.float32) * 12.0
        )
        return jnp.where(pips, 230.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.7, gray, gray * 0.6])


class RobotankEnv(ArcadeEnv):
    GAME_CLS = RobotankGame
