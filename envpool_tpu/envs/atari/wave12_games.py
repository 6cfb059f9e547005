"""Arcade wave 12: Adventure, Superman, Earthworld, HauntedHouse,
SirLancelot, KingKong — first wave of the non-57 ALE roster.

Behavioral reference: the corresponding ALE ROMs registered by
``envpool/atari/registration.py:21-35``; like earlier waves these are
faithful-behavior cores under honest ``XxxLite-v5`` ids (README.md's
Lite-core caveat applies: same task structure and reward conventions,
not per-pixel ALE behavior — the real-emulation drop-ins are the
``Machine2600/*`` ids).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame
from .wave3_games import _freeze_when, _grids


def _joy(action):
    """(up, down, left, right, fire) bools from an ALE action id."""
    a = action
    fire = (a == 1) | (a >= 10)
    up = (a == 2) | (a == 6) | (a == 7) | (a == 10) | (a == 14) | (a == 15)
    down = (a == 5) | (a == 8) | (a == 9) | (a == 13) | (a == 16) | (a == 17)
    right = (a == 3) | (a == 6) | (a == 8) | (a == 11) | (a == 14) | (a == 16)
    left = (a == 4) | (a == 7) | (a == 9) | (a == 12) | (a == 15) | (a == 17)
    return up, down, left, right, fire


# ---------------------------------------------------------------------------
# Adventure: fetch the chalice from the far castle, bring it home,
# while a dragon roams the kingdom; the key unlocks the castle gate.
# ---------------------------------------------------------------------------


class AdventureGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    # World: 3 screens side by side on one long strip [0, 3*RAW_W).
    # Home gate at x~20, key mid-strip, locked castle at the far end.

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "px": jnp.float32(30.0), "py": jnp.float32(105.0),
            "dx": jax.random.uniform(k1, (), jnp.float32, 200.0, 300.0),
            "dy": jax.random.uniform(k2, (), jnp.float32, 60.0, 150.0),
            "d_alive": jnp.bool_(True),
            "has_key": jnp.bool_(False),
            "gate_open": jnp.bool_(False),
            "has_chalice": jnp.bool_(False),
            "won": jnp.bool_(False),
            "dead": jnp.bool_(False),
        }

    def lives(self, g):
        return 1 - g["dead"].astype(jnp.int32)

    def over(self, g):
        return g["won"] | g["dead"]

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        spd = 2.2
        px = jnp.clip(
            g["px"] + spd * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            6.0, 3.0 * RAW_W - 6.0,
        )
        py = jnp.clip(
            g["py"] + spd * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            30.0, 190.0,
        )
        key_x, key_y = 1.5 * RAW_W, 170.0
        got_key = g["has_key"] | (
            (jnp.abs(px - key_x) < 8.0) & (jnp.abs(py - key_y) < 8.0)
        )
        gate_x = 3.0 * RAW_W - 30.0
        gate_open = g["gate_open"] | (
            got_key & (jnp.abs(px - gate_x) < 12.0) & (py < 80.0)
        )
        chal = g["has_chalice"] | (
            gate_open & (jnp.abs(px - gate_x) < 10.0) & (py < 55.0)
        )
        # Dragon homes in on the player (slower; sword touch kills it).
        ddx = jnp.sign(px - g["dx"]) * 1.1
        ddy = jnp.sign(py - g["dy"]) * 0.9
        dx = jnp.where(g["d_alive"], g["dx"] + ddx, g["dx"])
        dy = jnp.where(g["d_alive"], g["dy"] + ddy, g["dy"])
        near_d = (jnp.abs(px - dx) < 7.0) & (jnp.abs(py - dy) < 7.0)
        slain = g["d_alive"] & near_d & fire
        d_alive = g["d_alive"] & ~slain
        eaten = g["d_alive"] & ~slain & near_d
        won = chal & (px < 35.0)
        reward = jnp.where(won & ~g["won"], 1.0, 0.0) - jnp.where(
            eaten, 1.0, 0.0
        )
        g2 = {
            "px": px, "py": py, "dx": dx, "dy": dy, "d_alive": d_alive,
            "has_key": got_key, "gate_open": gate_open,
            "has_chalice": chal, "won": won,
            "dead": g["dead"] | eaten,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        # Camera: the screen the player is on.
        screen = jnp.floor(g["px"] / RAW_W)
        ox = screen * RAW_W
        frame = jnp.full((RAW_H, RAW_W), 20.0, jnp.float32)

        def blob(frame, wx, wy, h, w, v, cond=True):
            m = (
                (jnp.abs(rows - wy) < h)
                & (jnp.abs(cols - (wx - ox)) < w)
                & (wx >= ox) & (wx < ox + RAW_W)
            )
            return jnp.where(jnp.logical_and(m, cond), v, frame)

        frame = blob(frame, 20.0, 60.0, 30, 14, 90.0)          # home castle
        frame = blob(frame, 3.0 * RAW_W - 30.0, 60.0, 30, 14, 120.0)
        frame = blob(frame, 1.5 * RAW_W, 170.0, 4, 4, 220.0,
                     ~g["has_key"])                            # key
        frame = blob(frame, g["dx"], g["dy"], 8, 6, 170.0, g["d_alive"])
        frame = blob(frame, g["px"], g["py"], 4, 3, 255.0)     # avatar
        frame = blob(frame, g["px"], g["py"] - 8.0, 3, 2, 240.0,
                     g["has_chalice"])
        return frame

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.9, gray, gray * 0.5])


class AdventureEnv(ArcadeEnv):
    GAME_CLS = AdventureGame


# ---------------------------------------------------------------------------
# Superman: fly the city strip, catch crooks, carry them to jail;
# kryptonite satellites sap flight until Lois (touch) restores it.
# ---------------------------------------------------------------------------

_SU_N = 3  # crooks


class SupermanGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "px": jnp.float32(30.0), "py": jnp.float32(100.0),
            "cx": jax.random.uniform(k1, (_SU_N,), jnp.float32,
                                     80.0, 3.0 * RAW_W - 20.0),
            "cy": jax.random.uniform(k2, (_SU_N,), jnp.float32, 60.0, 180.0),
            "cvx": jnp.where(
                jax.random.bernoulli(k3, 0.5, (_SU_N,)), 0.8, -0.8
            ),
            "caught": jnp.zeros((_SU_N,), bool),
            "jailed": jnp.zeros((_SU_N,), bool),
            "carrying": jnp.int32(-1),
            "kx": jnp.float32(2.0 * RAW_W),
            "ky": jnp.float32(60.0),
            "weak": jnp.bool_(False),
            "steps": jnp.int32(0),
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return jnp.all(g["jailed"])

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        spd = jnp.where(g["weak"], 1.0, 3.0)
        px = jnp.clip(
            g["px"] + spd * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            6.0, 3.0 * RAW_W - 6.0,
        )
        py = jnp.clip(
            g["py"] + spd * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            30.0, 190.0,
        )
        cx = g["cx"] + jnp.where(g["caught"] | g["jailed"], 0.0, g["cvx"])
        cvx = jnp.where(
            (cx < 20.0) | (cx > 3.0 * RAW_W - 20.0), -g["cvx"], g["cvx"]
        )
        cx = jnp.clip(cx, 20.0, 3.0 * RAW_W - 20.0)
        # Kryptonite satellite orbits the strip; touching it weakens.
        kx = (g["kx"] + 1.7) % (3.0 * RAW_W)
        near_k = (jnp.abs(px - kx) < 8.0) & (jnp.abs(py - g["ky"]) < 8.0)
        # Lois at home pad cures weakness.
        cured = (px < 40.0) & (py > 160.0)
        weak = (g["weak"] | near_k) & ~cured
        # Catch a crook (one at a time, only at full strength).
        free = ~g["caught"] & ~g["jailed"]
        touch = free & (jnp.abs(cx - px) < 7.0) & (jnp.abs(g["cy"] - py) < 9.0)
        can_catch = (g["carrying"] < 0) & ~weak
        first = jnp.argmax(touch)
        grab = can_catch & jnp.any(touch)
        caught = g["caught"] | (
            (jnp.arange(_SU_N) == first) & grab
        )
        carrying = jnp.where(grab, first, g["carrying"])
        # Carried crook rides along; jail pad at strip start, upper band.
        cx = jnp.where(
            (jnp.arange(_SU_N) == carrying) & (carrying >= 0), px, cx
        )
        cy = jnp.where(
            (jnp.arange(_SU_N) == carrying) & (carrying >= 0), py, g["cy"]
        )
        at_jail = (px < 40.0) & (py < 60.0)
        drop = (carrying >= 0) & at_jail
        jailed = g["jailed"] | (
            (jnp.arange(_SU_N) == carrying) & drop
        )
        reward = jnp.where(drop, 100.0, 0.0)
        carrying = jnp.where(drop, -1, carrying)
        g2 = {
            "px": px, "py": py, "cx": cx, "cy": cy, "cvx": cvx,
            "caught": caught, "jailed": jailed, "carrying": carrying,
            "kx": kx, "ky": g["ky"], "weak": weak,
            "steps": g["steps"] + 1,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        screen = jnp.floor(g["px"] / RAW_W)
        ox = screen * RAW_W
        frame = jnp.full((RAW_H, RAW_W), 28.0, jnp.float32)

        def blob(frame, wx, wy, h, w, v, cond=True):
            m = (
                (jnp.abs(rows - wy) < h)
                & (jnp.abs(cols - (wx - ox)) < w)
                & (wx >= ox) & (wx < ox + RAW_W)
            )
            return jnp.where(jnp.logical_and(m, cond), v, frame)

        frame = blob(frame, 25.0, 45.0, 18, 12, 70.0)   # jail
        for i in range(_SU_N):
            frame = blob(frame, g["cx"][i], g["cy"][i], 5, 3, 150.0,
                         ~g["jailed"][i])
        frame = blob(frame, g["kx"], g["ky"], 4, 4, 200.0)
        v = jnp.where(g["weak"], 120.0, 255.0)
        frame = blob(frame, g["px"], g["py"], 6, 4, v)
        return frame

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.5, gray * 0.6])


class SupermanEnv(ArcadeEnv):
    GAME_CLS = SupermanGame


# ---------------------------------------------------------------------------
# Earthworld (Swordquest): room grid; in each room, stand on the
# revealed sigil tile while it glows to claim it, in order.
# ---------------------------------------------------------------------------

_EW_ROOMS = 5


class EarthworldGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        ks = jax.random.split(key, 2)
        sx = jax.random.uniform(ks[0], (_EW_ROOMS,), jnp.float32,
                                25.0, RAW_W - 25.0)
        sy = jax.random.uniform(ks[1], (_EW_ROOMS,), jnp.float32,
                                60.0, 170.0)
        return {
            "room": jnp.int32(0),
            "px": jnp.float32(RAW_W / 2), "py": jnp.float32(120.0),
            "sx": sx, "sy": sy,
            "claimed": jnp.zeros((_EW_ROOMS,), bool),
            "phase": jnp.int32(0),   # glow clock
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return jnp.all(g["claimed"])

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        px = g["px"] + 2.5 * (right.astype(jnp.float32)
                              - left.astype(jnp.float32))
        py = jnp.clip(
            g["py"] + 2.5 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            40.0, 190.0,
        )
        # Walking off an edge moves one room along the ring.
        room = (
            g["room"]
            + (px > RAW_W - 4.0).astype(jnp.int32)
            - (px < 4.0).astype(jnp.int32)
        ) % _EW_ROOMS
        px = jnp.where(px > RAW_W - 4.0, 6.0, px)
        px = jnp.where(px < 4.0, RAW_W - 6.0, px)
        phase = (g["phase"] + 1) % 120
        glowing = phase < 60
        # The NEXT unclaimed sigil (in order) is the only claimable one.
        nxt = jnp.argmin(g["claimed"].astype(jnp.int32))
        here = room == nxt
        on_sigil = (
            here & glowing
            & (jnp.abs(px - g["sx"][nxt]) < 7.0)
            & (jnp.abs(py - g["sy"][nxt]) < 7.0)
        )
        claim = on_sigil & fire
        claimed = g["claimed"] | (
            (jnp.arange(_EW_ROOMS) == nxt) & claim
        )
        reward = jnp.where(claim, 300.0, 0.0)
        g2 = {
            "room": room, "px": px, "py": py,
            "sx": g["sx"], "sy": g["sy"],
            "claimed": claimed, "phase": phase,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        base = 18.0 + 12.0 * g["room"].astype(jnp.float32)
        frame = jnp.full((RAW_H, RAW_W), base, jnp.float32)
        nxt = jnp.argmin(g["claimed"].astype(jnp.int32))
        glow = (g["phase"] < 60) & (g["room"] == nxt) & ~jnp.all(g["claimed"])
        sig = (
            (jnp.abs(rows - g["sy"][nxt]) < 6)
            & (jnp.abs(cols - g["sx"][nxt]) < 6)
        )
        frame = jnp.where(sig & glow, 220.0, frame)
        pl = (jnp.abs(rows - g["py"]) < 4) & (jnp.abs(cols - g["px"]) < 3)
        frame = jnp.where(pl, 255.0, frame)
        # HUD: room indicator (always visible) + claimed-sigil bar.
        room_bar = (rows < 5) & (
            cols < (g["room"] + 1).astype(jnp.float32) * 30.0
        )
        frame = jnp.where(room_bar, 140.0, frame)
        bar = (rows >= 5) & (rows < 9) & (
            cols < 160.0 * jnp.sum(g["claimed"]) / _EW_ROOMS
        )
        return jnp.where(bar, 200.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.7, gray, gray * 0.7])


class EarthworldEnv(ArcadeEnv):
    GAME_CLS = EarthworldGame


# ---------------------------------------------------------------------------
# HauntedHouse: pitch-dark mansion; gather the 3 urn pieces and get
# out the front door, with 9 lives and spooks that only show nearby.
# ---------------------------------------------------------------------------

_HH_PIECES = 3
_HH_SPOOKS = 2


class HauntedHouseGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "px": jnp.float32(20.0), "py": jnp.float32(180.0),
            "ux": jax.random.uniform(k1, (_HH_PIECES,), jnp.float32,
                                     20.0, RAW_W - 20.0),
            "uy": jax.random.uniform(k2, (_HH_PIECES,), jnp.float32,
                                     40.0, 170.0),
            "got": jnp.zeros((_HH_PIECES,), bool),
            "gx": jax.random.uniform(k3, (_HH_SPOOKS,), jnp.float32,
                                     40.0, RAW_W - 20.0),
            "gy": jax.random.uniform(k4, (_HH_SPOOKS,), jnp.float32,
                                     40.0, 170.0),
            "lives": jnp.int32(9),
            "lit": jnp.bool_(False),
            "won": jnp.bool_(False),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["won"] | (g["lives"] <= 0)

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        px = jnp.clip(
            g["px"] + 2.0 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            6.0, RAW_W - 6.0,
        )
        py = jnp.clip(
            g["py"] + 2.0 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            30.0, 190.0,
        )
        lit = fire  # striking a match lights the room this frame
        near_u = (
            ~g["got"]
            & (jnp.abs(g["ux"] - px) < 6.0)
            & (jnp.abs(g["uy"] - py) < 6.0)
        )
        got = g["got"] | (near_u & lit)
        reward = jnp.where(jnp.any(near_u & lit), 25.0, 0.0)
        # Spooks wander toward a lit player, away otherwise.
        drift = jnp.where(lit, 1.2, 0.5)
        gx = g["gx"] + jnp.sign(px - g["gx"]) * drift
        gy = g["gy"] + jnp.sign(py - g["gy"]) * drift
        hit = jnp.any((jnp.abs(gx - px) < 5.0) & (jnp.abs(gy - py) < 5.0))
        lives = g["lives"] - hit.astype(jnp.int32)
        # Touched: respawn at the door.
        px = jnp.where(hit, 20.0, px)
        py = jnp.where(hit, 180.0, py)
        won = jnp.all(got) & (px < 25.0) & (py > 170.0)
        reward = reward + jnp.where(won & ~g["won"], 500.0, 0.0)
        g2 = {
            "px": px, "py": py, "ux": g["ux"], "uy": g["uy"], "got": got,
            "gx": gx, "gy": gy, "lives": lives, "lit": lit, "won": won,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        # Darkness: only a halo near the player (wider when lit).
        r2 = (rows - g["py"]) ** 2 + (cols - g["px"]) ** 2
        radius = jnp.where(g["lit"], 45.0, 18.0)
        halo = r2 < radius**2
        frame = jnp.where(halo, 60.0, 5.0)
        for i in range(_HH_PIECES):
            u = (
                ~g["got"][i] & halo
                & (jnp.abs(rows - g["uy"][i]) < 4)
                & (jnp.abs(cols - g["ux"][i]) < 4)
            )
            frame = jnp.where(u, 230.0, frame)
        for i in range(_HH_SPOOKS):
            sp = (
                halo
                & (jnp.abs(rows - g["gy"][i]) < 6)
                & (jnp.abs(cols - g["gx"][i]) < 5)
            )
            frame = jnp.where(sp, 160.0, frame)
        eyes = (jnp.abs(rows - g["py"]) < 3) & (jnp.abs(cols - g["px"]) < 2)
        return jnp.where(eyes, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.6, gray * 0.6, gray])


class HauntedHouseEnv(ArcadeEnv):
    GAME_CLS = HauntedHouseGame


# ---------------------------------------------------------------------------
# SirLancelot: flap-powered jousting — dive on the dragon from above
# to strike; getting passed from above costs a knight.
# ---------------------------------------------------------------------------


class SirLancelotGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "px": jnp.float32(40.0), "py": jnp.float32(100.0),
            "pvy": jnp.float32(0.0),
            "ex": jnp.float32(RAW_W - 40.0), "ey": jnp.float32(100.0),
            "evx": jnp.float32(-1.4),
            "wave": jnp.int32(1),
            "lives": jnp.int32(3),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        # Flap physics: FIRE flaps up, gravity pulls down.
        pvy = jnp.clip(
            g["pvy"] + 0.35 - 1.4 * fire.astype(jnp.float32), -3.0, 3.0
        )
        py = jnp.clip(g["py"] + pvy, 30.0, 188.0)
        pvy = jnp.where((py <= 30.0) | (py >= 188.0), 0.0, pvy)
        px = jnp.clip(
            g["px"] + 2.0 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            8.0, RAW_W - 8.0,
        )
        # Dragon swoops horizontally with a slow sine bob.
        ex = g["ex"] + g["evx"] * (1.0 + 0.1 * g["wave"].astype(jnp.float32))
        evx = jnp.where((ex < 12.0) | (ex > RAW_W - 12.0), -g["evx"],
                        g["evx"])
        ex = jnp.clip(ex, 12.0, RAW_W - 12.0)
        ey = g["ey"] + jnp.sign(py - g["ey"]) * 0.6
        meet = (jnp.abs(px - ex) < 7.0) & (jnp.abs(py - ey) < 8.0)
        win = meet & (py < ey - 1.0)   # higher lance wins the pass
        lose = meet & ~win
        reward = jnp.where(win, 250.0 * g["wave"].astype(jnp.float32), 0.0)
        lives = g["lives"] - lose.astype(jnp.int32)
        # New dragon after a kill; respawn apart after a loss.
        k1, k2 = jax.random.split(key)
        ex = jnp.where(win | lose,
                       jax.random.uniform(k1, (), jnp.float32,
                                          RAW_W - 60.0, RAW_W - 15.0), ex)
        ey = jnp.where(win | lose,
                       jax.random.uniform(k2, (), jnp.float32, 50.0, 150.0),
                       ey)
        g2 = {
            "px": px, "py": py, "pvy": pvy,
            "ex": ex, "ey": ey, "evx": evx,
            "wave": g["wave"] + win.astype(jnp.int32),
            "lives": lives,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 22.0, jnp.float32)
        lava = rows > 192
        frame = jnp.where(lava, 110.0, frame)
        dr = (jnp.abs(rows - g["ey"]) < 7) & (jnp.abs(cols - g["ex"]) < 9)
        frame = jnp.where(dr, 170.0, frame)
        kn = (jnp.abs(rows - g["py"]) < 5) & (jnp.abs(cols - g["px"]) < 6)
        return jnp.where(kn, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.7, gray * 0.4])


class SirLancelotEnv(ArcadeEnv):
    GAME_CLS = SirLancelotGame


# ---------------------------------------------------------------------------
# KingKong: climb the girder rows to the top platform while bombs
# rain down; jumping clears a bomb for points.
# ---------------------------------------------------------------------------

_KK_ROWS = 6
_KK_BOMBS = 4


class KingKongGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "px": jnp.float32(RAW_W / 2), "row": jnp.int32(0),
            "jump": jnp.int32(0),
            "bx": jax.random.uniform(k1, (_KK_BOMBS,), jnp.float32,
                                     12.0, RAW_W - 12.0),
            "brow": jax.random.randint(k2, (_KK_BOMBS,), 1, _KK_ROWS),
            "bvx": jnp.asarray([1.3, -1.5, 1.1, -1.2], jnp.float32),
            "lives": jnp.int32(3),
            "rescued": jnp.bool_(False),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return (g["lives"] <= 0) | g["rescued"]

    @staticmethod
    def _row_y(row):
        return 185.0 - 26.0 * row.astype(jnp.float32)

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        px = jnp.clip(
            g["px"] + 2.3 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            8.0, RAW_W - 8.0,
        )
        # Ladders at alternating thirds of the row.
        ladder_x = jnp.where(g["row"] % 2 == 0, RAW_W * 0.75, RAW_W * 0.25)
        at_ladder = jnp.abs(px - ladder_x) < 6.0
        row = jnp.clip(
            g["row"]
            + (up & at_ladder).astype(jnp.int32)
            - (down & at_ladder).astype(jnp.int32),
            0, _KK_ROWS - 1,
        )
        jump = jnp.where(
            fire & (g["jump"] == 0), 8, jnp.maximum(g["jump"] - 1, 0)
        )
        # Bombs roll along their girder, wrapping at edges.
        bx = g["bx"] + g["bvx"]
        bvx = jnp.where((bx < 10.0) | (bx > RAW_W - 10.0), -g["bvx"],
                        g["bvx"])
        bx = jnp.clip(bx, 10.0, RAW_W - 10.0)
        same_row = g["brow"] == row
        close = same_row & (jnp.abs(bx - px) < 6.0)
        jumped = jnp.any(close) & (jump > 0)
        hit = jnp.any(close) & (jump == 0)
        reward = jnp.where(jumped, 25.0, 0.0)
        # Jumped bombs respawn on a random upper row.
        k1, k2 = jax.random.split(key)
        resp = close & jumped
        bx = jnp.where(
            resp,
            jax.random.uniform(k1, (_KK_BOMBS,), jnp.float32,
                               12.0, RAW_W - 12.0),
            bx,
        )
        brow = jnp.where(
            resp, jax.random.randint(k2, (_KK_BOMBS,), 1, _KK_ROWS),
            g["brow"],
        )
        lives = g["lives"] - hit.astype(jnp.int32)
        row = jnp.where(hit, 0, row)
        px = jnp.where(hit, RAW_W / 2, px)
        rescued = row >= _KK_ROWS - 1
        reward = reward + jnp.where(rescued & ~g["rescued"], 1000.0, 0.0)
        g2 = {
            "px": px, "row": row, "jump": jump,
            "bx": bx, "brow": brow, "bvx": bvx,
            "lives": lives, "rescued": rescued,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 12.0, jnp.float32)
        for r in range(_KK_ROWS):
            y = 185.0 - 26.0 * r
            gird = jnp.abs(rows - y - 6.0) < 2
            frame = jnp.where(gird, 80.0, frame)
            lx = RAW_W * 0.75 if r % 2 == 0 else RAW_W * 0.25
            lad = (
                (rows > y - 26.0) & (rows < y + 6.0)
                & (jnp.abs(cols - lx) < 3)
            )
            frame = jnp.where(lad, 120.0, frame)
        for i in range(_KK_BOMBS):
            y = self._row_y(g["brow"][i])
            bomb = (jnp.abs(rows - y) < 4) & (jnp.abs(cols - g["bx"][i]) < 4)
            frame = jnp.where(bomb, 190.0, frame)
        py = self._row_y(g["row"]) - jnp.where(g["jump"] > 0, 10.0, 0.0)
        pl = (jnp.abs(rows - py) < 5) & (jnp.abs(cols - g["px"]) < 4)
        return jnp.where(pl, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.8, gray * 0.5])


class KingKongEnv(ArcadeEnv):
    GAME_CLS = KingKongGame
