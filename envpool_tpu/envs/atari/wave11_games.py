"""Arcade wave 11: Solaris, Surround, Tutankham, VideoPinball,
YarsRevenge — completing the Atari-57 Lite roster.

Behavioral reference: the corresponding ALE games registered by
``envpool/atari/registration.py:21-35``; faithful-behavior cores under
``XxxLite-v5`` ids as in earlier waves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame
from .wave3_games import _freeze_when, _grids


# ---------------------------------------------------------------------------
# Solaris: cruise the quadrant, burn fuel, clear raider waves.
# ---------------------------------------------------------------------------

_SL_N = 6


class SolarisGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        ex = jax.random.uniform(k1, (_SL_N,), jnp.float32, 10.0, RAW_W - 10)
        ey = jax.random.uniform(k2, (_SL_N,), jnp.float32, 40.0, 140.0)
        return {
            "px": jnp.float32(RAW_W / 2), "py": jnp.float32(170.0),
            "ex": ex, "ey": ey,
            "evx": jnp.ones((_SL_N,)) * 0.9,
            "elive": jnp.ones((_SL_N,), bool),
            "shot_y": jnp.float32(-1.0),
            "shot_x": jnp.float32(0.0),
            "fuel": jnp.float32(100.0),
            "wave": jnp.int32(1),
            "lives": jnp.int32(3),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return (g["lives"] <= 0) | (g["fuel"] <= 0.0)

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
            g["px"] + 2.4 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            8.0, RAW_W - 8.0,
        )
        py = jnp.clip(
            g["py"] + 2.0 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            120.0, 190.0,
        )
        moving = up | down | left | right
        fuel = g["fuel"] - 0.02 - 0.03 * moving.astype(jnp.float32)

        # Raiders sweep sinusoidally and dive.
        ex = g["ex"] + g["evx"]
        bounce = (ex < 8.0) | (ex > RAW_W - 8.0)
        evx = jnp.where(bounce, -g["evx"], g["evx"])
        ex = jnp.clip(ex, 8.0, RAW_W - 8.0)
        ey = g["ey"] + 0.25

        # Single shot upward.
        live = g["shot_y"] >= 0.0
        can_f = fire & ~live
        shot_x = jnp.where(can_f, px, g["shot_x"])
        shot_y = jnp.where(can_f, py - 6.0, g["shot_y"] - 4.5)
        shot_y = jnp.where(shot_y < 20.0, -1.0, shot_y)
        s_live = shot_y >= 0.0
        hit = (
            g["elive"] & s_live
            & (jnp.abs(ex - shot_x) < 6.0)
            & (jnp.abs(ey - shot_y) < 6.0)
        )
        first = jnp.argmax(hit)
        any_hit = jnp.any(hit)
        elive = g["elive"] & ~((jnp.arange(_SL_N) == first) & any_hit)
        reward = jnp.where(any_hit, 50.0, 0.0)
        shot_y = jnp.where(any_hit, -1.0, shot_y)

        # Raider reaching the cruiser band destroys a ship.
        rammed = jnp.any(
            elive & (ey > py - 6.0) & (jnp.abs(ex - px) < 7.0)
        )
        lives = g["lives"] - rammed.astype(jnp.int32)
        ey = jnp.where(elive & (ey > 195.0), 40.0, ey)

        clear = ~jnp.any(elive)
        # Wave cleared: refuel + bonus.
        reward = reward + jnp.where(clear, 200.0, 0.0)
        fuel = jnp.where(clear, 100.0, fuel)
        k1, k2 = jax.random.split(key)
        ex = jnp.where(
            clear,
            jax.random.uniform(k1, (_SL_N,), jnp.float32, 10.0, RAW_W - 10),
            ex,
        )
        ey = jnp.where(
            clear,
            jax.random.uniform(k2, (_SL_N,), jnp.float32, 40.0, 140.0),
            ey,
        )
        elive = elive | clear
        g2 = {
            "px": px, "py": py, "ex": ex, "ey": ey, "evx": evx,
            "elive": elive,
            "shot_y": shot_y, "shot_x": shot_x,
            "fuel": fuel,
            "wave": g["wave"] + clear.astype(jnp.int32),
            "lives": lives,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 15.0, jnp.float32)
        for i in range(_SL_N):
            e = (
                g["elive"][i]
                & (jnp.abs(rows - g["ey"][i]) < 4)
                & (jnp.abs(cols - g["ex"][i]) < 5)
            )
            frame = jnp.where(e, 180.0, frame)
        sh = (
            (g["shot_y"] >= 0.0)
            & (jnp.abs(rows - g["shot_y"]) < 3)
            & (jnp.abs(cols - g["shot_x"]) < 1.5)
        )
        frame = jnp.where(sh, 255.0, frame)
        pl = (jnp.abs(rows - g["py"]) < 5) & (jnp.abs(cols - g["px"]) < 6)
        frame = jnp.where(pl, 240.0, frame)
        bar = (rows > RAW_H - 6) & (cols < g["fuel"] * (RAW_W / 100.0))
        return jnp.where(bar, 200.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.6, gray * 0.9])


class SolarisEnv(ArcadeEnv):
    GAME_CLS = SolarisGame


# ---------------------------------------------------------------------------
# Surround: tron-style wall trails; force the drone to crash first.
# ---------------------------------------------------------------------------

_SR_H, _SR_W = 20, 26


class SurroundGame(ArcadeGame):
    action_set_size = 5  # NOOP UP RIGHT LEFT DOWN (ALE surround minimal)
    has_fire = False
    minimal_set = (0, 2, 3, 4, 5)

    def init(self, key):
        grid = jnp.zeros((_SR_H, _SR_W), jnp.int32)
        return {
            "grid": grid,
            "pr": jnp.int32(_SR_H // 2), "pc": jnp.int32(4),
            "pdir": jnp.int32(1),         # 0 up, 1 right, 2 down, 3 left
            "er": jnp.int32(_SR_H // 2), "ec": jnp.int32(_SR_W - 5),
            "edir": jnp.int32(3),
            "p_score": jnp.int32(0),
            "e_score": jnp.int32(0),
            "tick_par": jnp.int32(0),
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return (g["p_score"] >= 10) | (g["e_score"] >= 10)

    def _step_cell(self, r, c, d):
        dr = jnp.asarray([-1, 0, 1, 0], jnp.int32)
        dc = jnp.asarray([0, 1, 0, -1], jnp.int32)
        ohd = jax.nn.one_hot(d, 4, dtype=jnp.int32)
        return r + (ohd * dr).sum(), c + (ohd * dc).sum()

    def tick(self, g, action, key):
        over0 = self.over(g)
        # Heading change (reversals ignored, as in the original).
        want = jnp.asarray([0, 0, 1, 3, 2], jnp.int32)
        oha = jax.nn.one_hot(jnp.clip(action, 0, 4), 5, dtype=jnp.int32)
        wd = (oha * want).sum()
        change = action > 0
        rev = jnp.mod(wd - g["pdir"], 4) == 2
        pdir = jnp.where(change & ~rev, wd, g["pdir"])
        # The snakes advance every 4th frame (Surround's stately pace).
        par = jnp.mod(g["tick_par"] + 1, 4)
        move = par == 0

        # Drone: steers to avoid walls — tries straight, then left/right.
        def free(r, c):
            inside = (r >= 0) & (r < _SR_H) & (c >= 0) & (c < _SR_W)
            rr = jnp.clip(r, 0, _SR_H - 1)
            cc = jnp.clip(c, 0, _SR_W - 1)
            ohr = jax.nn.one_hot(rr, _SR_H, dtype=jnp.float32)
            ohc = jax.nn.one_hot(cc, _SR_W, dtype=jnp.float32)
            occ = jnp.einsum("h,hw,w->", ohr, g["grid"].astype(jnp.float32),
                             ohc)
            return inside & (occ < 0.5)

        er0, ec0, ed0 = g["er"], g["ec"], g["edir"]
        sr, sc = self._step_cell(er0, ec0, ed0)
        lr, lc = self._step_cell(er0, ec0, jnp.mod(ed0 + 3, 4))
        rr2, rc2 = self._step_cell(er0, ec0, jnp.mod(ed0 + 1, 4))
        edir = jnp.where(
            free(sr, sc),
            ed0,
            jnp.where(free(lr, lc), jnp.mod(ed0 + 3, 4),
                      jnp.mod(ed0 + 1, 4)),
        )

        def advance(g):
            grid = g["grid"]
            # Drop walls at the current cells.
            grid = grid.at[g["pr"], g["pc"]].set(1)
            grid = grid.at[g["er"], g["ec"]].set(2)
            pr, pc = self._step_cell(g["pr"], g["pc"], pdir)
            er, ec = self._step_cell(g["er"], g["ec"], edir)

            def blocked(r, c):
                inside = (r >= 0) & (r < _SR_H) & (c >= 0) & (c < _SR_W)
                rr = jnp.clip(r, 0, _SR_H - 1)
                cc = jnp.clip(c, 0, _SR_W - 1)
                ohr = jax.nn.one_hot(rr, _SR_H, dtype=jnp.float32)
                ohc = jax.nn.one_hot(cc, _SR_W, dtype=jnp.float32)
                occ = jnp.einsum(
                    "h,hw,w->", ohr, grid.astype(jnp.float32), ohc
                )
                return ~inside | (occ > 0.5)

            p_crash = blocked(pr, pc)
            e_crash = blocked(er, ec) | ((pr == er) & (pc == ec))
            round_over = p_crash | e_crash
            reward = jnp.where(
                e_crash & ~p_crash, 1.0, jnp.where(p_crash & ~e_crash,
                                                   -1.0, 0.0)
            )
            p_score = g["p_score"] + (e_crash & ~p_crash).astype(jnp.int32)
            e_score = g["e_score"] + (p_crash & ~e_crash).astype(jnp.int32)
            # Round reset.
            grid = jnp.where(round_over, jnp.zeros_like(grid), grid)
            pr = jnp.where(round_over, _SR_H // 2, jnp.clip(pr, 0, _SR_H - 1))
            pc = jnp.where(round_over, 4, jnp.clip(pc, 0, _SR_W - 1))
            er = jnp.where(round_over, _SR_H // 2, jnp.clip(er, 0, _SR_H - 1))
            ec = jnp.where(
                round_over, _SR_W - 5, jnp.clip(ec, 0, _SR_W - 1)
            )
            return {
                "grid": grid,
                "pr": pr, "pc": pc,
                "pdir": jnp.where(round_over, 1, pdir),
                "er": er, "ec": ec,
                "edir": jnp.where(round_over, 3, edir),
                "p_score": p_score, "e_score": e_score,
                "tick_par": par,
            }, reward

        g_adv, reward = advance(g)
        g_stay = {**g, "pdir": pdir, "edir": edir, "tick_par": par}
        g2 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(move, a, b), g_adv, g_stay
        )
        reward = jnp.where(move, reward, 0.0)
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        cell_h, cell_w = RAW_H // _SR_H, RAW_W // _SR_W
        grid = g["grid"]
        img = jnp.where(
            grid == 1, 230.0, jnp.where(grid == 2, 130.0, 25.0)
        )
        img = img.at[g["pr"], g["pc"]].set(255.0)
        img = img.at[g["er"], g["ec"]].set(160.0)
        big = jnp.repeat(jnp.repeat(img, cell_h, 0), cell_w, 1)
        frame = jnp.full((RAW_H, RAW_W), 25.0, jnp.float32)
        return frame.at[: big.shape[0], : big.shape[1]].set(big)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.9, gray * 0.7, gray])


class SurroundEnv(ArcadeEnv):
    GAME_CLS = SurroundGame


# ---------------------------------------------------------------------------
# Tutankham: tomb corridors, laser left/right, creatures from spawners.
# ---------------------------------------------------------------------------

_TK_N = 6
_TK_ITEMS = 4


class TutankhamGame(ArcadeGame):
    action_set_size = 8  # NOOP UP RIGHT LEFT DOWN RIGHTFIRE LEFTFIRE UPFIRE
    has_fire = False
    minimal_set = (0, 2, 3, 4, 5, 11, 12, 10)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        ex = jax.random.uniform(k1, (_TK_N,), jnp.float32, 20.0, RAW_W - 20)
        ey = 50.0 + 30.0 * jax.random.randint(
            k2, (_TK_N,), 0, 4, jnp.int32
        ).astype(jnp.float32)
        ix = jax.random.uniform(
            k3, (_TK_ITEMS,), jnp.float32, 20.0, RAW_W - 20
        )
        return {
            "px": jnp.float32(20.0), "py": jnp.float32(50.0),
            "facing": jnp.float32(1.0),
            "ex": ex, "ey": ey,
            "elive": jnp.ones((_TK_N,), bool),
            "ix": ix,
            "iy": 50.0 + 30.0 * jnp.arange(_TK_ITEMS, dtype=jnp.float32)
            % 120.0,
            "ilive": jnp.ones((_TK_ITEMS,), bool),
            "beam": jnp.float32(-1.0),
            "beam_x": jnp.float32(0.0),
            "beam_dir": jnp.float32(1.0),
            "lives": jnp.int32(3),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        up = action == 1
        right = (action == 2) | (action == 5)
        left = (action == 3) | (action == 6)
        down = action == 4
        fire_r = action == 5
        fire_l = action == 6
        px = jnp.clip(
            g["px"] + 2.2 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            6.0, RAW_W - 6.0,
        )
        # Vertical movement snaps between the 4 corridor rows.
        py = jnp.clip(
            g["py"] + 30.0 * (down.astype(jnp.float32)
                              - up.astype(jnp.float32)),
            50.0, 140.0,
        )
        facing = jnp.where(right, 1.0, jnp.where(left, -1.0, g["facing"]))

        # Laser fires horizontally only (Tutankham's signature constraint).
        beam_on = g["beam"] >= 0.0
        want_f = fire_r | fire_l
        can_f = want_f & ~beam_on
        beam_dir = jnp.where(
            can_f, jnp.where(fire_l, -1.0, 1.0), g["beam_dir"]
        )
        beam_x = jnp.where(can_f, px, g["beam_x"] + g["beam_dir"] * 7.0)
        beam = jnp.where(
            can_f, 0.0, jnp.where(beam_on, g["beam"] + 1.0, -1.0)
        )
        beam = jnp.where(
            (beam > 10.0) | (beam_x < 0) | (beam_x > RAW_W), -1.0, beam
        )
        beam_live = beam >= 0.0

        # Creatures crawl toward the player along their row.
        ex = g["ex"] + jnp.sign(px - g["ex"]) * 0.8
        ey = g["ey"] + jnp.sign(py - g["ey"]) * jnp.where(
            jnp.abs(g["ey"] - py) > 1.0, 0.3, 0.0
        )
        hit = (
            g["elive"] & beam_live
            & (jnp.abs(ey - py) < 8.0)
            & (jnp.abs(ex - beam_x) < 8.0)
        )
        first = jnp.argmax(hit)
        any_hit = jnp.any(hit)
        elive = g["elive"] & ~((jnp.arange(_TK_N) == first) & any_hit)
        reward = jnp.where(any_hit, 15.0, 0.0)
        beam = jnp.where(any_hit, -1.0, beam)

        # Treasures: touch to collect.
        got = (
            g["ilive"]
            & (jnp.abs(g["ix"] - px) < 6.0)
            & (jnp.abs(g["iy"] - py) < 8.0)
        )
        reward = reward + jnp.sum(got) * 50.0
        ilive = g["ilive"] & ~got

        touched = jnp.any(
            elive & (jnp.abs(ex - px) < 5.0) & (jnp.abs(ey - py) < 8.0)
        )
        lives = g["lives"] - touched.astype(jnp.int32)
        px = jnp.where(touched, 20.0, px)
        py = jnp.where(touched, 50.0, py)

        # Respawn creatures from the spawners.
        kv = jax.random.split(key)[0]
        respawn = ~elive & (jax.random.uniform(kv, (_TK_N,)) < 0.02)
        ex = jnp.where(respawn, RAW_W - 15.0, ex)
        elive = elive | respawn
        # All treasures → next chamber.
        clearall = ~jnp.any(ilive)
        reward = reward + jnp.where(clearall, 200.0, 0.0)
        ilive = ilive | clearall

        g2 = {
            "px": px, "py": py, "facing": facing,
            "ex": ex, "ey": ey, "elive": elive,
            "ix": g["ix"], "iy": g["iy"], "ilive": ilive,
            "beam": beam, "beam_x": beam_x, "beam_dir": beam_dir,
            "lives": lives,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 25.0, jnp.float32)
        # Corridor rows.
        for row_y in (50.0, 80.0, 110.0, 140.0):
            cor = jnp.abs(rows - row_y) < 10
            frame = jnp.where(cor, 55.0, frame)
        for i in range(_TK_ITEMS):
            it = (
                g["ilive"][i]
                & (jnp.abs(rows - g["iy"][i]) < 4)
                & (jnp.abs(cols - g["ix"][i]) < 4)
            )
            frame = jnp.where(it, 230.0, frame)
        for i in range(_TK_N):
            e = (
                g["elive"][i]
                & (jnp.abs(rows - g["ey"][i]) < 5)
                & (jnp.abs(cols - g["ex"][i]) < 4)
            )
            frame = jnp.where(e, 150.0, frame)
        beam = (
            (g["beam"] >= 0.0)
            & (jnp.abs(rows - g["py"]) < 1.5)
            & (jnp.abs(cols - g["beam_x"]) < 6)
        )
        frame = jnp.where(beam, 255.0, frame)
        pl = (jnp.abs(rows - g["py"]) < 7) & (jnp.abs(cols - g["px"]) < 4)
        return jnp.where(pl, 245.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.85, gray * 0.5])


class TutankhamEnv(ArcadeEnv):
    GAME_CLS = TutankhamGame


# ---------------------------------------------------------------------------
# VideoPinball: plunger + flippers, bumpers, gravity.
# ---------------------------------------------------------------------------

_VP_BUMPERS = np.array(
    [[50.0, 60.0], [110.0, 60.0], [80.0, 95.0]], np.float32
)  # (x, y)


class VideoPinballGame(ArcadeGame):
    action_set_size = 9
    has_fire = True
    # NOOP FIRE UP RIGHT LEFT DOWN UPFIRE RIGHTFIRE LEFTFIRE
    minimal_set = (0, 1, 2, 3, 4, 5, 10, 11, 12)

    def init(self, key):
        return {
            "bx": jnp.float32(150.0), "by": jnp.float32(175.0),
            "vx": jnp.float32(0.0), "vy": jnp.float32(0.0),
            "plunging": jnp.bool_(True),
            "plunger": jnp.float32(0.0),
            "flip_l": jnp.int32(0),
            "flip_r": jnp.int32(0),
            "balls": jnp.int32(3),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["balls"]

    def over(self, g):
        return g["balls"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 6)
        down = action == 5
        left = (action == 4) | (action == 8)
        right = (action == 3) | (action == 7)
        # Plunger: DOWN charges, release (no DOWN) launches.
        charging = g["plunging"] & down
        plunger = jnp.clip(
            g["plunger"] + jnp.where(charging, 0.15, 0.0), 0.0, 4.0
        )
        launch = g["plunging"] & ~down & (plunger > 0.3)
        vy = jnp.where(launch, -(2.0 + plunger), g["vy"])
        vx = jnp.where(launch, -0.7, g["vx"])
        plunging = g["plunging"] & ~launch
        plunger = jnp.where(launch, 0.0, plunger)

        # Gravity + drag while in play.
        inplay = ~plunging
        vy = jnp.where(inplay, vy + 0.07, vy)
        vx = vx * 0.999
        bx = g["bx"] + jnp.where(inplay, vx, 0.0)
        by = g["by"] + jnp.where(inplay, vy, 0.0)

        # Walls.
        hit_l = bx < 12.0
        hit_r = bx > RAW_W - 26.0   # plunger lane wall
        vx = jnp.where(hit_l | hit_r, -vx * 0.9, vx)
        bx = jnp.clip(bx, 12.0, RAW_W - 26.0)
        hit_t = by < 30.0
        vy = jnp.where(hit_t, -vy * 0.9, vy)
        by = jnp.maximum(by, 30.0)

        # Bumpers kick and score.
        reward = jnp.float32(0.0)
        for i in range(len(_VP_BUMPERS)):
            bxx, byy = float(_VP_BUMPERS[i][0]), float(_VP_BUMPERS[i][1])
            dx = bx - bxx
            dy = by - byy
            d = jnp.sqrt(dx * dx + dy * dy) + 1e-6
            hit = inplay & (d < 9.0)
            vx = jnp.where(hit, vx + 2.0 * dx / d, vx)
            vy = jnp.where(hit, vy + 2.0 * dy / d, vy)
            reward = reward + jnp.where(hit, 100.0, 0.0)

        # Flippers at the bottom (y=185): active flipper bounces the ball
        # upward with english.
        flip_l = jnp.where(left, 6, jnp.maximum(g["flip_l"] - 1, 0))
        flip_r = jnp.where(right, 6, jnp.maximum(g["flip_r"] - 1, 0))
        at_paddles = inplay & (by > 182.0) & (by < 192.0)
        on_left = at_paddles & (bx > 30.0) & (bx < 75.0)
        on_right = at_paddles & (bx > 85.0) & (bx < 130.0)
        saved_l = on_left & (flip_l > 0)
        saved_r = on_right & (flip_r > 0)
        vy = jnp.where(saved_l | saved_r, -jnp.abs(vy) - 1.5, vy)
        vx = jnp.where(saved_l, vx + 0.8, jnp.where(saved_r, vx - 0.8, vx))
        reward = reward + jnp.where(saved_l | saved_r, 1.0, 0.0)

        # Drain.
        drained = inplay & (by > 200.0)
        balls = g["balls"] - drained.astype(jnp.int32)
        bx = jnp.where(drained, 150.0, bx)
        by = jnp.where(drained, 175.0, by)
        vx = jnp.where(drained, 0.0, vx)
        vy = jnp.where(drained, 0.0, vy)
        plunging = plunging | drained

        g2 = {
            "bx": bx, "by": by, "vx": vx, "vy": vy,
            "plunging": plunging, "plunger": plunger,
            "flip_l": flip_l.astype(jnp.int32),
            "flip_r": flip_r.astype(jnp.int32),
            "balls": balls,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 20.0, jnp.float32)
        walls = (cols < 12) | (cols > RAW_W - 14) | (rows < 30)
        frame = jnp.where(walls, 90.0, frame)
        lane = (cols > RAW_W - 26) & (cols < RAW_W - 14) & (rows > 100)
        frame = jnp.where(lane, 45.0, frame)
        for i in range(len(_VP_BUMPERS)):
            b = (
                jnp.sqrt(
                    (cols - float(_VP_BUMPERS[i][0])) ** 2
                    + (rows - float(_VP_BUMPERS[i][1])) ** 2
                )
                < 8.0
            )
            frame = jnp.where(b, 170.0, frame)
        lf = (
            (rows > 183) & (rows < 190) & (cols > 30) & (cols < 75)
            & (g["flip_l"] > 0)
        )
        rf = (
            (rows > 183) & (rows < 190) & (cols > 85) & (cols < 130)
            & (g["flip_r"] > 0)
        )
        fl_idle = (rows > 188) & (rows < 192) & (
            ((cols > 30) & (cols < 70)) | ((cols > 90) & (cols < 130))
        )
        frame = jnp.where(fl_idle, 120.0, frame)
        frame = jnp.where(lf | rf, 220.0, frame)
        ball = (
            jnp.sqrt((cols - g["bx"]) ** 2 + (rows - g["by"]) ** 2) < 3.0
        )
        return jnp.where(ball, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.9, gray * 0.6])


class VideoPinballEnv(ArcadeEnv):
    GAME_CLS = VideoPinballGame


# ---------------------------------------------------------------------------
# YarsRevenge: nibble the shield, dodge the destroyer missile, cannon shot.
# ---------------------------------------------------------------------------

_YR_ROWS, _YR_COLS = 16, 4


class YarsRevengeGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "px": jnp.float32(30.0), "py": jnp.float32(105.0),
            "shield": jnp.ones((_YR_ROWS, _YR_COLS), bool),
            "qy": jnp.float32(105.0),   # Qotile row
            "my": jnp.float32(105.0),   # destroyer missile
            "mx": jnp.float32(RAW_W - 20.0),
            "cannon_x": jnp.float32(-1.0),  # Zorlon cannon; <0 = unarmed
            "cannon_y": jnp.float32(0.0),
            "nibbles": jnp.int32(0),
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
            g["px"] + 2.6 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            6.0, RAW_W - 14.0,  # may fly into the shield band to nibble
        )
        py = jnp.clip(
            g["py"] + 2.6 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            30.0, 180.0,
        )

        # Shield nibble: touching a live cell eats it.
        sx0 = RAW_W - 38.0
        col = jnp.clip(((px - sx0) / 6.0).astype(jnp.int32), 0, _YR_COLS - 1)
        row = jnp.clip(((py - 60.0) / 6.0).astype(jnp.int32), 0, _YR_ROWS - 1)
        in_shield = (px >= sx0) & (py >= 60.0) & (py < 60.0 + _YR_ROWS * 6.0)
        ohr = jax.nn.one_hot(row, _YR_ROWS, dtype=jnp.float32)
        ohc = jax.nn.one_hot(col, _YR_COLS, dtype=jnp.float32)
        cell_live = (
            jnp.einsum("h,hw,w->", ohr, g["shield"].astype(jnp.float32), ohc)
            > 0.5
        )
        nibble = in_shield & cell_live
        shield = g["shield"] & ~(
            (ohr[:, None] * ohc[None, :] > 0.5) & nibble
        )
        reward = jnp.where(nibble, 69.0, 0.0)
        nibbles = g["nibbles"] + nibble.astype(jnp.int32)

        # Qotile tracks the player; destroyer missile homes continuously.
        qy = g["qy"] + jnp.clip(py - g["qy"], -0.5, 0.5)
        mx = g["mx"] + jnp.sign(px - g["mx"]) * 1.1
        my = g["my"] + jnp.sign(py - g["my"]) * 1.1
        killed = (jnp.abs(mx - px) < 4.0) & (jnp.abs(my - py) < 4.0)

        # Zorlon cannon: armed by nibbles; fire launches it rightward
        # along the player's row.
        armed = (nibbles >= 4) & (g["cannon_x"] < 0.0)
        cannon_x = jnp.where(
            armed & fire, px + 6.0,
            jnp.where(g["cannon_x"] >= 0.0, g["cannon_x"] + 5.0, -1.0),
        )
        cannon_y = jnp.where(armed & fire, py, g["cannon_y"])
        nibbles = jnp.where(armed & fire, 0, nibbles)
        # Cannon reaching the Qotile = kill bonus, new shield.
        qx = RAW_W - 12.0
        boom = (cannon_x >= qx) & (jnp.abs(cannon_y - qy) < 10.0)
        missed = (cannon_x >= jnp.float32(RAW_W)) & ~boom
        cannon_x = jnp.where(boom | missed, -1.0, cannon_x)
        reward = reward + jnp.where(boom, 1000.0, 0.0)
        shield = shield | boom  # fresh shield after a kill

        lives = g["lives"] - killed.astype(jnp.int32)
        px = jnp.where(killed, 30.0, px)
        py = jnp.where(killed, 105.0, py)
        mx = jnp.where(killed, RAW_W - 20.0, mx)
        my = jnp.where(killed, 105.0, my)

        g2 = {
            "px": px, "py": py, "shield": shield,
            "qy": qy, "my": my, "mx": mx,
            "cannon_x": cannon_x, "cannon_y": cannon_y,
            "nibbles": nibbles.astype(jnp.int32),
            "lives": lives,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 18.0, jnp.float32)
        # Shield cells.
        sx0 = RAW_W - 38.0
        for r in range(_YR_ROWS):
            for c in range(_YR_COLS):
                cell = (
                    g["shield"][r, c]
                    & (jnp.abs(rows - (63.0 + r * 6.0)) < 3)
                    & (jnp.abs(cols - (sx0 + 3.0 + c * 6.0)) < 3)
                )
                frame = jnp.where(cell, 140.0, frame)
        q = (jnp.abs(rows - g["qy"]) < 6) & (cols > RAW_W - 12)
        frame = jnp.where(q, 200.0, frame)
        mis = (jnp.abs(rows - g["my"]) < 2) & (jnp.abs(cols - g["mx"]) < 2)
        frame = jnp.where(mis, 255.0, frame)
        can = (
            (g["cannon_x"] >= 0.0)
            & (jnp.abs(rows - g["cannon_y"]) < 3)
            & (jnp.abs(cols - g["cannon_x"]) < 5)
        )
        frame = jnp.where(can, 235.0, frame)
        fly = (jnp.abs(rows - g["py"]) < 5) & (jnp.abs(cols - g["px"]) < 5)
        return jnp.where(fly, 245.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.75, gray * 0.85])


class YarsRevengeEnv(ArcadeEnv):
    GAME_CLS = YarsRevengeGame
