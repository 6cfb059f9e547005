"""Arcade wave 16: Tetris, Klax, VideoCube, BasicMath, Hangman,
WordZapper, FlagCapture — puzzle/word carts of the non-57 ALE roster.

Behavioral reference: the corresponding ALE ROMs registered by
``envpool/atari/registration.py:21-35``.  Tetris plays the real seven
tetrominoes with rotation and line clears on the homebrew's narrow
well; Hangman/WordZapper draw from a built-in word table; scopes
documented inline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame
from .wave3_games import _freeze_when, _grids
from .wave12_games import _joy


# ---------------------------------------------------------------------------
# Tetris: real tetrominoes in an 8-wide well (the 2600 homebrew's
# size), soft drop, rotation, line clears with the 1/2/4-row ladder.
# ---------------------------------------------------------------------------

_TT_H, _TT_W = 16, 8


def _tetromino_table() -> np.ndarray:
    """[7, 4, 4, 4] occupancy of each piece x rotation on a 4x4 tile."""
    base = {
        "I": [(1, 0), (1, 1), (1, 2), (1, 3)],
        "O": [(1, 1), (1, 2), (2, 1), (2, 2)],
        "T": [(1, 0), (1, 1), (1, 2), (2, 1)],
        "S": [(1, 1), (1, 2), (2, 0), (2, 1)],
        "Z": [(1, 0), (1, 1), (2, 1), (2, 2)],
        "J": [(1, 0), (1, 1), (1, 2), (2, 2)],
        "L": [(1, 0), (1, 1), (1, 2), (2, 0)],
    }
    out = np.zeros((7, 4, 4, 4), np.int32)
    for p, cells in enumerate(base.values()):
        tile = np.zeros((4, 4), np.int32)
        for r, c in cells:
            tile[r, c] = 1
        for rot in range(4):
            out[p, rot] = np.rot90(tile, -rot)
    return out


_TETROMINOES = _tetromino_table()


class TetrisGame(ArcadeGame):
    action_set_size = 5  # NOOP FIRE(rotate) RIGHT LEFT DOWN(soft drop)
    has_fire = True
    minimal_set = (0, 1, 3, 4, 5)

    def init(self, key):
        return {
            "grid": jnp.zeros((_TT_H, _TT_W), jnp.int32),
            "piece": jax.random.randint(key, (), 0, 7),
            "rot": jnp.int32(0),
            "pr": jnp.int32(0), "pc": jnp.int32(2),
            "fall": jnp.int32(0),
            "dead": jnp.bool_(False),
            "lines": jnp.int32(0),
        }

    def lives(self, g):
        return 1 - g["dead"].astype(jnp.int32)

    def over(self, g):
        return g["dead"]

    @staticmethod
    def _collides(grid, piece, rot, pr, pc):
        tile = jnp.asarray(_TETROMINOES)[piece, rot]  # [4,4]
        rr = pr + jnp.arange(4)[:, None]
        cc = pc + jnp.arange(4)[None, :]
        inb = (rr >= 0) & (rr < _TT_H) & (cc >= 0) & (cc < _TT_W)
        occ = grid[jnp.clip(rr, 0, _TT_H - 1), jnp.clip(cc, 0, _TT_W - 1)]
        bad = (tile == 1) & (~inb | (occ == 1))
        return jnp.any(bad)

    def tick(self, g, action, key):
        over0 = self.over(g)
        rotate = action == 1
        right = action == 2
        left = action == 3
        soft = action == 4
        grid, piece = g["grid"], g["piece"]
        # Try rotate, then lateral move (each reverted on collision).
        rot = (g["rot"] + rotate.astype(jnp.int32)) % 4
        rot = jnp.where(
            self._collides(grid, piece, rot, g["pr"], g["pc"]),
            g["rot"], rot,
        )
        pc = g["pc"] + right.astype(jnp.int32) - left.astype(jnp.int32)
        pc = jnp.where(
            self._collides(grid, piece, rot, g["pr"], pc), g["pc"], pc
        )
        # Gravity: every 3rd frame, faster on soft drop.
        fall = g["fall"] + 1 + 2 * soft.astype(jnp.int32)
        drop = fall >= 3
        fall = jnp.where(drop, 0, fall)
        pr = g["pr"] + drop.astype(jnp.int32)
        landed = self._collides(grid, piece, rot, pr, pc)
        pr_final = jnp.where(landed, pr - 1, pr)
        # Lock the piece into the grid.
        tile = jnp.asarray(_TETROMINOES)[piece, rot]
        rr = jnp.arange(_TT_H)[:, None, None, None]
        cc = jnp.arange(_TT_W)[None, :, None, None]
        tr = pr_final + jnp.arange(4)[None, None, :, None]
        tc = pc + jnp.arange(4)[None, None, None, :]
        stamp = jnp.any(
            (tile[None, None] == 1) & (rr == tr) & (cc == tc),
            axis=(2, 3),
        )
        grid2 = jnp.where(landed & stamp, 1, grid)
        # Clear full rows (shift down via sort trick: full rows out).
        full = jnp.all(grid2 == 1, axis=1)
        n_clear = jnp.sum(full.astype(jnp.int32))
        order = jnp.argsort(
            jnp.where(full, -1, jnp.arange(_TT_H))
        )  # full rows float to the top, order otherwise kept
        kept = grid2[order] * (~full[order])[:, None]
        grid2 = jnp.where(landed, kept, grid2)
        reward = jnp.where(
            landed,
            jnp.asarray([0.0, 1.0, 2.0, 4.0, 8.0])[n_clear], 0.0,
        )
        # Spawn the next piece.
        new_piece = jax.random.randint(key, (), 0, 7)
        piece = jnp.where(landed, new_piece, piece)
        rot = jnp.where(landed, 0, rot)
        pc = jnp.where(landed, 2, pc)
        pr2 = jnp.where(landed, 0, pr_final)
        dead = landed & self._collides(grid2, piece, jnp.int32(0),
                                       jnp.int32(0), jnp.int32(2))
        g2 = {
            "grid": grid2, "piece": piece, "rot": rot,
            "pr": pr2, "pc": pc, "fall": fall,
            "dead": dead, "lines": g["lines"] + n_clear * landed,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        ch, cw = 12, 14
        rr = jnp.clip((rows - 8) // ch, 0, _TT_H - 1).astype(jnp.int32)
        cc = jnp.clip((cols - 24) // cw, 0, _TT_W - 1).astype(jnp.int32)
        in_well = (rows >= 8) & (rows < 200) & (cols >= 24) & (cols < 136)
        frame = jnp.where(in_well, 30.0, 12.0)
        frame = jnp.where(in_well & (g["grid"][rr, cc] == 1), 180.0, frame)
        tile = jnp.asarray(_TETROMINOES)[g["piece"], g["rot"]]
        tr = rr - g["pr"]
        tc = cc - g["pc"]
        on_piece = (
            in_well & (tr >= 0) & (tr < 4) & (tc >= 0) & (tc < 4)
            & (tile[jnp.clip(tr, 0, 3), jnp.clip(tc, 0, 3)] == 1)
        )
        return jnp.where(on_piece, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.7, gray, gray])


class TetrisEnv(ArcadeEnv):
    GAME_CLS = TetrisGame


# ---------------------------------------------------------------------------
# Klax: tiles roll off 5 conveyors onto your paddle (holds 3); tip
# them into the bins — three of a colour in a bin column clears.
# ---------------------------------------------------------------------------

_KX_LANES = 5


class KlaxGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "tile_lane": jax.random.randint(key, (), 0, _KX_LANES),
            "tile_color": jax.random.randint(key, (), 1, 4),
            "tile_y": jnp.float32(30.0),
            "paddle": jnp.int32(2),
            "held": jnp.zeros((3,), jnp.int32),   # stack, 0 = empty
            "bins": jnp.zeros((5, _KX_LANES), jnp.int32),
            "drops": jnp.int32(0),  # missed tiles (3 = game over)
            "klaxes": jnp.int32(0),
        }

    def lives(self, g):
        return 3 - g["drops"]

    def over(self, g):
        return g["drops"] >= 3

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        paddle = jnp.clip(
            g["paddle"] + right.astype(jnp.int32) - left.astype(jnp.int32),
            0, _KX_LANES - 1,
        )
        tile_y = g["tile_y"] + 1.6
        at_paddle = tile_y >= 150.0
        caught = at_paddle & (g["tile_lane"] == paddle) & (
            g["held"][2] == 0
        )
        missed = at_paddle & ~caught
        # Push onto the held stack.
        held = jnp.where(
            caught,
            jnp.stack([g["tile_color"], g["held"][0], g["held"][1]]),
            g["held"],
        )
        # DOWN tips the bottom tile into the bin under the paddle.
        heights = jnp.sum((g["bins"] > 0).astype(jnp.int32), axis=0)
        h = heights[paddle]
        can_drop = down & (held[0] > 0) & (h < 5)
        bins = jnp.where(
            can_drop,
            g["bins"].at[jnp.clip(h, 0, 4), paddle].set(held[0]),
            g["bins"],
        )
        held = jnp.where(
            can_drop, jnp.stack([held[1], held[2], jnp.int32(0)]), held
        )
        # Klax: 3 same-colour vertically in the dropped column.
        col = bins[:, paddle]
        trip = jnp.zeros((), bool)
        for s in range(3):
            trip = trip | (
                (col[s] > 0) & (col[s] == col[s + 1])
                & (col[s] == col[s + 2])
            )
        klax = can_drop & trip
        bins = jnp.where(
            klax, bins.at[:, paddle].set(jnp.zeros(5, jnp.int32)), bins
        )
        reward = jnp.where(klax, 50.0, 0.0) + jnp.where(caught, 1.0, 0.0)
        # Next tile.
        k1, k2 = jax.random.split(key)
        new = at_paddle
        tile_lane = jnp.where(
            new, jax.random.randint(k1, (), 0, _KX_LANES), g["tile_lane"]
        )
        tile_color = jnp.where(
            new, jax.random.randint(k2, (), 1, 4), g["tile_color"]
        )
        tile_y = jnp.where(new, 30.0, tile_y)
        g2 = {
            "tile_lane": tile_lane, "tile_color": tile_color,
            "tile_y": tile_y, "paddle": paddle, "held": held,
            "bins": bins, "drops": g["drops"] + missed.astype(jnp.int32),
            "klaxes": g["klaxes"] + klax.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 16.0, jnp.float32)
        lane_x = 20.0 + 30.0 * g["tile_lane"].astype(jnp.float32)
        t = (jnp.abs(rows - g["tile_y"]) < 5) & (jnp.abs(cols - lane_x) < 8)
        frame = jnp.where(t, 120.0 + 40.0 * g["tile_color"], frame)
        px = 20.0 + 30.0 * g["paddle"].astype(jnp.float32)
        pd = (jnp.abs(rows - 158.0) < 4) & (jnp.abs(cols - px) < 12)
        frame = jnp.where(pd, 255.0, frame)
        for s in range(3):
            hm = (
                (g["held"][s] > 0)
                & (jnp.abs(rows - (150.0 - 6.0 * s)) < 2)
                & (jnp.abs(cols - px) < 8)
            )
            frame = jnp.where(hm, 120.0 + 40.0 * g["held"][s], frame)
        for lane in range(_KX_LANES):
            for lvl in range(5):
                v = g["bins"][lvl, lane]
                bm = (
                    (v > 0)
                    & (jnp.abs(rows - (196.0 - 7.0 * lvl)) < 3)
                    & (jnp.abs(cols - (20.0 + 30.0 * lane)) < 10)
                )
                frame = jnp.where(bm, 120.0 + 40.0 * v, frame)
        return frame

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.8, gray * 0.4])


class KlaxEnv(ArcadeEnv):
    GAME_CLS = KlaxGame


# ---------------------------------------------------------------------------
# VideoCube: walk the 3x3 face swapping the carried colour onto tiles
# until the face is a solid colour (Atari Video Cube's core loop).
# ---------------------------------------------------------------------------


class VideoCubeGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        tiles = jax.random.randint(key, (3, 3), 0, 3)
        return {
            "tiles": tiles,
            "pr": jnp.int32(1), "pc": jnp.int32(1),
            "carry": jnp.int32(0),
            "moves": jnp.int32(0),
            "solved": jnp.bool_(False),
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return g["solved"]

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        pr = jnp.clip(
            g["pr"] + down.astype(jnp.int32) - up.astype(jnp.int32), 0, 2
        )
        pc = jnp.clip(
            g["pc"] + right.astype(jnp.int32) - left.astype(jnp.int32),
            0, 2,
        )
        moved = (pr != g["pr"]) | (pc != g["pc"])
        # FIRE swaps the carried colour with the tile underfoot.
        here = g["tiles"][pr, pc]
        tiles = jnp.where(
            fire, g["tiles"].at[pr, pc].set(g["carry"]), g["tiles"]
        )
        carry = jnp.where(fire, here, g["carry"])
        solved = jnp.all(tiles == tiles[0, 0])
        reward = jnp.where(
            solved & ~g["solved"],
            jnp.maximum(200.0 - g["moves"].astype(jnp.float32), 10.0),
            0.0,
        )
        g2 = {
            "tiles": tiles, "pr": pr, "pc": pc, "carry": carry,
            "moves": g["moves"] + moved.astype(jnp.int32),
            "solved": solved,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        rr = jnp.clip((rows - 40) // 45, 0, 2).astype(jnp.int32)
        cc = jnp.clip((cols - 25) // 38, 0, 2).astype(jnp.int32)
        in_f = (rows >= 40) & (rows < 175) & (cols >= 25) & (cols < 139)
        v = g["tiles"][rr, cc]
        frame = jnp.where(in_f, 70.0 + 60.0 * v, 15.0)
        edge = ((rows - 40) % 45 < 3) | ((cols - 25) % 38 < 3)
        frame = jnp.where(in_f & edge, 40.0, frame)
        here = in_f & (rr == g["pr"]) & (cc == g["pc"]) & ~edge
        man = here & (jnp.abs((rows - 40) % 45 - 22) < 8) & (
            jnp.abs((cols - 25) % 38 - 19) < 5
        )
        frame = jnp.where(man, 255.0, frame)
        chip = (rows < 20) & (cols < 25)
        return jnp.where(chip, 70.0 + 60.0 * g["carry"], frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.6, gray * 0.9])


class VideoCubeEnv(ArcadeEnv):
    GAME_CLS = VideoCubeGame


# ---------------------------------------------------------------------------
# BasicMath: the arithmetic drill cart — dial the answer digits with
# the stick, FIRE to submit; ten problems per set.
# ---------------------------------------------------------------------------


class BasicMathGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "a": jax.random.randint(k1, (), 1, 10),
            "b": jax.random.randint(k2, (), 1, 10),
            "op": jnp.int32(0),      # 0 add, 1 sub, 2 mul
            "guess": jnp.int32(0),
            "solved": jnp.int32(0),
            "asked": jnp.int32(0),
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return g["asked"] >= 10

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        # UP/DOWN dial +-1, RIGHT/LEFT dial +-10.
        guess = jnp.clip(
            g["guess"] + up.astype(jnp.int32) - down.astype(jnp.int32)
            + 10 * (right.astype(jnp.int32) - left.astype(jnp.int32)),
            0, 99,
        )
        truth = jnp.where(
            g["op"] == 0, g["a"] + g["b"],
            jnp.where(g["op"] == 1, jnp.abs(g["a"] - g["b"]),
                      g["a"] * g["b"]),
        )
        submit = fire
        correct = submit & (guess == truth)
        reward = jnp.where(correct, 1.0, jnp.where(submit, -1.0, 0.0))
        ks = jax.random.split(key, 3)
        a = jnp.where(submit, jax.random.randint(ks[0], (), 1, 10), g["a"])
        b = jnp.where(submit, jax.random.randint(ks[1], (), 1, 10), g["b"])
        op = jnp.where(submit, jax.random.randint(ks[2], (), 0, 3),
                       g["op"])
        guess = jnp.where(submit, 0, guess)
        g2 = {
            "a": a, "b": b, "op": op, "guess": guess,
            "solved": g["solved"] + correct.astype(jnp.int32),
            "asked": g["asked"] + submit.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 25.0, jnp.float32)
        abar = (rows > 40) & (rows < 55) & (
            cols < g["a"].astype(jnp.float32) * 14.0
        )
        frame = jnp.where(abar, 180.0, frame)
        opm = (rows > 62) & (rows < 70) & (
            cols < (g["op"] + 1).astype(jnp.float32) * 12.0
        )
        frame = jnp.where(opm, 140.0, frame)
        bbar = (rows > 78) & (rows < 93) & (
            cols < g["b"].astype(jnp.float32) * 14.0
        )
        frame = jnp.where(bbar, 180.0, frame)
        line = (rows > 100) & (rows < 103) & (cols > 10) & (cols < 150)
        frame = jnp.where(line, 90.0, frame)
        gbar = (rows > 115) & (rows < 135) & (
            cols < g["guess"].astype(jnp.float32) * 1.6
        )
        frame = jnp.where(gbar, 255.0, frame)
        sc = (rows > 190) & (
            cols < g["solved"].astype(jnp.float32) * 16.0
        )
        return jnp.where(sc, 210.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.9, gray * 0.9, gray * 0.5])


class BasicMathEnv(ArcadeEnv):
    GAME_CLS = BasicMathGame


# Small built-in word table for Hangman / WordZapper (letters 0-25).
_WORDS = np.asarray([
    [0, 19, 0, 17, 8],      # atari
    [18, 15, 0, 2, 4],      # space
    [6, 0, 12, 4, 18],      # games
    [2, 7, 8, 15, 18],      # chips
    [11, 0, 18, 4, 17],     # laser
    [17, 14, 1, 14, 19],    # robot
    [15, 8, 23, 4, 11],     # pixel
    [2, 14, 12, 4, 19],     # comet
], np.int32)


class HangmanGame(ArcadeGame):
    """Guess the hidden 5-letter word; 6 misses builds the gallows."""

    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "word": jax.random.randint(key, (), 0, len(_WORDS)),
            "guessed": jnp.zeros((26,), bool),
            "cursor": jnp.int32(0),
            "misses": jnp.int32(0),
            "done": jnp.bool_(False),
        }

    def lives(self, g):
        return 6 - g["misses"]

    def over(self, g):
        return g["done"] | (g["misses"] >= 6)

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        cursor = (
            g["cursor"] + right.astype(jnp.int32) - left.astype(jnp.int32)
            + 5 * (down.astype(jnp.int32) - up.astype(jnp.int32))
        ) % 26
        word = jnp.asarray(_WORDS)[g["word"]]
        fresh = fire & ~g["guessed"][cursor]
        guessed = g["guessed"] | ((jnp.arange(26) == cursor) & fire)
        in_word = jnp.any(word == cursor)
        hitn = jnp.sum((word == cursor).astype(jnp.int32))
        reward = jnp.where(
            fresh, jnp.where(in_word, 10.0 * hitn.astype(jnp.float32),
                             -5.0), 0.0
        )
        misses = g["misses"] + (fresh & ~in_word).astype(jnp.int32)
        solved = jnp.all(guessed[word])
        reward = reward + jnp.where(solved & ~g["done"], 50.0, 0.0)
        g2 = {
            "word": g["word"], "guessed": guessed, "cursor": cursor,
            "misses": misses, "done": solved,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 22.0, jnp.float32)
        word = jnp.asarray(_WORDS)[g["word"]]
        # Revealed letters as height-coded slots.
        for i in range(5):
            revealed = g["guessed"][word[i]]
            x = 25.0 + 24.0 * i
            slot = (rows > 150) & (rows < 155) & (jnp.abs(cols - x) < 9)
            frame = jnp.where(slot, 120.0, frame)
            lm = (
                revealed
                & (rows > 120.0 + word[i].astype(jnp.float32))
                & (rows < 148)
                & (jnp.abs(cols - x) < 7)
            )
            frame = jnp.where(lm, 230.0, frame)
        # Alphabet strip with cursor; guessed letters dimmed.
        letter = jnp.clip(cols // 6, 0, 25).astype(jnp.int32)
        strip = (rows > 180) & (rows < 195)
        gm = g["guessed"][letter]
        frame = jnp.where(strip, jnp.where(gm, 45.0, 160.0), frame)
        cur = strip & (letter == g["cursor"])
        frame = jnp.where(cur, 255.0, frame)
        # Gallows grows with misses.
        gal = (
            (cols > 140) & (cols < 145)
            & (rows < 40.0 + g["misses"].astype(jnp.float32) * 12.0)
        )
        return jnp.where(gal, 200.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.85, gray * 0.6])


class HangmanEnv(ArcadeEnv):
    GAME_CLS = HangmanGame


class WordZapperGame(ArcadeGame):
    """Shoot the scrolling letters of the target word IN ORDER before
    the timer; asteroids block shots."""

    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "word": jax.random.randint(k1, (), 0, len(_WORDS)),
            "progress": jnp.int32(0),
            "px": jnp.float32(RAW_W / 2),
            "letters": jax.random.permutation(k2, jnp.arange(26))[:8],
            "lx": jnp.linspace(0.0, RAW_W, 8, endpoint=False),
            "shot_y": jnp.float32(-1.0), "shot_x": jnp.float32(0.0),
            "timer": jnp.float32(99.0 * 60.0),
            "done": jnp.bool_(False),
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return g["done"] | (g["timer"] <= 0.0)

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        px = jnp.clip(
            g["px"] + 2.8 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            8.0, RAW_W - 8.0,
        )
        lx = (g["lx"] + 1.1) % RAW_W
        can_f = fire & (g["shot_y"] < 0.0)
        shot_x = jnp.where(can_f, px, g["shot_x"])
        shot_y = jnp.where(can_f, 170.0, g["shot_y"] - 6.0)
        shot_y = jnp.where(shot_y < 40.0, -1.0, shot_y)
        at_row = (shot_y > 0.0) & (shot_y < 60.0)
        word = jnp.asarray(_WORDS)[g["word"]]
        want = word[jnp.clip(g["progress"], 0, 4)]
        hit = at_row & (jnp.abs(lx - shot_x) < 8.0)
        hit_letter = jnp.where(jnp.any(hit), g["letters"][jnp.argmax(hit)],
                               -1)
        good = jnp.any(hit) & (hit_letter == want)
        bad = jnp.any(hit) & (hit_letter != want)
        progress = g["progress"] + good.astype(jnp.int32)
        reward = jnp.where(good, 20.0, 0.0) - jnp.where(bad, 2.0, 0.0)
        shot_y = jnp.where(jnp.any(hit), -1.0, shot_y)
        done = progress >= 5
        reward = reward + jnp.where(
            done & ~g["done"], g["timer"] / 60.0, 0.0
        )
        # Reshuffle letters when one is claimed so the word is findable.
        k1 = key
        letters = jnp.where(
            good, jax.random.permutation(k1, jnp.arange(26))[:8],
            g["letters"],
        )
        # Guarantee the needed letter is present somewhere.
        nxt = word[jnp.clip(progress, 0, 4)]
        has = jnp.any(letters == nxt)
        letters = jnp.where(has, letters, letters.at[0].set(nxt))
        g2 = {
            "word": g["word"], "progress": progress, "px": px,
            "letters": letters, "lx": lx,
            "shot_y": shot_y, "shot_x": shot_x,
            "timer": g["timer"] - 1.0, "done": done,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 14.0, jnp.float32)
        for i in range(8):
            lm = (
                (rows > 42) & (rows < 58)
                & (jnp.abs(cols - g["lx"][i]) < 7)
            )
            frame = jnp.where(
                lm, 90.0 + 6.0 * g["letters"][i].astype(jnp.float32), frame
            )
        sh = (
            (g["shot_y"] >= 0.0)
            & (jnp.abs(rows - g["shot_y"]) < 4)
            & (jnp.abs(cols - g["shot_x"]) < 2)
        )
        frame = jnp.where(sh, 255.0, frame)
        pl = (rows > 172) & (rows < 184) & (jnp.abs(cols - g["px"]) < 7)
        frame = jnp.where(pl, 240.0, frame)
        prog = (rows < 10) & (cols < g["progress"].astype(jnp.float32) * 32.0)
        return jnp.where(prog, 200.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.8, gray * 0.6, gray])


class WordZapperEnv(ArcadeEnv):
    GAME_CLS = WordZapperGame


# ---------------------------------------------------------------------------
# FlagCapture: the hidden flag on a 7x7 grid — probes reveal a
# direction clue toward the flag; bombs cost a turn and reset you.
# ---------------------------------------------------------------------------

_FC_N = 7


class FlagCaptureGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        flag = jax.random.randint(k1, (2,), 0, _FC_N)
        bombs = jax.random.bernoulli(k2, 0.15, (_FC_N, _FC_N))
        # No bomb under the flag.
        bombs = bombs.at[flag[0], flag[1]].set(False)
        return {
            "flag": flag,
            "bombs": bombs,
            "pr": jnp.int32(0), "pc": jnp.int32(0),
            "clue_dr": jnp.int32(0), "clue_dc": jnp.int32(0),
            "found": jnp.int32(0),
            "probes": jnp.int32(0),
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return g["found"] >= 3  # best-of-three flags

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        pr = jnp.clip(
            g["pr"] + down.astype(jnp.int32) - up.astype(jnp.int32),
            0, _FC_N - 1,
        )
        pc = jnp.clip(
            g["pc"] + right.astype(jnp.int32) - left.astype(jnp.int32),
            0, _FC_N - 1,
        )
        probe = fire
        on_flag = (pr == g["flag"][0]) & (pc == g["flag"][1])
        on_bomb = g["bombs"][pr, pc]
        found = probe & on_flag
        boom = probe & on_bomb & ~on_flag
        # Clue: sign of the vector to the flag (shown until next probe).
        clue_dr = jnp.where(probe, jnp.sign(g["flag"][0] - pr),
                            g["clue_dr"])
        clue_dc = jnp.where(probe, jnp.sign(g["flag"][1] - pc),
                            g["clue_dc"])
        reward = (
            jnp.where(found, 100.0, 0.0)
            - jnp.where(boom, 10.0, 0.0)
            - jnp.where(probe & ~found & ~boom, 1.0, 0.0)
        )
        # New round after a capture (or a bomb resets position).
        ks = jax.random.split(key, 3)
        new_flag = jax.random.randint(ks[0], (2,), 0, _FC_N)
        flag = jnp.where(found, new_flag, g["flag"])
        bombs = jnp.where(
            found,
            jax.random.bernoulli(ks[1], 0.15, (_FC_N, _FC_N)).at[
                new_flag[0], new_flag[1]
            ].set(False),
            g["bombs"],
        )
        pr = jnp.where(boom | found, 0, pr)
        pc = jnp.where(boom | found, 0, pc)
        g2 = {
            "flag": flag, "bombs": bombs, "pr": pr, "pc": pc,
            "clue_dr": clue_dr.astype(jnp.int32),
            "clue_dc": clue_dc.astype(jnp.int32),
            "found": g["found"] + found.astype(jnp.int32),
            "probes": g["probes"] + probe.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        ch, cw = 24, 20
        rr = jnp.clip((rows - 20) // ch, 0, _FC_N - 1).astype(jnp.int32)
        cc = jnp.clip((cols - 10) // cw, 0, _FC_N - 1).astype(jnp.int32)
        in_g = (rows >= 20) & (rows < 188) & (cols >= 10) & (cols < 150)
        checker = (rr + cc) % 2 == 0
        frame = jnp.where(in_g, jnp.where(checker, 60.0, 75.0), 18.0)
        cur = in_g & (rr == g["pr"]) & (cc == g["pc"])
        inner = ((rows - 20) % ch > 4) & ((cols - 10) % cw > 4)
        frame = jnp.where(cur & inner, 255.0, frame)
        # Clue arrow zone (top strip): encodes the last direction hint.
        code = (g["clue_dr"] + 1) * 3 + (g["clue_dc"] + 1)
        strip = (rows < 14) & (cols < 20.0 + code.astype(jnp.float32) * 15.0)
        return jnp.where(strip, 180.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.7, gray * 0.5])


class FlagCaptureEnv(ArcadeEnv):
    GAME_CLS = FlagCaptureGame
