"""Arcade wave 3: Qbert, MsPacman, BeamRider, Frostbite, Riverraid,
CrazyClimber.

Behavioral reference: the corresponding ALE games registered by
``envpool/atari/registration.py:21-35``.  Like the earlier waves these
are faithful-behavior reimplementations — control schemes, scoring
rules, life/terminal structure and visual layout class — not bit-exact
6502/TIA emulation, hence the ``XxxLite-v5`` ids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame


def _grids():
    rows = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (RAW_H, RAW_W), 1)
    return rows, cols


def _freeze_when(over0, g, g2, reward):
    g2 = jax.tree_util.tree_map(
        lambda old, new: jnp.where(over0, old, new), g, g2
    )
    return g2, jnp.where(over0, 0.0, reward)


# ---------------------------------------------------------------------------
# Q*bert: light all 21 pyramid cubes, dodge Coily.
# ---------------------------------------------------------------------------

_QB_ROWS = 6


class QbertGame(ArcadeGame):
    action_set_size = 5  # NOOP + the 4 diagonal hops
    has_fire = False

    def init(self, key):
        return {
            "row": jnp.int32(0), "col": jnp.int32(0),
            "lit": jnp.zeros((_QB_ROWS, _QB_ROWS), bool),
            "c_row": jnp.int32(-1), "c_col": jnp.int32(0),
            "c_timer": jnp.int32(40),     # Coily spawn countdown
            "hop_cool": jnp.int32(0),
            "lives": jnp.int32(4),
            "round": jnp.int32(0),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def _valid(self, r, c):
        return (r >= 0) & (r < _QB_ROWS) & (c >= 0) & (c <= r)

    def tick(self, g, action, key):
        over0 = self.over(g)
        can_hop = g["hop_cool"] == 0
        # 1=UP(→up-right), 2=RIGHT(→down-right), 3=LEFT(→up-left),
        # 4=DOWN(→down-left): the 4 isometric diagonals.
        dr = jnp.where((action == 1) | (action == 3), -1,
                       jnp.where((action == 2) | (action == 4), 1, 0))
        dc = jnp.where(action == 3, -1,
                       jnp.where(action == 2, 1, 0))
        hop = can_hop & (action > 0)
        nr = g["row"] + jnp.where(hop, dr, 0)
        nc = g["col"] + jnp.where(hop, dc, 0)
        on = self._valid(nr, nc)
        fell = hop & ~on
        nr = jnp.clip(nr, 0, _QB_ROWS - 1)
        nc = jnp.clip(nc, 0, nr)
        newly_lit = hop & on & ~g["lit"][nr, nc]
        lit = g["lit"].at[nr, nc].set(g["lit"][nr, nc] | (hop & on))
        reward = jnp.where(newly_lit, 25.0, 0.0)
        # Round clear: every valid cube lit.
        tri = jnp.tril(jnp.ones((_QB_ROWS, _QB_ROWS), bool))
        clear = jnp.all(lit | ~tri)
        reward = reward + jnp.where(clear, 100.0, 0.0)
        lit = jnp.where(clear, jnp.zeros_like(lit), lit)
        # Coily: spawn at apex, hop toward the player every other tick.
        c_timer = jnp.maximum(g["c_timer"] - 1, 0)
        spawn = (g["c_row"] < 0) & (c_timer == 0)
        c_row = jnp.where(spawn, 0, g["c_row"])
        c_col = jnp.where(spawn, 0, g["c_col"])
        move = (c_row >= 0) & (jnp.mod(c_timer, 2) == 0)
        cdr = jnp.sign(nr - c_row)
        cdc = jnp.where(cdr > 0, (nc > c_col).astype(jnp.int32),
                        (nc < c_col).astype(jnp.int32) * -1)
        offboard = c_row < 0  # -1 = not spawned; keep the sentinel
        c_row2 = jnp.where(
            offboard, -1,
            jnp.clip(c_row + jnp.where(move, cdr, 0), 0, _QB_ROWS - 1),
        )
        c_col2 = jnp.where(
            offboard, 0,
            jnp.clip(c_col + jnp.where(move, cdc, 0), 0,
                     jnp.maximum(c_row2, 0)),
        )
        caught = (c_row2 == nr) & (c_col2 == nc) & (c_row >= 0)
        die = fell | caught
        lives = g["lives"] - die.astype(jnp.int32)
        # Respawn at the apex after death; Coily resets.
        nr = jnp.where(die, 0, nr)
        nc = jnp.where(die, 0, nc)
        g2 = {
            "row": nr, "col": nc, "lit": lit,
            "c_row": jnp.where(die | clear, -1, c_row2),
            "c_col": jnp.where(die | clear, 0, c_col2),
            "c_timer": jnp.where(
                die | clear, 40, jnp.where(spawn, 40, c_timer)
            ),
            "hop_cool": jnp.where(hop, 4, jnp.maximum(g["hop_cool"] - 1, 0)),
            "lives": lives,
            "round": g["round"] + clear.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def _cube_xy(self, r, c):
        x = RAW_W / 2 + (2 * c - r) * 13.0
        y = 30.0 + r * 26.0
        return x, y

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 30.0, jnp.float32)
        for r in range(_QB_ROWS):
            for c in range(r + 1):
                x, y = self._cube_xy(r, c)
                cube = (jnp.abs(rows - y) < 11) & (jnp.abs(cols - x) < 12)
                luma = jnp.where(g["lit"][r, c], 200.0, 90.0)
                frame = jnp.where(cube, luma, frame)
        px, py = self._cube_xy(g["row"], g["col"])
        pl = (jnp.abs(rows - (py - 8)) < 5) & (jnp.abs(cols - px) < 4)
        frame = jnp.where(pl, 250.0, frame)
        cx, cy = self._cube_xy(g["c_row"], g["c_col"])
        snake = (
            (g["c_row"] >= 0)
            & (jnp.abs(rows - (cy - 8)) < 5) & (jnp.abs(cols - cx) < 4)
        )
        return jnp.where(snake, 160.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.9, gray * 0.6, gray])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[89].set((g["score"] % 256).astype(jnp.uint8))
        ram = ram.at[33].set(g["lives"].astype(jnp.uint8))
        return ram


class QbertEnv(ArcadeEnv):
    GAME_CLS = QbertGame


# ---------------------------------------------------------------------------
# Ms. Pac-Man: pellet maze, 4 ghosts, power pellets.
# ---------------------------------------------------------------------------

# 13x17 maze (1 = wall).  Hand-drawn, fully connected corridors.
_MP_MAZE = np.asarray([
    [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    [1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 1],
    [1, 0, 1, 1, 0, 0, 0, 0, 0, 1, 1, 0, 1],
    [1, 0, 1, 0, 0, 1, 1, 1, 0, 0, 1, 0, 1],
    [1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1],
    [1, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 1],
    [1, 0, 1, 1, 0, 1, 1, 1, 0, 1, 1, 0, 1],
    [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    [1, 0, 1, 1, 0, 1, 0, 1, 0, 1, 1, 0, 1],
    [1, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 0, 1],
    [1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1],
    [1, 0, 0, 1, 0, 1, 1, 1, 0, 1, 0, 0, 1],
    [1, 0, 1, 1, 0, 0, 1, 0, 0, 1, 1, 0, 1],
    [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    [1, 0, 1, 0, 1, 1, 0, 1, 1, 0, 1, 0, 1],
    [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
], np.int8)
_MP_H, _MP_W = _MP_MAZE.shape
_MP_POWER = np.asarray([[1, 1], [1, 11], [15, 1], [15, 11]], np.int32)
_MP_START = (13, 6)
_MP_GHOST_HOME = np.asarray(
    [[7, 5], [7, 7], [9, 5], [9, 7]], np.int32
)
_MP_CELL = 11.0  # pixels per cell


class MsPacmanGame(ArcadeGame):
    action_set_size = 9
    has_fire = False

    def init(self, key):
        pellets = jnp.asarray(_MP_MAZE == 0)
        pellets = pellets.at[_MP_START[0], _MP_START[1]].set(False)
        return {
            "pr": jnp.int32(_MP_START[0]), "pc": jnp.int32(_MP_START[1]),
            "pellets": pellets,
            "ghosts": jnp.asarray(_MP_GHOST_HOME),
            "fright": jnp.int32(0),
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
        maze = jnp.asarray(_MP_MAZE)
        up = (action == 1) | (action == 5) | (action == 6)
        down = (action == 4) | (action == 7) | (action == 8)
        right = (action == 2) | (action == 5) | (action == 7)
        left = (action == 3) | (action == 6) | (action == 8)
        can = g["move_cool"] == 0
        dr = jnp.where(up, -1, jnp.where(down, 1, 0)) * can
        dc = jnp.where(left, -1, jnp.where(right, 1, 0)) * can
        # vertical first, then horizontal — each blocked by walls
        nr = g["pr"] + dr
        nr = jnp.where(maze[nr, g["pc"]] == 0, nr, g["pr"])
        nc = g["pc"] + dc
        nc = jnp.where(maze[nr, nc] == 0, nc, g["pc"])
        ate = g["pellets"][nr, nc]
        power = jnp.any(
            jnp.all(jnp.asarray(_MP_POWER) == jnp.stack([nr, nc]), axis=1)
        ) & ate
        pellets = g["pellets"].at[nr, nc].set(False)
        reward = jnp.where(power, 50.0, jnp.where(ate, 10.0, 0.0))
        fright = jnp.where(power, 40, jnp.maximum(g["fright"] - 1, 0))
        # Ghosts: greedy chase (or flee when frightened); random tiebreak.
        gs = g["ghosts"]
        flee = jnp.where(fright > 0, -1, 1)
        keys = jax.random.split(key, 4)

        def ghost_step(pos, k):
            cand = jnp.asarray([[-1, 0], [1, 0], [0, -1], [0, 1]])
            npos = pos[None, :] + cand
            # one-hot contraction instead of a vector-index gather
            ohy = jax.nn.one_hot(npos[:, 0], _MP_H)
            ohx = jax.nn.one_hot(npos[:, 1], _MP_W)
            free = jnp.einsum(
                "ch,hw,cw->c", ohy, maze.astype(jnp.float32), ohx
            ) == 0
            d = (
                jnp.abs(npos[:, 0] - nr) + jnp.abs(npos[:, 1] - nc)
            ).astype(jnp.float32) * flee
            noise = jax.random.uniform(k, (4,)) * 0.5
            costs = jnp.where(free, d + noise, 1e9)
            return npos[jnp.argmin(costs)]

        slow = jnp.mod(g["move_cool"] + fright, 2) == 0  # fright halves pace
        gs2 = jax.vmap(ghost_step)(gs, keys)
        gs2 = jnp.where((fright > 0) & slow, gs, gs2)
        # Collisions: same cell after the move, or the ghost started on
        # the player's cell (crossing/swap).
        on_player = ((gs2[:, 0] == nr) & (gs2[:, 1] == nc)) | (
            (gs[:, 0] == nr) & (gs[:, 1] == nc)
        )
        eat_ghost = on_player & (fright > 0)
        reward = reward + jnp.sum(eat_ghost) * 200.0
        gs2 = jnp.where(
            eat_ghost[:, None], jnp.asarray(_MP_GHOST_HOME), gs2
        )
        caught = jnp.any(on_player & (fright == 0))
        lives = g["lives"] - caught.astype(jnp.int32)
        nr = jnp.where(caught, _MP_START[0], nr)
        nc = jnp.where(caught, _MP_START[1], nc)
        gs2 = jnp.where(caught, jnp.asarray(_MP_GHOST_HOME), gs2)
        # Board clear.
        clear = ~jnp.any(pellets)
        reward = reward + jnp.where(clear, 500.0, 0.0)
        pellets = jnp.where(
            clear,
            jnp.asarray(_MP_MAZE == 0).at[nr, nc].set(False),
            pellets,
        )
        g2 = {
            "pr": nr, "pc": nc, "pellets": pellets, "ghosts": gs2,
            "fright": fright,
            "move_cool": jnp.where(can, 1, 0),
            "lives": lives,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        y0, x0 = 12.0, 9.0
        cr = ((rows - y0) / _MP_CELL).astype(jnp.int32)
        cc = ((cols - x0) / _MP_CELL).astype(jnp.int32)
        inside = (cr >= 0) & (cr < _MP_H) & (cc >= 0) & (cc < _MP_W)
        crc = jnp.clip(cr, 0, _MP_H - 1)
        ccc = jnp.clip(cc, 0, _MP_W - 1)
        wall = inside & (jnp.asarray(_MP_MAZE)[crc, ccc] == 1)
        frame = jnp.where(wall, 80.0, 20.0)
        # pellets: small dots at cell centers.  The pellet-grid lookup
        # is upsampled with constant one-hot matmuls — a [210,160]-index
        # gather lowers to per-element dynamic-slices on TPU and
        # dominated this core's step time.
        cyc = y0 + (crc + 0.5) * _MP_CELL
        cxc = x0 + (ccc + 0.5) * _MP_CELL
        near = (jnp.abs(rows - cyc) < 2) & (jnp.abs(cols - cxc) < 2)
        ohr = jnp.asarray(
            np.eye(_MP_H, dtype=np.float32)[
                np.clip(((np.arange(RAW_H) - y0) / _MP_CELL).astype(int),
                        0, _MP_H - 1)
            ]
        )                                                   # [210, H]
        ohc = jnp.asarray(
            np.eye(_MP_W, dtype=np.float32)[
                np.clip(((np.arange(RAW_W) - x0) / _MP_CELL).astype(int),
                        0, _MP_W - 1)
            ]
        )                                                   # [160, W]
        pell_img = ohr @ g["pellets"].astype(jnp.float32) @ ohc.T
        frame = jnp.where(
            inside & near & (pell_img > 0.5), 180.0, frame
        )
        py = y0 + (g["pr"] + 0.5) * _MP_CELL
        px = x0 + (g["pc"] + 0.5) * _MP_CELL
        pl = ((rows - py) ** 2 + (cols - px) ** 2) < 22.0
        frame = jnp.where(pl, 250.0, frame)
        for i in range(4):
            gy = y0 + (g["ghosts"][i, 0] + 0.5) * _MP_CELL
            gx = x0 + (g["ghosts"][i, 1] + 0.5) * _MP_CELL
            gh = ((rows - gy) ** 2 + (cols - gx) ** 2) < 22.0
            frame = jnp.where(
                gh, jnp.where(g["fright"] > 0, 110.0, 150.0), frame
            )
        return frame

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.75, gray * 0.9])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[120].set((g["score"] % 256).astype(jnp.uint8))
        ram = ram.at[123].set(g["lives"].astype(jnp.uint8))
        return ram


class MsPacmanEnv(ArcadeEnv):
    GAME_CLS = MsPacmanGame


# ---------------------------------------------------------------------------
# BeamRider: 5-beam 3D shooter; clear 15 enemies per sector.
# ---------------------------------------------------------------------------

_BR_N = 5
_BR_LANE_X = np.linspace(30, RAW_W - 30, 5)


class BeamRiderGame(ArcadeGame):
    action_set_size = 9
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        lanes = jax.random.randint(k1, (_BR_N,), 0, 5)
        depth = jax.random.uniform(k2, (_BR_N,), jnp.float32, 0.0, 0.8)
        return {
            "lane": jnp.int32(2),
            "e_lane": lanes,
            "e_depth": depth,       # 0 = horizon, 1 = player row
            "fire_cool": jnp.int32(0),
            "move_cool": jnp.int32(0),
            "left_in_sector": jnp.int32(15),
            "sector": jnp.int32(1),
            "lives": jnp.int32(3),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 5)
        right = (action == 2) | (action == 5) | (action == 7)
        left = (action == 3) | (action == 6) | (action == 8)
        can_m = g["move_cool"] == 0
        lane = jnp.clip(
            g["lane"]
            + (right.astype(jnp.int32) - left.astype(jnp.int32)) * can_m,
            0, 4,
        )
        speed = 0.008 + 0.002 * g["sector"].astype(jnp.float32)
        depth = g["e_depth"] + speed
        # Laser: nearest enemy in the player's beam.
        can_f = fire & (g["fire_cool"] == 0)
        in_beam = g["e_lane"] == lane
        tgt = jnp.argmax(in_beam * depth)
        hit = can_f & in_beam[tgt] & (depth[tgt] < 1.0)
        reward = jnp.where(hit, 44.0, 0.0)
        # Enemy reaching the bottom: dies (and hits on player lane).
        reached = depth >= 1.0
        crash = jnp.any(reached & (g["e_lane"] == lane))
        # Respawn hit/expired enemies at the horizon.
        k1, k2 = jax.random.split(key)
        gone = reached | (jnp.arange(_BR_N) == tgt) & hit
        new_lane = jax.random.randint(k1, (_BR_N,), 0, 5)
        e_lane = jnp.where(gone, new_lane, g["e_lane"])
        depth = jnp.where(gone, 0.0, depth)
        left_in = g["left_in_sector"] - hit.astype(jnp.int32)
        sector_up = left_in <= 0
        reward = reward + jnp.where(sector_up, 100.0, 0.0)
        g2 = {
            "lane": lane,
            "e_lane": e_lane,
            "e_depth": depth,
            "fire_cool": jnp.where(
                can_f, 6, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "move_cool": jnp.where(can_m, 3, g["move_cool"] - 1),
            "left_in_sector": jnp.where(sector_up, 15, left_in),
            "sector": g["sector"] + sector_up.astype(jnp.int32),
            "lives": g["lives"] - crash.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 25.0, jnp.float32)
        horizon_y, bottom_y = 50.0, 185.0
        lanes = jnp.asarray(_BR_LANE_X, jnp.float32)
        mid = RAW_W / 2
        # beams converge toward the horizon
        t = jnp.clip((rows - horizon_y) / (bottom_y - horizon_y), 0, 1)
        for i in range(5):
            bx = mid + (lanes[i] - mid) * t
            beam = (jnp.abs(cols - bx) < 1.2) & (rows > horizon_y)
            frame = jnp.where(beam, 70.0, frame)
        for i in range(_BR_N):
            d = g["e_depth"][i]
            ey = horizon_y + d * (bottom_y - horizon_y)
            ex = mid + (lanes[g["e_lane"][i]] - mid) * d
            size = 2.0 + 6.0 * d
            en = (jnp.abs(rows - ey) < size) & (jnp.abs(cols - ex) < size)
            frame = jnp.where(en, 190.0, frame)
        px = lanes[g["lane"]]
        pl = (jnp.abs(rows - bottom_y) < 6) & (jnp.abs(cols - px) < 8)
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.6, gray * 0.8, gray])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[9].set((g["score"] % 256).astype(jnp.uint8))
        ram = ram.at[5].set(g["lives"].astype(jnp.uint8))
        return ram


class BeamRiderEnv(ArcadeEnv):
    GAME_CLS = BeamRiderGame


# ---------------------------------------------------------------------------
# Frostbite: hop shore → 4 floe rows; each fresh hop builds the igloo.
# ---------------------------------------------------------------------------

_FB_ROWS = 4
_FB_ROW_Y = np.asarray([80.0, 110.0, 140.0, 170.0])
_FB_FLOES = 3


class FrostbiteGame(ArcadeGame):
    action_set_size = 5  # NOOP up down left right
    has_fire = False

    def init(self, key):
        xs = jax.random.uniform(
            key, (_FB_ROWS, _FB_FLOES), jnp.float32, 0, RAW_W
        )
        return {
            "row": jnp.int32(0),        # 0 = shore, 1..4 floes
            "px": jnp.float32(RAW_W / 2),
            "floe_x": xs,
            "white": jnp.ones((_FB_ROWS,), bool),
            "pieces": jnp.int32(0),
            "temp": jnp.float32(45.0),
            "hop_cool": jnp.int32(0),
            "lives": jnp.int32(3),
            "level": jnp.int32(1),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        speed = 0.8 + 0.2 * g["level"].astype(jnp.float32)
        dirs = jnp.asarray([1.0, -1.0, 1.0, -1.0]) * speed
        floe_x = jnp.mod(g["floe_x"] + dirs[:, None], RAW_W + 40.0)
        can = g["hop_cool"] == 0
        down = (action == 4) & can
        up = (action == 1) & can
        row = jnp.clip(
            g["row"] + down.astype(jnp.int32) - up.astype(jnp.int32),
            0, _FB_ROWS,
        )
        hopped = row != g["row"]
        px = jnp.clip(
            g["px"]
            + 2.5 * ((action == 2).astype(jnp.float32)
                     - (action == 3).astype(jnp.float32)),
            6.0, RAW_W - 6.0,
        )
        # On a floe row: must be standing on a floe (else into the water);
        # the player rides the floe drift.
        fr = jnp.clip(row - 1, 0, _FB_ROWS - 1)
        on_floe = jnp.any(jnp.abs(floe_x[fr] - px) < 14.0) & (row > 0)
        px = jnp.where(row > 0, px + dirs[fr] * 0.0, px)
        drown = (row > 0) & ~on_floe
        # Fresh hop onto a white row: +10 and an igloo piece.
        scored = hopped & (row > 0) & g["white"][fr] & on_floe
        white = g["white"].at[fr].set(
            g["white"][fr] & ~(hopped & (row > 0))
        )
        all_blue = ~jnp.any(white)
        white = jnp.where(all_blue, jnp.ones_like(white), white)
        pieces = g["pieces"] + scored.astype(jnp.int32)
        reward = jnp.where(scored, 10.0, 0.0)
        # Complete igloo + back on shore → level clear.
        done_igloo = (pieces >= 15) & (row == 0)
        reward = reward + jnp.where(
            done_igloo, g["temp"] * 10.0, 0.0
        )
        temp = jnp.maximum(g["temp"] - 0.03, 0.0)
        froze = temp <= 0.0
        die = drown | froze
        lives = g["lives"] - die.astype(jnp.int32)
        g2 = {
            "row": jnp.where(die | done_igloo, 0, row),
            "px": jnp.where(die | done_igloo, RAW_W / 2, px),
            "floe_x": floe_x,
            "white": white,
            "pieces": jnp.where(die | done_igloo, 0, pieces),
            "temp": jnp.where(die | done_igloo, 45.0, temp),
            "hop_cool": jnp.where(
                hopped, 6, jnp.maximum(g["hop_cool"] - 1, 0)
            ),
            "lives": lives,
            "level": g["level"] + done_igloo.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        water = rows > 65.0
        frame = jnp.where(water, 50.0, 140.0)  # sea vs sky/shore
        row_y = jnp.asarray(_FB_ROW_Y, jnp.float32)
        for r in range(_FB_ROWS):
            luma = jnp.where(g["white"][r], 230.0, 120.0)
            for f in range(_FB_FLOES):
                fl = (
                    (jnp.abs(rows - row_y[r]) < 6)
                    & (jnp.abs(cols - g["floe_x"][r, f]) < 14)
                )
                frame = jnp.where(fl, luma, frame)
        # igloo progress bar top-right
        bar = (rows < 12) & (
            cols > RAW_W - 6 - 4 * g["pieces"].astype(jnp.float32)
        ) & (cols < RAW_W - 4)
        frame = jnp.where(bar, 255.0, frame)
        py = jnp.where(
            g["row"] == 0, 45.0, row_y[jnp.clip(g["row"] - 1, 0, 3)] - 8.0
        )
        pl = (jnp.abs(rows - py) < 6) & (jnp.abs(cols - g["px"]) < 4)
        return jnp.where(pl, 0.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.7, gray * 0.85, gray])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[72].set((g["score"] % 256).astype(jnp.uint8))
        ram = ram.at[76].set(g["lives"].astype(jnp.uint8))
        return ram


class FrostbiteEnv(ArcadeEnv):
    GAME_CLS = FrostbiteGame


# ---------------------------------------------------------------------------
# Riverraid: vertical-scroll river; fuel, ships, bridges.
# ---------------------------------------------------------------------------

_RR_N = 6
_RR_TYPES = 3  # 0 ship(+30) 1 heli(+60) 2 fuel(+80 shot / refuel passed)


class RiverraidGame(ArcadeGame):
    action_set_size = 6  # NOOP FIRE RIGHT LEFT RIGHTFIRE LEFTFIRE
    has_fire = True

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        ys = jax.random.uniform(
            k1, (_RR_N,), jnp.float32, -RAW_H, 0.0
        )
        xs = jax.random.uniform(k2, (_RR_N,), jnp.float32, 40, RAW_W - 40)
        tp = jax.random.randint(k3, (_RR_N,), 0, _RR_TYPES)
        return {
            "px": jnp.float32(RAW_W / 2),
            "scroll": jnp.float32(0.0),
            "o_y": ys, "o_x": xs, "o_t": tp,
            "fuel": jnp.float32(100.0),
            "bridge_y": jnp.float32(-400.0),
            "fire_cool": jnp.int32(0),
            "lives": jnp.int32(3),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def _banks(self, scroll, y):
        """River bank x at screen row y (sinusoid by world row)."""
        wy = scroll + (RAW_H - y)
        c = RAW_W / 2 + 25.0 * jnp.sin(wy / 90.0)
        half = 55.0 + 15.0 * jnp.sin(wy / 147.0)
        return c - half, c + half

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action == 4) | (action == 5)
        right = (action == 2) | (action == 4)
        left = (action == 3) | (action == 5)
        px = g["px"] + 2.5 * (
            right.astype(jnp.float32) - left.astype(jnp.float32)
        )
        scroll = g["scroll"] + 2.0
        o_y = g["o_y"] + 2.0
        py = 185.0
        # Shooting: nearest object roughly in the player's column.
        can_f = fire & (g["fire_cool"] == 0)
        in_col = (jnp.abs(g["o_x"] - px) < 8.0) & (o_y < py) & (o_y > 0)
        tgt = jnp.argmin(jnp.where(in_col, py - o_y, 1e9))
        shot = can_f & jnp.any(in_col)
        vals = jnp.asarray([30.0, 60.0, 80.0])
        reward = jnp.where(shot, vals[g["o_t"][tgt]], 0.0)
        # Bridge: crosses every 600 rows; shooting it +500.
        bridge_y = g["bridge_y"] + 2.0
        bridge_shot = can_f & (jnp.abs(bridge_y - 40.0) < 150.0) & (
            bridge_y < py
        )
        reward = reward + jnp.where(bridge_shot, 500.0, 0.0)
        bridge_y = jnp.where(
            bridge_shot | (bridge_y > RAW_H + 20), -600.0, bridge_y
        )
        # Collisions: objects and banks.
        hit_obj = jnp.any(
            (jnp.abs(g["o_x"] - px) < 10.0) & (jnp.abs(o_y - py) < 8.0)
        )
        lo, hi = self._banks(scroll, py)
        hit_bank = (px < lo + 4) | (px > hi - 4)
        # Fuel: passing over a fuel depot refuels; else drains.
        over_fuel = jnp.any(
            (g["o_t"] == 2)
            & (jnp.abs(g["o_x"] - px) < 10.0)
            & (jnp.abs(o_y - py) < 10.0)
        )
        fuel = jnp.where(
            over_fuel, jnp.minimum(g["fuel"] + 2.0, 100.0),
            g["fuel"] - 0.12,
        )
        out_of_fuel = fuel <= 0.0
        die = (hit_obj & ~over_fuel) | hit_bank | out_of_fuel
        # Respawn shot/passed objects above the screen.
        k1, k2, k3 = jax.random.split(key, 3)
        gone = (o_y > RAW_H) | ((jnp.arange(_RR_N) == tgt) & shot)
        o_y = jnp.where(
            gone,
            jax.random.uniform(k1, (_RR_N,), jnp.float32, -200.0, -20.0),
            o_y,
        )
        o_x = jnp.where(
            gone,
            jax.random.uniform(k2, (_RR_N,), jnp.float32, 40, RAW_W - 40),
            g["o_x"],
        )
        o_t = jnp.where(
            gone, jax.random.randint(k3, (_RR_N,), 0, _RR_TYPES), g["o_t"]
        )
        lives = g["lives"] - die.astype(jnp.int32)
        g2 = {
            "px": jnp.where(die, RAW_W / 2, jnp.clip(px, 6.0, RAW_W - 6.0)),
            "scroll": scroll,
            "o_y": o_y, "o_x": o_x, "o_t": o_t,
            "fuel": jnp.where(die, 100.0, fuel),
            "bridge_y": bridge_y,
            "fire_cool": jnp.where(
                can_f, 5, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "lives": lives,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        lo, hi = self._banks(g["scroll"], rows[:, 0])
        river = (cols >= lo[:, None]) & (cols <= hi[:, None])
        frame = jnp.where(river, 70.0, 130.0)  # water vs land
        for i in range(_RR_N):
            luma = jnp.asarray([200.0, 230.0, 170.0])[g["o_t"][i]]
            ob = (
                (jnp.abs(rows - g["o_y"][i]) < 5)
                & (jnp.abs(cols - g["o_x"][i]) < 8)
            )
            frame = jnp.where(ob, luma, frame)
        br = (jnp.abs(rows - g["bridge_y"]) < 6) & river
        frame = jnp.where(br, 160.0, frame)
        pl = (jnp.abs(rows - 185.0) < 6) & (jnp.abs(cols - g["px"]) < 5)
        frame = jnp.where(pl, 250.0, frame)
        # fuel gauge
        bar = (rows > RAW_H - 8) & (
            cols < g["fuel"] * (RAW_W / 100.0)
        )
        return jnp.where(bar, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.7, gray * 0.9, gray * 0.8])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[77].set((g["score"] % 256).astype(jnp.uint8))
        ram = ram.at[64].set(g["lives"].astype(jnp.uint8))
        return ram


class RiverraidEnv(ArcadeEnv):
    GAME_CLS = RiverraidGame


# ---------------------------------------------------------------------------
# Crazy Climber: climb the facade; windows shut, objects fall.
# ---------------------------------------------------------------------------

_CC_COLS = 8
_CC_OBJ = 3


class CrazyClimberGame(ArcadeGame):
    action_set_size = 9
    has_fire = False

    def init(self, key):
        k1, k2 = jax.random.split(key)
        ox = jax.random.randint(k1, (_CC_OBJ,), 0, _CC_COLS)
        oy = jax.random.uniform(k2, (_CC_OBJ,), jnp.float32, -200.0, -20.0)
        return {
            "col": jnp.int32(4),
            "height": jnp.int32(0),      # floors climbed
            "phase": jnp.float32(0.0),   # window open/shut clock
            "o_col": ox, "o_y": oy,
            "move_cool": jnp.int32(0),
            "lives": jnp.int32(3),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def _window_open(self, phase, col, floor):
        """Deterministic open/shut pattern per (column, floor)."""
        return jnp.sin(
            phase * 0.08 + col.astype(jnp.float32) * 1.7
            + floor.astype(jnp.float32) * 0.9
        ) > -0.4

    def tick(self, g, action, key):
        over0 = self.over(g)
        up = (action == 1) | (action == 5) | (action == 6)
        right = (action == 2) | (action == 5) | (action == 7)
        left = (action == 3) | (action == 6) | (action == 8)
        can = g["move_cool"] == 0
        col = jnp.clip(
            g["col"]
            + (right.astype(jnp.int32) - left.astype(jnp.int32)) * can,
            0, _CC_COLS - 1,
        )
        phase = g["phase"] + 1.0
        next_open = self._window_open(phase, col, g["height"] + 1)
        climbed = up & can & next_open
        height = g["height"] + climbed.astype(jnp.int32)
        reward = jnp.where(climbed, 100.0, 0.0)
        # Falling objects in fixed columns.
        o_y = g["o_y"] + 3.0
        player_y = 150.0
        hit = jnp.any(
            (g["o_col"] == col) & (jnp.abs(o_y - player_y) < 8.0)
        )
        k1, k2 = jax.random.split(key)
        gone = o_y > RAW_H
        o_y = jnp.where(
            gone,
            jax.random.uniform(k1, (_CC_OBJ,), jnp.float32, -150.0, -10.0),
            o_y,
        )
        o_col = jnp.where(
            gone, jax.random.randint(k2, (_CC_OBJ,), 0, _CC_COLS),
            g["o_col"],
        )
        lives = g["lives"] - hit.astype(jnp.int32)
        # Roof bonus every 50 floors.
        roof = jnp.mod(height, 50) == 0
        reward = reward + jnp.where(climbed & roof, 1000.0, 0.0)
        g2 = {
            "col": col,
            "height": height,
            "phase": phase,
            "o_col": o_col, "o_y": o_y,
            "move_cool": jnp.where(can & (up | left | right), 3,
                                   jnp.maximum(g["move_cool"] - 1, 0)),
            "lives": lives,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 90.0, jnp.float32)  # facade
        colw = RAW_W / _CC_COLS
        ccol = (cols / colw).astype(jnp.int32)
        floor = ((RAW_H - rows) / 21.0).astype(jnp.int32) + g["height"]
        win = (
            (jnp.mod(rows, 21.0) > 4) & (jnp.mod(cols, colw) > 4)
        )
        open_ = self._window_open(g["phase"], ccol, floor)
        frame = jnp.where(win & open_, 40.0, frame)
        frame = jnp.where(win & ~open_, 160.0, frame)
        for i in range(_CC_OBJ):
            ob = (
                (jnp.abs(rows - g["o_y"][i]) < 5)
                & (jnp.abs(cols - (g["o_col"][i] + 0.5) * colw) < 5)
            )
            frame = jnp.where(ob, 220.0, frame)
        pl = (
            (jnp.abs(rows - 150.0) < 8)
            & (jnp.abs(cols - (g["col"] + 0.5) * colw) < 5)
        )
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.9, gray * 0.7])

    def ram(self, g):
        ram = jnp.zeros(128, jnp.uint8)
        ram = ram.at[118].set((g["score"] % 256).astype(jnp.uint8))
        ram = ram.at[84].set(g["lives"].astype(jnp.uint8))
        return ram


class CrazyClimberEnv(ArcadeEnv):
    GAME_CLS = CrazyClimberGame
