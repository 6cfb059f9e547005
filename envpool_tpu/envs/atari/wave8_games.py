"""Arcade wave 8: Alien, Berzerk, Venture, Kaboom, Krull, Pitfall.

Behavioral reference: the corresponding ALE games registered by
``envpool/atari/registration.py:21-35``; faithful-behavior cores under
``XxxLite-v5`` ids as in waves 1-7.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame
from .wave3_games import _freeze_when, _grids


def _oh_lookup(grid, r, c, h, w):
    """grid[r, c] for vector indices via one-hot contraction (TPU)."""
    ohr = jax.nn.one_hot(r, h)
    ohc = jax.nn.one_hot(c, w)
    return jnp.einsum("ch,hw,cw->c", ohr, grid.astype(jnp.float32), ohc)


# ---------------------------------------------------------------------------
# Alien: corridor maze; crush eggs, dodge three aliens, grab the pulsar.
# ---------------------------------------------------------------------------

_AL_MAZE = np.asarray([
    [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    [1, 0, 0, 0, 1, 0, 1, 0, 0, 0, 1],
    [1, 0, 1, 0, 0, 0, 0, 0, 1, 0, 1],
    [1, 0, 1, 1, 0, 1, 0, 1, 1, 0, 1],
    [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1],
    [1, 1, 0, 1, 0, 0, 0, 1, 0, 1, 1],
    [1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 1],
    [1, 0, 1, 0, 0, 1, 0, 0, 1, 0, 1],
    [1, 0, 0, 0, 1, 0, 0, 0, 0, 0, 1],
    [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
], np.int8)
_AL_H, _AL_W = _AL_MAZE.shape
_AL_N = 3


class AlienGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        eggs = jnp.asarray(_AL_MAZE == 0)
        eggs = eggs.at[8, 1].set(False)  # spawn cell
        return {
            "pr": jnp.int32(8), "pc": jnp.int32(1),
            "eggs": eggs,
            "apos": jnp.asarray([[1, 1], [1, 9], [1, 5]]),
            "flame": jnp.float32(0.0),
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
        maze = jnp.asarray(_AL_MAZE)
        fire = (action == 1) | (action >= 10)
        up = (action == 2) | (action == 6) | (action == 7)
        down = (action == 5) | (action == 8) | (action == 9)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        can = g["move_cool"] == 0
        dr = (down.astype(jnp.int32) - up.astype(jnp.int32)) * can
        dc = (right.astype(jnp.int32) - left.astype(jnp.int32)) * can
        nr = g["pr"] + dr
        nr = jnp.where(maze[nr, g["pc"]] == 0, nr, g["pr"])
        nc = g["pc"] + dc
        nc = jnp.where(maze[nr, nc] == 0, nc, g["pc"])
        crushed = g["eggs"][nr, nc]
        eggs = g["eggs"].at[nr, nc].set(False)
        reward = jnp.where(crushed, 10.0, 0.0)
        clear = ~jnp.any(eggs)
        reward = reward + jnp.where(clear, 500.0, 0.0)
        eggs = jnp.where(
            clear, jnp.asarray(_AL_MAZE == 0).at[nr, nc].set(False), eggs
        )
        # Flamethrower: brief repel (aliens frozen) with a cooldown.
        flame = jnp.where(
            fire & (g["flame"] <= 0), 10.0,
            jnp.maximum(g["flame"] - 1.0, -20.0),
        )
        frozen = flame > 0
        k1, k2 = jax.random.split(key)

        def astep(pos, k):
            cand = pos[None, :] + jnp.asarray(
                [[-1, 0], [1, 0], [0, -1], [0, 1]]
            )
            free = _oh_lookup(
                maze, cand[:, 0], cand[:, 1], _AL_H, _AL_W
            ) == 0
            dist = jnp.abs(cand[:, 0] - nr) + jnp.abs(cand[:, 1] - nc)
            cost = jnp.where(
                free, dist + jax.random.uniform(k, (4,)) * 2.0, 1e9
            )
            return cand[jnp.argmin(cost)]

        stepped = jax.vmap(astep)(
            g["apos"], jax.random.split(k1, _AL_N)
        )
        apos = jnp.where(frozen | ~can, g["apos"], stepped)
        caught = jnp.any((apos[:, 0] == nr) & (apos[:, 1] == nc)) & ~frozen
        g2 = {
            "pr": jnp.where(caught, 8, nr), "pc": jnp.where(caught, 1, nc),
            "eggs": eggs,
            "apos": jnp.where(
                caught, jnp.asarray([[1, 1], [1, 9], [1, 5]]), apos
            ),
            "flame": flame,
            "move_cool": jnp.where(can, 1, 0),
            "lives": g["lives"] - caught.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        cell_h, cell_w = 19.0, 14.0
        y0, x0 = 10.0, 3.0
        cr = ((rows - y0) / cell_h).astype(jnp.int32)
        cc = ((cols - x0) / cell_w).astype(jnp.int32)
        inside = (cr >= 0) & (cr < _AL_H) & (cc >= 0) & (cc < _AL_W)
        crc = jnp.clip(cr, 0, _AL_H - 1)
        ccc = jnp.clip(cc, 0, _AL_W - 1)
        wall = inside & (jnp.asarray(_AL_MAZE)[crc, ccc] == 1)
        frame = jnp.where(wall, 90.0, jnp.where(inside, 25.0, 10.0))
        ohr = jnp.asarray(np.eye(_AL_H, dtype=np.float32)[
            np.clip(((np.arange(RAW_H) - y0) / cell_h).astype(int), 0,
                    _AL_H - 1)
        ])
        ohc = jnp.asarray(np.eye(_AL_W, dtype=np.float32)[
            np.clip(((np.arange(RAW_W) - x0) / cell_w).astype(int), 0,
                    _AL_W - 1)
        ])
        egg_img = ohr @ g["eggs"].astype(jnp.float32) @ ohc.T
        cyc = y0 + (crc + 0.5) * cell_h
        cxc = x0 + (ccc + 0.5) * cell_w
        dot = (jnp.abs(rows - cyc) < 2) & (jnp.abs(cols - cxc) < 2)
        frame = jnp.where(inside & dot & (egg_img > 0.5), 190.0, frame)
        for i in range(_AL_N):
            ay = y0 + (g["apos"][i, 0] + 0.5) * cell_h
            ax = x0 + (g["apos"][i, 1] + 0.5) * cell_w
            al = ((cols - ax) ** 2 + (rows - ay) ** 2) < 25.0
            frame = jnp.where(al, 160.0, frame)
        py = y0 + (g["pr"] + 0.5) * cell_h
        px = x0 + (g["pc"] + 0.5) * cell_w
        pl = ((cols - px) ** 2 + (rows - py) ** 2) < 25.0
        frame = jnp.where(pl, 250.0, frame)
        fl = (
            (g["flame"] > 0)
            & (((cols - px) ** 2 + (rows - py) ** 2) < 120.0)
        )
        return jnp.where(fl & ~pl, 220.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.7, gray, gray * 0.7])


class AlienEnv(ArcadeEnv):
    GAME_CLS = AlienGame


# ---------------------------------------------------------------------------
# Berzerk: room shooter; robots fire back; Evil Otto arrives on a timer.
# ---------------------------------------------------------------------------

_BZK_N = 6


class BerzerkGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "px": jnp.float32(15.0), "py": jnp.float32(105.0),
            "rx": jax.random.uniform(
                k1, (_BZK_N,), jnp.float32, 50.0, RAW_W - 15.0
            ),
            "ry": jax.random.uniform(
                k2, (_BZK_N,), jnp.float32, 40.0, 180.0
            ),
            "r_alive": jnp.ones((_BZK_N,), bool),
            "r_cool": jnp.full((_BZK_N,), 30.0),
            "otto_t": jnp.float32(300.0),
            "otto_x": jnp.float32(-20.0), "otto_y": jnp.float32(105.0),
            "fire_cool": jnp.int32(0),
            "room": jnp.int32(1),
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
        up = (action == 2) | (action == 6) | (action == 7)
        down = (action == 5) | (action == 8) | (action == 9)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        px = jnp.clip(
            g["px"] + 2.2 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            8.0, RAW_W - 8.0,
        )
        py = jnp.clip(
            g["py"] + 2.0 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            32.0, 188.0,
        )
        # Shot: 8-way toward the held direction (default: facing right).
        can_f = fire & (g["fire_cool"] == 0)
        sdx = (right.astype(jnp.float32) - left.astype(jnp.float32))
        sdy = (down.astype(jnp.float32) - up.astype(jnp.float32))
        none = (sdx == 0) & (sdy == 0)
        sdx = jnp.where(none, 1.0, sdx)
        rxr = g["rx"] - px
        ryr = g["ry"] - py
        along = rxr * sdx + ryr * sdy
        lateral = jnp.abs(rxr * sdy - ryr * sdx) / jnp.sqrt(
            sdx**2 + sdy**2
        )
        in_line = g["r_alive"] & (along > 0) & (lateral < 7.0)
        tgt = jnp.argmin(jnp.where(in_line, along, 1e9))
        hit = can_f & jnp.any(in_line)
        r_alive = g["r_alive"] & ~((jnp.arange(_BZK_N) == tgt) & hit)
        reward = jnp.where(hit, 50.0, 0.0)
        # Robots shuffle toward the player and fire on cooldown.
        k1, k2 = jax.random.split(key)
        rx = g["rx"] + jnp.clip(px - g["rx"], -0.7, 0.7)
        ry = g["ry"] + jnp.clip(py - g["ry"], -0.7, 0.7)
        cool = jnp.maximum(g["r_cool"] - 1.0, 0.0)
        shooting = r_alive & (cool <= 0) & (
            (jnp.abs(ry - py) < 6.0) | (jnp.abs(rx - px) < 6.0)
        )
        shot_by = jnp.any(shooting)
        cool = jnp.where(shooting, 40.0, cool)
        touched = jnp.any(
            r_alive & (jnp.abs(rx - px) < 7.0) & (jnp.abs(ry - py) < 8.0)
        )
        # Evil Otto: invincible chaser after the room timer.
        otto_t = jnp.maximum(g["otto_t"] - 1.0, 0.0)
        otto_in = otto_t <= 0
        ox = jnp.where(
            otto_in, g["otto_x"] + jnp.clip(px - g["otto_x"], -1.5, 1.5),
            g["otto_x"],
        )
        oy = jnp.where(
            otto_in, g["otto_y"] + jnp.clip(py - g["otto_y"], -1.5, 1.5),
            g["otto_y"],
        )
        otto_got = otto_in & (jnp.abs(ox - px) < 7.0) & (
            jnp.abs(oy - py) < 8.0
        )
        # Room clear: all robots down + reach the right exit.
        at_exit = px > RAW_W - 12.0
        clear = at_exit & ~jnp.any(r_alive)
        reward = reward + jnp.where(clear, 10.0 * _BZK_N, 0.0)
        die = shot_by | touched | otto_got
        new_room = clear | die
        rx = jnp.where(
            new_room,
            jax.random.uniform(k1, (_BZK_N,), jnp.float32, 50.0,
                               RAW_W - 15.0),
            rx,
        )
        ry = jnp.where(
            new_room,
            jax.random.uniform(k2, (_BZK_N,), jnp.float32, 40.0, 180.0),
            ry,
        )
        g2 = {
            "px": jnp.where(new_room, 15.0, px),
            "py": jnp.where(new_room, 105.0, py),
            "rx": rx, "ry": ry,
            "r_alive": r_alive | new_room,
            "r_cool": jnp.where(new_room, 30.0, cool),
            "otto_t": jnp.where(new_room, 300.0, otto_t),
            "otto_x": jnp.where(new_room, -20.0, ox),
            "otto_y": jnp.where(new_room, 105.0, oy),
            "fire_cool": jnp.where(
                can_f, 5, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "room": g["room"] + clear.astype(jnp.int32),
            "lives": g["lives"] - die.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        border = (
            (rows < 30) | (rows > 190) | (cols < 5) | (cols > RAW_W - 5)
        )
        exit_gap = (cols > RAW_W - 6) & (jnp.abs(rows - 105.0) < 20)
        frame = jnp.where(border & ~exit_gap, 110.0, 20.0)
        for i in range(_BZK_N):
            rb = (
                g["r_alive"][i]
                & (jnp.abs(rows - g["ry"][i]) < 7)
                & (jnp.abs(cols - g["rx"][i]) < 5)
            )
            frame = jnp.where(rb, 170.0, frame)
        otto = (
            (g["otto_t"] <= 0)
            & (((cols - g["otto_x"]) ** 2 + (rows - g["otto_y"]) ** 2) < 40.0)
        )
        frame = jnp.where(otto, 230.0, frame)
        pl = (jnp.abs(rows - g["py"]) < 8) & (jnp.abs(cols - g["px"]) < 4)
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.7, gray * 0.9])


class BerzerkEnv(ArcadeEnv):
    GAME_CLS = BerzerkGame


# ---------------------------------------------------------------------------
# Venture: hallway + treasure rooms guarded by monsters.
# ---------------------------------------------------------------------------

_VN_ROOMS = 4
_VN_ROOM_X = np.asarray([25.0, 65.0, 105.0, 145.0]) - 10.0


class VentureGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1 = key
        return {
            "px": jnp.float32(RAW_W / 2), "py": jnp.float32(190.0),
            "in_room": jnp.int32(-1),
            "treasure": jnp.ones((_VN_ROOMS,), bool),
            "mx": jnp.asarray(_VN_ROOM_X, jnp.float32) + 10.0,
            "my": jnp.full((_VN_ROOMS,), 70.0),
            "mdir": jnp.ones((_VN_ROOMS,)),
            "hallx": jnp.float32(20.0),    # hall monster
            "fire_cool": jnp.int32(0),
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
        up = (action == 2) | (action == 6) | (action == 7)
        down = (action == 5) | (action == 8) | (action == 9)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        px = jnp.clip(
            g["px"] + 2.4 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            8.0, RAW_W - 8.0,
        )
        py = jnp.clip(
            g["py"] + 2.2 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            30.0, 200.0,
        )
        # Rooms occupy the upper band; their doors at y≈120.
        rx = jnp.asarray(_VN_ROOM_X, jnp.float32)
        over_door = (py < 125.0) & (py > 110.0)
        door_hit = over_door & jnp.any(jnp.abs(px - (rx + 10.0)) < 8.0)
        which = jnp.argmin(jnp.abs(px - (rx + 10.0)))
        in_room = jnp.where(
            (py < 110.0),
            jnp.where(g["in_room"] >= 0, g["in_room"],
                      jnp.where(door_hit, which, -1)),
            -1,
        ).astype(jnp.int32)
        # Treasure grab inside the room.
        tx = rx[jnp.clip(in_room, 0, _VN_ROOMS - 1)] + 10.0
        grabbing = (
            (in_room >= 0)
            & g["treasure"][jnp.clip(in_room, 0, _VN_ROOMS - 1)]
            & (jnp.abs(px - tx) < 6.0) & (py < 55.0)
        )
        treasure = jnp.where(
            grabbing,
            g["treasure"].at[jnp.clip(in_room, 0, _VN_ROOMS - 1)].set(
                False
            ),
            g["treasure"],
        )
        reward = jnp.where(grabbing, 200.0, 0.0)
        all_got = ~jnp.any(treasure)
        reward = reward + jnp.where(all_got, 1000.0, 0.0)
        treasure = jnp.where(all_got, jnp.ones_like(treasure), treasure)
        # Room monsters patrol; shootable (respawn); hall monster is not.
        mx = g["mx"] + g["mdir"] * 1.2
        mdir = jnp.where(
            (mx < rx + 2.0) | (mx > rx + 18.0), -g["mdir"], g["mdir"]
        )
        can_f = fire & (g["fire_cool"] == 0)
        m_here = (jnp.arange(_VN_ROOMS) == in_room) & (in_room >= 0)
        shot = (
            can_f & m_here
            & (jnp.abs(mx - px) < 25.0) & (jnp.abs(g["my"] - py) < 12.0)
        )
        reward = reward + jnp.sum(shot) * 100.0
        caught_room = jnp.any(
            m_here & ~shot
            & (jnp.abs(mx - px) < 6.0) & (jnp.abs(g["my"] - py) < 8.0)
        )
        hallx = jnp.mod(g["hallx"] + 1.6, jnp.float32(RAW_W))
        caught_hall = (
            (in_room < 0) & (py > 130.0)
            & (jnp.abs(hallx - px) < 8.0) & (jnp.abs(160.0 - py) < 12.0)
        )
        die = caught_room | caught_hall
        g2 = {
            "px": jnp.where(die, RAW_W / 2, px),
            "py": jnp.where(die, 190.0, py),
            "in_room": jnp.where(die, -1, in_room),
            "treasure": treasure,
            "mx": mx, "my": g["my"], "mdir": mdir,
            "hallx": hallx,
            "fire_cool": jnp.where(
                can_f, 6, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "lives": g["lives"] - die.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 25.0, jnp.float32)
        rx = jnp.asarray(_VN_ROOM_X, jnp.float32)
        for i in range(_VN_ROOMS):
            box = (
                (rows > 35) & (rows < 110)
                & (cols > rx[i]) & (cols < rx[i] + 20.0)
            )
            frame = jnp.where(box, 45.0, frame)
            tr = (
                g["treasure"][i]
                & (jnp.abs(rows - 48.0) < 4)
                & (jnp.abs(cols - (rx[i] + 10.0)) < 4)
            )
            frame = jnp.where(tr, 230.0, frame)
            mo = (
                (jnp.abs(rows - g["my"][i]) < 5)
                & (jnp.abs(cols - g["mx"][i]) < 4)
            )
            frame = jnp.where(mo, 150.0, frame)
        hm = (jnp.abs(rows - 160.0) < 10) & (
            jnp.abs(cols - g["hallx"]) < 7
        )
        frame = jnp.where(hm, 120.0, frame)
        pl = ((cols - g["px"]) ** 2 + (rows - g["py"]) ** 2) < 16.0
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.6, gray * 0.6])


class VentureEnv(ArcadeEnv):
    GAME_CLS = VentureGame


# ---------------------------------------------------------------------------
# Kaboom: catch the mad bomber's bombs with stacked buckets.
# ---------------------------------------------------------------------------

_KB_N = 4   # bombs in flight


class KaboomGame(ArcadeGame):
    action_set_size = 4  # NOOP FIRE RIGHT LEFT
    has_fire = True

    def init(self, key):
        return {
            "px": jnp.float32(RAW_W / 2),
            "bomber_x": jnp.float32(RAW_W / 2),
            "bdir": jnp.float32(1.0),
            "bx": jnp.full((_KB_N,), -10.0),
            "by": jnp.zeros((_KB_N,)),
            "b_live": jnp.zeros((_KB_N,), bool),
            "drop_t": jnp.float32(10.0),
            "buckets": jnp.int32(3),
            "wave": jnp.int32(1),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["buckets"]

    def over(self, g):
        return g["buckets"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        right = action == 2
        left = action == 3
        px = jnp.clip(
            g["px"] + 3.5 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            12.0, RAW_W - 12.0,
        )
        k1, k2, k3 = jax.random.split(key, 3)
        spd = 1.5 + 0.3 * g["wave"].astype(jnp.float32)
        bomber_x = g["bomber_x"] + g["bdir"] * spd
        bdir = jnp.where(
            (bomber_x < 15) | (bomber_x > RAW_W - 15)
            | (jax.random.uniform(k1, ()) < 0.05),
            -g["bdir"], g["bdir"],
        )
        fall = 1.6 + 0.3 * g["wave"].astype(jnp.float32)
        by = g["by"] + jnp.where(g["b_live"], fall, 0.0)
        # Catch: any bucket (stack near the paddle) under the bomb.
        caught = g["b_live"] & (by > 180.0) & (
            jnp.abs(g["bx"] - px) < 11.0
        )
        reward = jnp.sum(caught).astype(jnp.float32) * (
            1.0 + g["wave"].astype(jnp.float32)
        )
        missed = g["b_live"] & (by > 196.0) & ~caught
        any_missed = jnp.any(missed)
        b_live = g["b_live"] & ~caught & ~missed
        # A miss costs a bucket and clears the sky.
        b_live = jnp.where(any_missed, jnp.zeros_like(b_live), b_live)
        buckets = g["buckets"] - any_missed.astype(jnp.int32)
        # Drop cadence.
        drop_t = g["drop_t"] - 1.0
        slot = jnp.argmin(b_live.astype(jnp.int32))
        can_drop = (drop_t <= 0) & ~b_live[slot]
        bx = jnp.where(
            (jnp.arange(_KB_N) == slot) & can_drop, bomber_x, g["bx"]
        )
        by = jnp.where((jnp.arange(_KB_N) == slot) & can_drop, 25.0, by)
        b_live = b_live | ((jnp.arange(_KB_N) == slot) & can_drop)
        drop_t = jnp.where(
            can_drop,
            jnp.maximum(12.0 - g["wave"].astype(jnp.float32), 4.0),
            drop_t,
        )
        # Wave up every 50 catches' worth of score (approx via counter).
        wave = jnp.where(
            jnp.mod(g["score"] + reward.astype(jnp.int32), 500)
            < jnp.mod(g["score"], 500),
            g["wave"] + 1, g["wave"],
        )
        g2 = {
            "px": px, "bomber_x": bomber_x, "bdir": bdir,
            "bx": bx, "by": by, "b_live": b_live, "drop_t": drop_t,
            "buckets": buckets, "wave": wave,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 140.0, jnp.float32)
        bm = (jnp.abs(rows - 20.0) < 6) & (
            jnp.abs(cols - g["bomber_x"]) < 6
        )
        frame = jnp.where(bm, 60.0, frame)
        for i in range(_KB_N):
            bo = (
                g["b_live"][i]
                & (((cols - g["bx"][i]) ** 2 + (rows - g["by"][i]) ** 2)
                   < 9.0)
            )
            frame = jnp.where(bo, 30.0, frame)
        # bucket stack: one row per remaining bucket
        for b in range(3):
            bk = (
                (g["buckets"] > b)
                & (jnp.abs(rows - (185.0 + b * 7.0)) < 3)
                & (jnp.abs(cols - g["px"]) < 11)
            )
            frame = jnp.where(bk, 220.0, frame)
        return frame

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.85, gray * 0.6])


class KaboomEnv(ArcadeEnv):
    GAME_CLS = KaboomGame


# ---------------------------------------------------------------------------
# Krull: the glaive duel — throw the returning blade at spiders.
# ---------------------------------------------------------------------------

_KR_N = 4


class KrullGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "px": jnp.float32(30.0), "py": jnp.float32(105.0),
            "sx": jax.random.uniform(
                k1, (_KR_N,), jnp.float32, 90.0, RAW_W - 12.0
            ),
            "sy": jax.random.uniform(
                k2, (_KR_N,), jnp.float32, 40.0, 180.0
            ),
            "s_alive": jnp.ones((_KR_N,), bool),
            "gx": jnp.float32(-10.0), "gy": jnp.float32(0.0),
            "gvx": jnp.float32(0.0), "gvy": jnp.float32(0.0),
            "g_out": jnp.bool_(False),      # glaive in flight
            "g_back": jnp.bool_(False),     # returning
            "lives": jnp.int32(3),
            "round": jnp.int32(1),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 10)
        up = (action == 2) | (action == 6) | (action == 7)
        down = (action == 5) | (action == 8) | (action == 9)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        px = jnp.clip(
            g["px"] + 2.2 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            8.0, RAW_W / 2,
        )
        py = jnp.clip(
            g["py"] + 2.0 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            32.0, 188.0,
        )
        # Throw: glaive flies right (with vertical aim), then returns.
        throw = fire & ~g["g_out"]
        aim_y = (down.astype(jnp.float32) - up.astype(jnp.float32)) * 1.5
        gx = jnp.where(throw, px, g["gx"])
        gy = jnp.where(throw, py, g["gy"])
        gvx = jnp.where(throw, 4.0, g["gvx"])
        gvy = jnp.where(throw, aim_y, g["gvy"])
        g_out = g["g_out"] | throw
        g_back = g["g_back"]
        gx = gx + jnp.where(g_out, gvx, 0.0)
        gy = jnp.clip(gy + jnp.where(g_out, gvy, 0.0), 30.0, 190.0)
        turn = g_out & ~g_back & (gx > RAW_W - 8.0)
        g_back = g_back | turn
        # Return: home toward the hero.
        gvx = jnp.where(g_back, jnp.clip(px - gx, -4.0, 4.0), gvx)
        gvy = jnp.where(g_back, jnp.clip(py - gy, -2.5, 2.5), gvy)
        caught_back = g_back & (jnp.abs(gx - px) < 6.0) & (
            jnp.abs(gy - py) < 6.0
        )
        g_out = g_out & ~caught_back
        g_back = g_back & ~caught_back
        # Glaive kills spiders it passes (both directions).
        hit = (
            g["s_alive"] & g_out
            & (jnp.abs(g["sx"] - gx) < 8.0) & (jnp.abs(g["sy"] - gy) < 8.0)
        )
        reward = jnp.sum(hit) * 80.0
        s_alive = g["s_alive"] & ~hit
        # Spiders skitter toward the hero.
        k1, k2, k3 = jax.random.split(key, 3)
        sx = g["sx"] + jnp.clip(px - g["sx"], -1.0, 1.0) + (
            jax.random.uniform(k1, (_KR_N,)) - 0.5
        )
        sy = g["sy"] + jnp.clip(py - g["sy"], -1.0, 1.0) + (
            jax.random.uniform(k2, (_KR_N,)) - 0.5
        )
        bitten = jnp.any(
            s_alive & (jnp.abs(sx - px) < 6.0) & (jnp.abs(sy - py) < 7.0)
        )
        clear = ~jnp.any(s_alive)
        reward = reward + jnp.where(clear, 300.0, 0.0)
        sx = jnp.where(
            clear | ~s_alive,
            jax.random.uniform(k3, (_KR_N,), jnp.float32, 90.0,
                               RAW_W - 12.0),
            sx,
        )
        s_alive = s_alive | clear
        g2 = {
            "px": jnp.where(bitten, 30.0, px),
            "py": jnp.where(bitten, 105.0, py),
            "sx": sx, "sy": sy, "s_alive": s_alive,
            "gx": gx, "gy": gy, "gvx": gvx, "gvy": gvy,
            "g_out": g_out, "g_back": g_back,
            "lives": g["lives"] - bitten.astype(jnp.int32),
            "round": g["round"] + clear.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 55.0, jnp.float32)
        web = jnp.mod(rows + cols, 26.0) < 1.5
        frame = jnp.where(web & (cols > 80), 70.0, frame)
        for i in range(_KR_N):
            sp = (
                g["s_alive"][i]
                & (((cols - g["sx"][i]) ** 2 + (rows - g["sy"][i]) ** 2)
                   < 22.0)
            )
            frame = jnp.where(sp, 30.0, frame)
        gl = (
            g["g_out"]
            & (((cols - g["gx"]) ** 2 + (rows - g["gy"]) ** 2) < 12.0)
        )
        frame = jnp.where(gl, 255.0, frame)
        pl = (jnp.abs(rows - g["py"]) < 8) & (jnp.abs(cols - g["px"]) < 4)
        return jnp.where(pl, 230.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.8, gray * 0.5])


class KrullEnv(ArcadeEnv):
    GAME_CLS = KrullGame


# ---------------------------------------------------------------------------
# Pitfall: jungle run — jump pits/logs, grab treasures, 20-minute clock.
# ---------------------------------------------------------------------------

_PF_N = 3   # hazards per screen


class PitfallGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "px": jnp.float32(20.0),
            "py": jnp.float32(0.0),       # jump height
            "jv": jnp.float32(0.0),
            "scroll": jnp.float32(0.0),
            "hx": jax.random.uniform(
                k1, (_PF_N,), jnp.float32, 60.0, RAW_W + 120.0
            ),
            "htype": jax.random.randint(k2, (_PF_N,), 0, 3),
            # 0 pit 1 log 2 croc
            "treas_x": jnp.float32(RAW_W + 200.0),
            "clock": jnp.float32(20.0 * 60.0 * 15.0),  # ticks
            "lives": jnp.int32(3),
            "score": jnp.int32(2000),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return (g["lives"] <= 0) | (g["clock"] <= 0)

    def tick(self, g, action, key):
        over0 = self.over(g)
        up = (action == 2) | (action == 6) | (action == 7) | (action == 1)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        run = (
            right.astype(jnp.float32) - left.astype(jnp.float32)
        ) * 2.0
        grounded = g["py"] <= 0.0
        jv = jnp.where(
            up & grounded, 5.5, g["jv"] - jnp.where(grounded, 0.0, 0.45)
        )
        py = jnp.maximum(g["py"] + jv, 0.0)
        jv = jnp.where(py <= 0.0, 0.0, jv)
        # World scrolls opposite the run direction.
        scroll = g["scroll"] + run
        hx = g["hx"] - run
        treas_x = g["treas_x"] - run
        k1, k2, k3 = jax.random.split(key, 3)
        # Hazards at the runner's x≈20 hurt when grounded (logs lose
        # points, pits/crocs lose a life).
        at = jnp.abs(hx - 20.0) < 8.0
        log_hit = jnp.any(at & (g["htype"] == 1)) & grounded
        hole_hit = jnp.any(at & (g["htype"] != 1)) & grounded
        reward = -jnp.where(log_hit, 100.0, 0.0)
        # Treasure pickup.
        got = jnp.abs(treas_x - 20.0) < 8.0
        reward = reward + jnp.where(got, 2000.0, 0.0)
        treas_x = jnp.where(
            got, 250.0 + jax.random.uniform(k3, (), maxval=300.0), treas_x
        )
        # Recycle passed hazards ahead.
        gone = (hx < -15.0) | (hx > RAW_W + 260.0)
        hx = jnp.where(
            gone,
            RAW_W + jax.random.uniform(k1, (_PF_N,), jnp.float32, 0.0,
                                       220.0),
            hx,
        )
        htype = jnp.where(
            gone, jax.random.randint(k2, (_PF_N,), 0, 3), g["htype"]
        )
        lives = g["lives"] - hole_hit.astype(jnp.int32)
        g2 = {
            "px": g["px"],
            "py": jnp.where(hole_hit, 0.0, py),
            "jv": jnp.where(hole_hit, 0.0, jv),
            "scroll": scroll,
            "hx": jnp.where(hole_hit, hx + 60.0, hx),
            "htype": htype,
            "treas_x": treas_x,
            "clock": g["clock"] - 1.0,
            "lives": lives,
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        ground_y = 150.0
        frame = jnp.where(rows < ground_y, 70.0, 110.0)  # jungle / ground
        canopy = (rows < 40) & (jnp.mod(cols + g["scroll"], 30.0) < 18.0)
        frame = jnp.where(canopy, 40.0, frame)
        under = rows > 185
        frame = jnp.where(under, 50.0, frame)
        for i in range(_PF_N):
            t = g["htype"][i]
            is_pit = t != 1
            hz = (
                (jnp.abs(cols - g["hx"][i]) < 9)
                & jnp.where(
                    is_pit, (rows > ground_y),
                    (jnp.abs(rows - (ground_y - 5.0)) < 5),
                )
            )
            lum = jnp.where(t == 0, 20.0, jnp.where(t == 1, 90.0, 140.0))
            frame = jnp.where(hz, lum, frame)
        tr = (
            (jnp.abs(cols - g["treas_x"]) < 5)
            & (jnp.abs(rows - (ground_y - 6.0)) < 5)
        )
        frame = jnp.where(tr, 240.0, frame)
        ph = ground_y - 10.0 - g["py"] * 2.0
        pl = (jnp.abs(rows - ph) < 8) & (jnp.abs(cols - 20.0) < 4)
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.6, gray, gray * 0.55])


class PitfallEnv(ArcadeEnv):
    GAME_CLS = PitfallGame
