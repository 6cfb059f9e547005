"""Grid-engine procgen games: maze, heist, chaser, miner."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .core import RES, decode_action, gen_maze_banked as gen_maze, render_grid

_WALL = np.asarray([60.0, 60.0, 60.0])
_FLOOR = np.asarray([180.0, 170.0, 150.0])
_AGENT = np.asarray([40.0, 90.0, 220.0])
_GOAL = np.asarray([240.0, 210.0, 40.0])
_KEY_RGB = [
    np.asarray([230.0, 60.0, 60.0]),
    np.asarray([60.0, 200.0, 60.0]),
    np.asarray([60.0, 60.0, 230.0]),
]
_DIRT = np.asarray([120.0, 85.0, 50.0])
_DIAMOND = np.asarray([120.0, 220.0, 240.0])
_BOULDER = np.asarray([130.0, 130.0, 130.0])
_ENEMY = np.asarray([220.0, 60.0, 60.0])
_DOT = np.asarray([250.0, 240.0, 200.0])


class GridGame:
    """Shared: agent on an [n, n] grid; one move per step."""

    def __init__(self, size: int, mode: str):
        self.n = size
        self.mode = mode

    def move_agent(self, walls, pos, dx, dy):
        # Grid coords: (row, col); dy up = row-1.
        nr = jnp.clip(pos[0] - dy, 0, self.n - 1)
        nc = jnp.clip(pos[1] + dx, 0, self.n - 1)
        blocked = walls[nr, nc]
        return jnp.where(
            blocked, pos, jnp.stack([nr, nc])
        )


class MazeGame(GridGame):
    """maze: reach the goal cell (+10, episode ends)."""

    def init(self, key):
        k1, k2 = jax.random.split(key)
        walls = gen_maze(
            k1, self.n, extra_open=0.1 if self.mode == "easy" else 0.0
        )
        # Goal: a far open cell; agent at (1, 1).
        open_cells = ~walls
        rows = jax.lax.broadcasted_iota(jnp.int32, (self.n, self.n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (self.n, self.n), 1)
        dist = rows + cols
        score = jnp.where(open_cells, dist, -1)
        gi = jnp.argmax(score)
        goal = jnp.stack([gi // self.n, gi % self.n])
        return {
            "walls": walls,
            "pos": jnp.asarray([1, 1], jnp.int32),
            "goal": goal.astype(jnp.int32),
        }

    def tick(self, g, action, key):
        dx, dy, _ = decode_action(action)
        pos = self.move_agent(g["walls"], g["pos"], dx, dy)
        done = (pos == g["goal"]).all()
        reward = jnp.where(done, 10.0, 0.0)
        return {**g, "pos": pos}, reward, done

    def render(self, g):
        cells = jnp.where(
            g["walls"][..., None],
            jnp.asarray(_WALL, jnp.float32),
            jnp.asarray(_FLOOR, jnp.float32),
        )
        cells = cells.at[g["goal"][0], g["goal"][1]].set(
            jnp.asarray(_GOAL, jnp.float32)
        )
        cells = cells.at[g["pos"][0], g["pos"][1]].set(
            jnp.asarray(_AGENT, jnp.float32)
        )
        return render_grid(cells)


class HeistGame(GridGame):
    """heist: collect keys in color order, open the vault (+10)."""

    N_KEYS = 3

    def init(self, key):
        k1, k2 = jax.random.split(key)
        walls = gen_maze(k1, self.n, extra_open=0.15)
        open_mask = ~walls
        # Place 3 keys + vault at random open cells.
        flat = open_mask.reshape(-1).astype(jnp.float32)
        flat = flat.at[self.n + 1].set(0.0)  # not on the agent
        ks = jax.random.split(k2, self.N_KEYS + 1)
        spots = []
        for i in range(self.N_KEYS + 1):
            p = flat / flat.sum()
            idx = jax.random.choice(ks[i], self.n * self.n, p=p)
            flat = flat.at[idx].set(0.0)
            spots.append(jnp.stack([idx // self.n, idx % self.n]))
        return {
            "walls": walls,
            "pos": jnp.asarray([1, 1], jnp.int32),
            "keys": jnp.stack(spots[:-1]).astype(jnp.int32),
            "vault": spots[-1].astype(jnp.int32),
            "have": jnp.zeros(self.N_KEYS, bool),
        }

    def tick(self, g, action, key):
        dx, dy, _ = decode_action(action)
        pos = self.move_agent(g["walls"], g["pos"], dx, dy)
        have = g["have"]
        for i in range(self.N_KEYS):
            on_key = (pos == g["keys"][i]).all()
            # Keys must be taken in order (lock hierarchy).
            prev_ok = jnp.bool_(True) if i == 0 else have[i - 1]
            have = have.at[i].set(have[i] | (on_key & prev_ok))
        at_vault = (pos == g["vault"]).all()
        done = at_vault & have.all()
        reward = jnp.where(done, 10.0, 0.0)
        return {**g, "pos": pos, "have": have}, reward, done

    def render(self, g):
        cells = jnp.where(
            g["walls"][..., None],
            jnp.asarray(_WALL, jnp.float32),
            jnp.asarray(_FLOOR, jnp.float32),
        )
        for i in range(self.N_KEYS):
            rgb = jnp.where(
                g["have"][i],
                jnp.asarray(_FLOOR, jnp.float32),
                jnp.asarray(_KEY_RGB[i], jnp.float32),
            )
            cells = cells.at[g["keys"][i][0], g["keys"][i][1]].set(rgb)
        cells = cells.at[g["vault"][0], g["vault"][1]].set(
            jnp.asarray(_GOAL, jnp.float32)
        )
        cells = cells.at[g["pos"][0], g["pos"][1]].set(
            jnp.asarray(_AGENT, jnp.float32)
        )
        return render_grid(cells)


class ChaserGame(GridGame):
    """chaser: eat dots (+0.5 each), avoid chasing enemies; stars make
    enemies vulnerable (eat +3); all dots cleared +10."""

    N_ENEMIES = 3

    def init(self, key):
        k1, k2 = jax.random.split(key)
        walls = gen_maze(k1, self.n, extra_open=0.35)
        dots = ~walls
        dots = dots.at[1, 1].set(False)
        ex = jax.random.randint(
            k2, (self.N_ENEMIES, 2), self.n // 2, self.n - 2
        )
        return {
            "walls": walls,
            "pos": jnp.asarray([1, 1], jnp.int32),
            "dots": dots,
            "enemies": ex.astype(jnp.int32),
            "scared": jnp.int32(0),
        }

    def tick(self, g, action, key):
        dx, dy, _ = decode_action(action)
        pos = self.move_agent(g["walls"], g["pos"], dx, dy)
        ate = g["dots"][pos[0], pos[1]]
        dots = g["dots"].at[pos[0], pos[1]].set(False)
        reward = jnp.where(ate, 0.5, 0.0)
        # Enemies: greedy chase with tie-break noise.
        keys = jax.random.split(key, self.N_ENEMIES)
        enemies = g["enemies"]
        caught = jnp.bool_(False)
        for i in range(self.N_ENEMIES):
            e = enemies[i]
            dr = jnp.sign(pos[0] - e[0])
            dc = jnp.sign(pos[1] - e[1])
            use_row = jax.random.uniform(keys[i], ()) < 0.5
            nr = jnp.clip(e[0] + jnp.where(use_row, dr, 0), 0, self.n - 1)
            nc = jnp.clip(e[1] + jnp.where(use_row, 0, dc), 0, self.n - 1)
            blocked = g["walls"][nr, nc]
            ne = jnp.where(blocked, e, jnp.stack([nr, nc]))
            enemies = enemies.at[i].set(ne)
            caught = caught | (ne == pos).all()
        cleared = ~dots.any()
        reward = reward + jnp.where(cleared, 10.0, 0.0)
        done = caught | cleared
        reward = jnp.where(caught, 0.0, reward)
        return (
            {**g, "pos": pos, "dots": dots, "enemies": enemies},
            reward,
            done,
        )

    def render(self, g):
        cells = jnp.where(
            g["walls"][..., None],
            jnp.asarray(_WALL, jnp.float32),
            jnp.asarray([25.0, 25.0, 35.0], jnp.float32),
        )
        cells = jnp.where(
            (g["dots"] & ~g["walls"])[..., None],
            jnp.asarray(_DOT, jnp.float32),
            cells,
        )
        for i in range(self.N_ENEMIES):
            cells = cells.at[g["enemies"][i][0], g["enemies"][i][1]].set(
                jnp.asarray(_ENEMY, jnp.float32)
            )
        cells = cells.at[g["pos"][0], g["pos"][1]].set(
            jnp.asarray(_AGENT, jnp.float32)
        )
        return render_grid(cells)


class MinerGame(GridGame):
    """miner (boulderdash): dig dirt, collect diamonds (+1), reach the
    exit after all diamonds (+10); falling boulders kill."""

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        # World: dirt everywhere, boulders and diamonds sprinkled.
        dirt = jnp.ones((self.n, self.n), bool).at[1, 1].set(False)
        u = jax.random.uniform(k1, (self.n, self.n))
        boulders = (u < 0.12)
        v = jax.random.uniform(k2, (self.n, self.n))
        diamonds = (v < 0.08) & ~boulders
        boulders = boulders.at[1, 1].set(False).at[0, :].set(False)
        diamonds = diamonds.at[1, 1].set(False)
        exit_pos = jnp.asarray([self.n - 2, self.n - 2], jnp.int32)
        diamonds = diamonds.at[exit_pos[0], exit_pos[1]].set(False)
        boulders = boulders.at[exit_pos[0], exit_pos[1]].set(False)
        return {
            "pos": jnp.asarray([1, 1], jnp.int32),
            "dirt": dirt,
            "boulders": boulders,
            "diamonds": diamonds,
            "exit": exit_pos,
        }

    def tick(self, g, action, key):
        dx, dy, _ = decode_action(action)
        nr = jnp.clip(g["pos"][0] - dy, 0, self.n - 1)
        nc = jnp.clip(g["pos"][1] + dx, 0, self.n - 1)
        blocked = g["boulders"][nr, nc]
        pos = jnp.where(blocked, g["pos"], jnp.stack([nr, nc]))
        dirt = g["dirt"].at[pos[0], pos[1]].set(False)
        got = g["diamonds"][pos[0], pos[1]]
        diamonds = g["diamonds"].at[pos[0], pos[1]].set(False)
        reward = jnp.where(got, 1.0, 0.0)
        # Boulder gravity: fall into empty (no dirt, no boulder) cells.
        below_empty = (
            ~dirt & ~g["boulders"]
        )
        can_fall = g["boulders"] & jnp.roll(below_empty, -1, axis=0)
        can_fall = can_fall.at[-1, :].set(False)
        boulders = (g["boulders"] & ~can_fall) | jnp.roll(can_fall, 1, axis=0)
        crushed = boulders[pos[0], pos[1]]
        all_got = ~diamonds.any()
        at_exit = (pos == g["exit"]).all()
        win = all_got & at_exit
        reward = reward + jnp.where(win, 10.0, 0.0)
        done = crushed | win
        return (
            {**g, "pos": pos, "dirt": dirt, "boulders": boulders,
             "diamonds": diamonds},
            reward,
            done,
        )

    def render(self, g):
        base = jnp.where(
            g["dirt"][..., None],
            jnp.asarray(_DIRT, jnp.float32),
            jnp.asarray([30.0, 25.0, 20.0], jnp.float32),
        )
        base = jnp.where(
            g["boulders"][..., None], jnp.asarray(_BOULDER, jnp.float32), base
        )
        base = jnp.where(
            g["diamonds"][..., None], jnp.asarray(_DIAMOND, jnp.float32), base
        )
        base = base.at[g["exit"][0], g["exit"][1]].set(
            jnp.asarray(_GOAL, jnp.float32)
        )
        base = base.at[g["pos"][0], g["pos"][1]].set(
            jnp.asarray(_AGENT, jnp.float32)
        )
        return render_grid(base)
