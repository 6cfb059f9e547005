"""MiniGrid task wave 2: DynamicObstacles, Fetch, GoToDoor, GoToObject,
RedBlueDoors, Unlock(+Pickup), Memory.

Behavioral reference: ``envpool/minigrid/impl/minigrid_tasks.cc`` and
``minigrid_room_tasks.cc`` (native reimplementations of Farama MiniGrid):

* DynamicObstacles (``minigrid_tasks.cc:193-265``): empty room, goal at
  (size−2, size−2), N blue balls; each step the balls jitter within their
  3×3 neighborhood *before* the agent acts, and walking forward into a
  non-goal non-empty front cell terminates with reward −1.  Action space
  is truncated to {left, right, forward}.
* Fetch (``:268-308``): N key/ball objects of random colors; mission =
  "fetch the <color> <type>" (mission id = syntax·12 + color·2 + is_ball);
  picking up anything terminates — reward only on the right object.
* GoToDoor (``:311-360``): random active room size in [5, size]; four
  distinct-colored doors, one per active wall; success = ``done`` while
  next to the target door; ``toggle`` ends the episode.
* GoToObject (``:362-410``): N distinct (type, color) objects; ``done``
  next to the target succeeds, ``toggle`` terminates.
* RedBlueDoors (``:478-519``): 2·size × size grid, inner room with a red
  door (left wall) and blue door (right wall); open red first, then blue.
* Memory (``minigrid_room_tasks.cc:27-93``): a hallway with a key/ball
  shown in the start chamber; at the hallway end, step onto the cell next
  to the matching object (success) or the other (failure); ``pickup`` is
  remapped to ``toggle``.
* Unlock / UnlockPickup (RoomGrid tasks): two 6×6 rooms joined by a
  locked door with the key on the agent's side; success = opening the
  door / carrying the box from the far room.

Ball jitter uses a single uniform 3×3 draw per obstacle (the reference
retries up to 100 uniform draws — same support, slightly stickier here;
rules-level parity per the project's RNG decision).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec
from . import core as mg
from .minigrid_env import MiniGridEnv


def _iota2(h, w):
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return rows, cols


_WALL_CELL = (mg.WALL, mg.GREY, 0)


def _paint(grid, mask, obj, color=0, state=0):
    cell = jnp.asarray([obj, color, state], jnp.int8)
    return jnp.where(mask[..., None], cell, grid).astype(jnp.int8)


class DynamicObstaclesEnv(MiniGridEnv):
    DEFAULT_CONFIG = dict(MiniGridEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update({"env_name": "dynamic_obstacles", "n_obstacles": 4})

    @property
    def _nobs(self) -> int:
        size = int(self.config["size"])
        n = int(self.config["n_obstacles"])
        return n if n <= size // 2 + 1 else size // 2

    def action_spec(self):
        return {"action": ArraySpec(jnp.int32, (), 0, 2, is_discrete=True)}

    def _gen(self, key):
        w, h = self._wh
        k1, k2, k3 = jax.random.split(key, 3)
        grid = mg.empty_grid(w, h)
        grid = mg.set_cell(grid, w - 2, h - 2, mg.GOAL, mg.GREEN)
        if bool(self.config["random_start"]):
            x, y = mg.place_random(k1, grid)
            d = jax.random.randint(k2, (), 0, 4, jnp.int32)
        else:
            sx, sy = self.config["agent_start_pos"]
            x, y = jnp.int32(sx), jnp.int32(sy)
            d = jnp.int32(int(self.config["agent_start_dir"]))
        return grid, jnp.stack([x, y]), d, k3

    def reset_env(self, key):
        grid, pos, d, k = self._gen(key)
        # Place N balls on free cells (sequentially, so they never stack).
        obstacles = []
        for i in range(self._nobs):
            k, ki = jax.random.split(k)
            free_extra = jnp.zeros(grid.shape[:2], jnp.bool_)
            free_extra = free_extra.at[pos[1], pos[0]].set(True)
            ox, oy = mg.place_random(ki, grid, free_extra)
            grid = mg.set_cell(grid, ox, oy, mg.BALL, mg.BLUE)
            obstacles.append(jnp.stack([ox, oy]))
        st = {
            "grid": grid,
            "pos": pos.astype(jnp.int32),
            "dir": d.astype(jnp.int32),
            "carrying": jnp.asarray([mg.EMPTY, 0], jnp.int8),
            "t": jnp.int32(0),
            "obstacles": jnp.stack(obstacles).astype(jnp.int32),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        grid, pos = state["grid"], state["pos"]
        action = jnp.clip(action, 0, 2)
        w, h = self._wh
        # Collision check against the PRE-move front cell.
        fwd = pos + jnp.asarray(mg.DIR_VEC)[state["dir"]]
        fx = jnp.clip(fwd[0], 0, w - 1)
        fy = jnp.clip(fwd[1], 0, h - 1)
        front_obj = grid[fy, fx, 0]
        blocked = (
            (action == mg.FORWARD)
            & (front_obj != mg.GOAL)
            & (front_obj != mg.EMPTY)
        )
        # Jitter each ball within its 3x3 box (sequential updates keep
        # balls from stacking).
        obstacles = state["obstacles"]
        keys = jax.random.split(key, self._nobs + 1)
        for i in range(self._nobs):
            o = obstacles[i]
            delta = jax.random.randint(keys[i], (2,), -1, 2)
            nx = jnp.clip(o[0] + delta[0], 0, w - 1)
            ny = jnp.clip(o[1] + delta[1], 0, h - 1)
            ok = (
                (grid[ny, nx, 0] == mg.EMPTY)
                & ~((nx == pos[0]) & (ny == pos[1]))
            )
            nx = jnp.where(ok, nx, o[0])
            ny = jnp.where(ok, ny, o[1])
            grid = grid.at[o[1], o[0]].set(
                jnp.where(
                    ok, jnp.asarray([mg.EMPTY, 0, 0], jnp.int8), grid[o[1], o[0]]
                )
            )
            grid = grid.at[ny, nx].set(
                jnp.asarray([mg.BALL, mg.BLUE, 0], jnp.int8)
            )
            obstacles = obstacles.at[i].set(jnp.stack([nx, ny]))
        grid, new_pos, d, carrying, goal, lava = mg.step_agent(
            grid, pos, state["dir"], state["carrying"], action
        )
        t = state["t"] + 1
        reward = jnp.where(
            blocked,
            -1.0,
            jnp.where(
                goal, 1.0 - 0.9 * t.astype(jnp.float32) / self.max_episode_steps, 0.0
            ),
        ).astype(jnp.float32)
        st = {
            "grid": grid,
            "pos": new_pos,
            "dir": d,
            "carrying": carrying,
            "t": t,
            "obstacles": obstacles,
        }
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward,
            terminated=blocked | goal | lava,
        )


class FetchEnv(MiniGridEnv):
    DEFAULT_CONFIG = dict(MiniGridEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update({"env_name": "fetch", "num_objs": 3})

    def reset_env(self, key):
        w, h = self._wh
        n = int(self.config["num_objs"])
        grid = mg.empty_grid(w, h)
        keys = jax.random.split(key, 2 * n + 4)
        types, colors = [], []
        for i in range(n):
            t = jnp.where(
                jax.random.bernoulli(keys[2 * i]), mg.KEY, mg.BALL
            ).astype(jnp.int8)
            c = jax.random.randint(keys[2 * i + 1], (), 0, 6).astype(jnp.int8)
            ox, oy = mg.place_random(
                jax.random.fold_in(keys[2 * i], 1), grid
            )
            grid = grid.at[oy, ox].set(jnp.stack([t, c, jnp.int8(0)]))
            types.append(t)
            colors.append(c)
        ax, ay = mg.place_random(keys[-4], grid)
        d = jax.random.randint(keys[-3], (), 0, 4, jnp.int32)
        target = jax.random.randint(keys[-2], (), 0, n)
        syntax = jax.random.randint(keys[-1], (), 0, 5)
        ttype = jnp.stack(types)[target]
        tcolor = jnp.stack(colors)[target]
        st = {
            "grid": grid,
            "pos": jnp.stack([ax, ay]).astype(jnp.int32),
            "dir": d.astype(jnp.int32),
            "carrying": jnp.asarray([mg.EMPTY, 0], jnp.int8),
            "t": jnp.int32(0),
            "target": jnp.stack(
                [ttype.astype(jnp.int32), tcolor.astype(jnp.int32), syntax]
            ),
        }
        return st, self._obs(st)

    def _obs(self, st):
        obs = MiniGridEnv._obs(self, st)
        if "target" in st:  # parent's internal calls pass a bare state
            tt, tc, syntax = st["target"][0], st["target"][1], st["target"][2]
            obs["info:mission_id"] = (
                syntax * 12 + tc * 2 + (tt == mg.BALL).astype(jnp.int32)
            )
        return obs

    def step_env(self, state, action, key):
        out = MiniGridEnv.step_env(self, state, action, key)
        st = {**out.state, "target": state["target"]}
        carrying = st["carrying"]
        picked = carrying[0] != mg.EMPTY
        match = (
            (carrying[0].astype(jnp.int32) == state["target"][0])
            & (carrying[1].astype(jnp.int32) == state["target"][1])
        )
        t = st["t"]
        reward = jnp.where(
            picked & match,
            1.0 - 0.9 * t.astype(jnp.float32) / self.max_episode_steps,
            0.0,
        ).astype(jnp.float32)
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward,
            terminated=out.terminated | picked,
        )


class GoToEnv(MiniGridEnv):
    """MiniGrid GoToDoor / GoToObject: ``done`` next to the target wins."""

    DEFAULT_CONFIG = dict(MiniGridEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update({"env_name": "goto_door", "num_objs": 2})

    def reset_env(self, key):
        name = str(self.config["env_name"])
        w, h = self._wh
        keys = jax.random.split(key, 12)
        if name == "goto_door":
            aw = jax.random.randint(keys[0], (), 5, w + 1)
            ah = jax.random.randint(keys[1], (), 5, h + 1)
            rows, cols = _iota2(h, w)
            border = (
                (rows == 0) | (cols == 0) | (rows == ah - 1) | (cols == aw - 1)
            )
            outside = (rows >= ah) | (cols >= aw)
            grid = _paint(
                jnp.zeros((h, w, 3), jnp.int8).at[:, :, 0].set(mg.EMPTY),
                border | outside,
                *_WALL_CELL,
            )
            door_colors = jax.random.permutation(keys[2], 6)[:4].astype(
                jnp.int8
            )
            dpos = [
                (jnp.int32(0), jax.random.randint(keys[3], (), 2, aw - 2)),
                (ah - 1, jax.random.randint(keys[4], (), 2, aw - 2)),
                (jax.random.randint(keys[5], (), 2, ah - 2), jnp.int32(0)),
                (jax.random.randint(keys[6], (), 2, ah - 2), aw - 1),
            ]
            for i, (ry, rx) in enumerate(dpos):
                grid = grid.at[ry, rx].set(
                    jnp.stack(
                        [jnp.int8(mg.DOOR), door_colors[i], jnp.int8(mg.CLOSED)]
                    )
                )
            inside = (rows > 0) & (cols > 0) & (rows < ah - 1) & (cols < aw - 1)
            ax, ay = mg.place_random(keys[7], grid, ~inside)
            idx = jax.random.randint(keys[8], (), 0, 4)
            ty = jnp.stack([p[0] for p in dpos])[idx]
            tx = jnp.stack([p[1] for p in dpos])[idx]
            mission = door_colors[idx].astype(jnp.int32)
        else:  # goto_object
            grid = mg.empty_grid(w, h)
            n = int(self.config["num_objs"])
            # Distinct (type, color) combos: sample a permutation of 18.
            combos = jax.random.permutation(keys[0], 18)[:n]
            txs, tys = [], []
            for i in range(n):
                t = jnp.asarray([mg.KEY, mg.BALL, mg.BOX], jnp.int8)[
                    combos[i] % 3
                ]
                c = (combos[i] // 3).astype(jnp.int8)
                ox, oy = mg.place_random(keys[2 + i], grid)
                grid = grid.at[oy, ox].set(jnp.stack([t, c, jnp.int8(0)]))
                txs.append(ox)
                tys.append(oy)
            ax, ay = mg.place_random(keys[8], grid)
            idx = jax.random.randint(keys[9], (), 0, n)
            tx = jnp.stack(txs)[idx]
            ty = jnp.stack(tys)[idx]
            combo = combos[idx]
            mission = (combo // 3) * 3 + (combo % 3)
        d = jax.random.randint(keys[10], (), 0, 4, jnp.int32)
        st = {
            "grid": grid,
            "pos": jnp.stack([ax, ay]).astype(jnp.int32),
            "dir": d.astype(jnp.int32),
            "carrying": jnp.asarray([mg.EMPTY, 0], jnp.int8),
            "t": jnp.int32(0),
            "target": jnp.stack([tx, ty, mission]).astype(jnp.int32),
        }
        return st, self._obs(st)

    def _obs(self, st):
        obs = MiniGridEnv._obs(self, st)
        if "target" in st:
            obs["info:mission_id"] = st["target"][2]
        return obs

    def step_env(self, state, action, key):
        out = MiniGridEnv.step_env(self, state, action, key)
        st = {**out.state, "target": state["target"]}
        adjacent = (
            jnp.abs(st["pos"][0] - st["target"][0])
            + jnp.abs(st["pos"][1] - st["target"][1])
        ) == 1
        done_act = action == mg.DONE
        toggle_act = action == mg.TOGGLE
        t = st["t"]
        reward = jnp.where(
            done_act & adjacent,
            1.0 - 0.9 * t.astype(jnp.float32) / self.max_episode_steps,
            out.reward,
        ).astype(jnp.float32)
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward,
            terminated=out.terminated | done_act | toggle_act,
        )


class RedBlueDoorsEnv(MiniGridEnv):
    DEFAULT_CONFIG = dict(MiniGridEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update({"env_name": "red_blue_doors", "size": 8})

    @property
    def _wh(self):
        size = int(self.config["size"])
        return 2 * size, size

    def reset_env(self, key):
        size = int(self.config["size"])
        w, h = self._wh
        k1, k2, k3, k4 = jax.random.split(key, 4)
        rows, cols = _iota2(h, w)
        room_l, room_r = size // 2, size // 2 + size - 1
        border = (
            (rows == 0)
            | (rows == h - 1)
            | (cols == 0)
            | (cols == w - 1)
            | (cols == room_l)
            | (cols == room_r)
        )
        grid = _paint(
            jnp.zeros((h, w, 3), jnp.int8).at[:, :, 0].set(mg.EMPTY),
            border,
            *_WALL_CELL,
        )
        red_y = jax.random.randint(k1, (), 1, size - 1)
        blue_y = jax.random.randint(k2, (), 1, size - 1)
        grid = grid.at[red_y, room_l].set(
            jnp.asarray([mg.DOOR, mg.RED, mg.CLOSED], jnp.int8)
        )
        grid = grid.at[blue_y, room_r].set(
            jnp.asarray([mg.DOOR, mg.BLUE, mg.CLOSED], jnp.int8)
        )
        inside = (rows > 0) & (rows < h - 1) & (cols > room_l) & (cols < room_r)
        ax, ay = mg.place_random(k3, grid, ~inside)
        d = jax.random.randint(k4, (), 0, 4, jnp.int32)
        st = {
            "grid": grid,
            "pos": jnp.stack([ax, ay]).astype(jnp.int32),
            "dir": d.astype(jnp.int32),
            "carrying": jnp.asarray([mg.EMPTY, 0], jnp.int8),
            "t": jnp.int32(0),
            "doors": jnp.stack(
                [jnp.stack([room_l, red_y]), jnp.stack([room_r, blue_y])]
            ).astype(jnp.int32),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        doors = state["doors"]
        grid = state["grid"]
        red_open_before = grid[doors[0, 1], doors[0, 0], 2] == mg.OPEN
        blue_open_before = grid[doors[1, 1], doors[1, 0], 2] == mg.OPEN
        out = MiniGridEnv.step_env(self, state, action, key)
        st = {**out.state, "doors": doors}
        g = st["grid"]
        red_open = g[doors[0, 1], doors[0, 0], 2] == mg.OPEN
        blue_open = g[doors[1, 1], doors[1, 0], 2] == mg.OPEN
        t = st["t"]
        success = blue_open & red_open_before
        fail = (blue_open & ~red_open_before) | (
            red_open & blue_open_before
        )
        reward = jnp.where(
            success,
            1.0 - 0.9 * t.astype(jnp.float32) / self.max_episode_steps,
            0.0,
        ).astype(jnp.float32)
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward,
            terminated=out.terminated | success | fail,
        )


class UnlockEnv(MiniGridEnv):
    """Unlock / UnlockPickup: two rooms, locked door, key on agent's side."""

    DEFAULT_CONFIG = dict(MiniGridEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update({"env_name": "unlock", "room_size": 6})

    @property
    def _wh(self):
        rs = int(self.config["room_size"])
        return 2 * rs - 1, rs

    def reset_env(self, key):
        w, h = self._wh
        split = w // 2
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        rows, cols = _iota2(h, w)
        grid = mg.empty_grid(w, h)
        grid = _paint(grid, cols == split, *_WALL_CELL)
        door_y = jax.random.randint(k1, (), 1, h - 1)
        color = jax.random.randint(k2, (), 0, 6).astype(jnp.int8)
        grid = grid.at[door_y, split].set(
            jnp.stack([jnp.int8(mg.DOOR), color, jnp.int8(mg.LOCKED)])
        )
        right_side = cols >= split
        kx, ky = mg.place_random(k3, grid, right_side)
        grid = grid.at[ky, kx].set(
            jnp.stack([jnp.int8(mg.KEY), color, jnp.int8(0)])
        )
        if str(self.config["env_name"]) == "unlock_pickup":
            left_side = cols <= split
            bx, by = mg.place_random(k4, grid, left_side)
            bcolor = jax.random.randint(
                jax.random.fold_in(k4, 1), (), 0, 6
            ).astype(jnp.int8)
            grid = grid.at[by, bx].set(
                jnp.stack([jnp.int8(mg.BOX), bcolor, jnp.int8(0)])
            )
        ax, ay = mg.place_random(k5, grid, right_side)
        d = jax.random.randint(k6, (), 0, 4, jnp.int32)
        st = {
            "grid": grid,
            "pos": jnp.stack([ax, ay]).astype(jnp.int32),
            "dir": d.astype(jnp.int32),
            "carrying": jnp.asarray([mg.EMPTY, 0], jnp.int8),
            "t": jnp.int32(0),
            "door": jnp.stack([split, door_y]).astype(jnp.int32),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        out = MiniGridEnv.step_env(self, state, action, key)
        st = {**out.state, "door": state["door"]}
        door = state["door"]
        t = st["t"]
        if str(self.config["env_name"]) == "unlock_pickup":
            success = st["carrying"][0] == mg.BOX
        else:
            success = st["grid"][door[1], door[0], 2] == mg.OPEN
        reward = jnp.where(
            success,
            1.0 - 0.9 * t.astype(jnp.float32) / self.max_episode_steps,
            out.reward,
        ).astype(jnp.float32)
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward,
            terminated=out.terminated | success,
        )


class MemoryEnv(MiniGridEnv):
    DEFAULT_CONFIG = dict(MiniGridEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update(
        {"env_name": "memory", "size": 13, "random_length": False}
    )

    def reset_env(self, key):
        size = int(self.config["size"])
        w = h = size
        mid = size // 2
        upper, lower = mid - 2, mid + 2
        k1, k2, k3, k4 = jax.random.split(key, 4)
        hallway_end = (
            jax.random.randint(k1, (), 4, size - 2)
            if bool(self.config["random_length"])
            else jnp.int32(size - 3)
        )
        rows, cols = _iota2(h, w)
        border = (rows == 0) | (rows == h - 1) | (cols == 0) | (cols == w - 1)
        room_walls = ((rows == upper) | (rows == lower)) & (cols >= 1) & (
            cols < 5
        )
        narrow = ((rows == upper + 1) | (rows == lower - 1)) & (
            (cols == 4) | ((cols >= 5) & (cols < hallway_end))
        )
        end_wall = (cols == hallway_end) & (rows != mid)
        far_wall = cols == hallway_end + 2
        grid = _paint(
            mg.empty_grid(w, h),
            border | room_walls | narrow | end_wall | far_wall,
            *_WALL_CELL,
        )
        start_is_key = jax.random.bernoulli(k2)
        start_t = jnp.where(start_is_key, mg.KEY, mg.BALL).astype(jnp.int8)
        other_t = jnp.where(start_is_key, mg.BALL, mg.KEY).astype(jnp.int8)
        grid = grid.at[mid - 1, 1].set(
            jnp.stack([start_t, jnp.int8(mg.GREEN), jnp.int8(0)])
        )
        first_matches = jax.random.bernoulli(k3)
        first_t = jnp.where(first_matches, start_t, other_t).astype(jnp.int8)
        second_t = jnp.where(first_matches, other_t, start_t).astype(jnp.int8)
        grid = grid.at[mid - 2, hallway_end + 1].set(
            jnp.stack([first_t, jnp.int8(mg.GREEN), jnp.int8(0)])
        )
        grid = grid.at[mid + 2, hallway_end + 1].set(
            jnp.stack([second_t, jnp.int8(mg.GREEN), jnp.int8(0)])
        )
        success_pos = jnp.where(
            first_matches,
            jnp.stack([hallway_end + 1, mid - 1]),
            jnp.stack([hallway_end + 1, mid + 1]),
        )
        failure_pos = jnp.where(
            first_matches,
            jnp.stack([hallway_end + 1, mid + 1]),
            jnp.stack([hallway_end + 1, mid - 1]),
        )
        ax = jax.random.randint(k4, (), 1, hallway_end + 1)
        st = {
            "grid": grid,
            "pos": jnp.stack([ax, jnp.int32(mid)]).astype(jnp.int32),
            "dir": jnp.int32(0),
            "carrying": jnp.asarray([mg.EMPTY, 0], jnp.int8),
            "t": jnp.int32(0),
            "goal_cells": jnp.stack([success_pos, failure_pos]).astype(
                jnp.int32
            ),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        # MapAction: pickup acts as toggle (memory task remap).
        action = jnp.where(action == mg.PICKUP, mg.TOGGLE, action)
        out = MiniGridEnv.step_env(self, state, action, key)
        st = {**out.state, "goal_cells": state["goal_cells"]}
        at_success = (st["pos"] == state["goal_cells"][0]).all()
        at_failure = (st["pos"] == state["goal_cells"][1]).all()
        t = st["t"]
        reward = jnp.where(
            at_success,
            1.0 - 0.9 * t.astype(jnp.float32) / self.max_episode_steps,
            0.0,
        ).astype(jnp.float32)
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward,
            terminated=out.terminated | at_success | at_failure,
        )
