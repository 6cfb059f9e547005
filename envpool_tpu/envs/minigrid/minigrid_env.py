"""MiniGrid env family — task generators + env class.

Behavioral reference: ``envpool/minigrid/minigrid.h`` (spec surface:
``obs:direction``, ``obs:image`` [view,view,3] uint8, ``obs:mission``,
``info:agent_pos``) and ``envpool/minigrid/registration.py`` (task grid).
Scope this round: Empty(+Random), DoorKey, FourRooms, LavaGap, DistShift,
SimpleCrossing/LavaCrossing — the most-used subset of the 81 reference
tasks; mission text is emitted as a fixed id (``info:mission_id``) rather
than bytes.

Reward on reaching the goal: ``1 - 0.9 * (t+1) / max_steps`` (MiniGrid
``_reward``); stepping into lava terminates with 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec
from . import core as mg


class MiniGridEnv(TpuEnv):
    DEFAULT_CONFIG = {
        "env_name": "empty",
        "size": 8,
        "width": 0,          # 0 → use size
        "height": 0,
        "agent_start_pos": (1, 1),
        "agent_start_dir": 0,
        "agent_view_size": 7,
        "random_start": False,
        "num_crossings": 1,
        "obstacle_type": "lava",
        "strip2_row": 2,
        "gap_pos": 0,        # 0 → random (LavaGap)
    }

    # -- config ------------------------------------------------------------

    @property
    def _wh(self) -> tuple[int, int]:
        w = int(self.config["width"]) or int(self.config["size"])
        h = int(self.config["height"]) or int(self.config["size"])
        return w, h

    @property
    def _view(self) -> int:
        return int(self.config["agent_view_size"])

    # -- specs -------------------------------------------------------------

    def state_spec(self):
        v = self._view
        w, h = self._wh
        bound = max(w, h, 25)
        return {
            "obs:direction": ArraySpec(jnp.int32, (), 0, 3, is_discrete=True),
            "obs:image": ArraySpec(jnp.uint8, (v, v, 3), 0, 255),
            "info:agent_pos": ArraySpec(jnp.int32, (2,), 0, bound),
            "info:mission_id": ArraySpec(jnp.int32, (), -1, 1024),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.int32, (), 0, 6, is_discrete=True)}

    # -- generation --------------------------------------------------------

    def _gen(self, key):
        """Build (grid, agent_pos, agent_dir) for the configured task."""
        name = str(self.config["env_name"])
        w, h = self._wh
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        grid = mg.empty_grid(w, h)

        if name == "empty":
            grid = mg.set_cell(grid, w - 2, h - 2, mg.GOAL, mg.GREEN)
            if bool(self.config["random_start"]):
                x, y = mg.place_random(k1, grid)
                d = jax.random.randint(k2, (), 0, 4, jnp.int32)
            else:
                sx, sy = self.config["agent_start_pos"]
                x, y = jnp.int32(sx), jnp.int32(sy)
                d = jnp.int32(int(self.config["agent_start_dir"]))
            return grid, jnp.stack([x, y]), d

        if name == "doorkey":
            # Vertical wall at random split col, door at random row; key on
            # the left, goal bottom-right, agent random on the left.
            split = jax.random.randint(k1, (), 2, w - 2, jnp.int32)
            cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            wall_cell = jnp.asarray([mg.WALL, mg.GREY, 0], jnp.int8)
            grid = jnp.where(
                (cols == split)[..., None], wall_cell, grid
            ).astype(jnp.int8)
            door_row = jax.random.randint(k2, (), 1, h - 1, jnp.int32)
            grid = grid.at[door_row, split].set(
                jnp.asarray([mg.DOOR, mg.YELLOW, mg.LOCKED], jnp.int8)
            )
            grid = mg.set_cell(grid, w - 2, h - 2, mg.GOAL, mg.GREEN)
            left_only = cols >= split
            kx, ky = mg.place_random(k3, grid, left_only)
            grid = grid.at[ky, kx].set(
                jnp.asarray([mg.KEY, mg.YELLOW, 0], jnp.int8)
            )
            ax, ay = mg.place_random(k4, grid, left_only)
            d = jax.random.randint(k5, (), 0, 4, jnp.int32)
            return grid, jnp.stack([ax, ay]), d

        if name == "fourrooms":
            mid_w, mid_h = w // 2, h // 2
            cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            wall_cell = jnp.asarray([mg.WALL, mg.GREY, 0], jnp.int8)
            wall_mask = (cols == mid_w) | (rows == mid_h)
            grid = jnp.where(wall_mask[..., None], wall_cell, grid).astype(
                jnp.int8
            )
            # One gap per wall segment.
            gaps = [
                (jax.random.randint(k1, (), 1, mid_h, jnp.int32), mid_w),
                (jax.random.randint(k2, (), mid_h + 1, h - 1, jnp.int32), mid_w),
                (mid_h, jax.random.randint(k3, (), 1, mid_w, jnp.int32)),
                (mid_h, jax.random.randint(k4, (), mid_w + 1, w - 1, jnp.int32)),
            ]
            for gy, gx in gaps:
                grid = grid.at[gy, gx].set(
                    jnp.asarray([mg.EMPTY, 0, 0], jnp.int8)
                )
            k5a, k5b, k5c = jax.random.split(k5, 3)
            gx_, gy_ = mg.place_random(k5a, grid)
            grid = grid.at[gy_, gx_].set(
                jnp.asarray([mg.GOAL, mg.GREEN, 0], jnp.int8)
            )
            ax, ay = mg.place_random(k5b, grid)
            d = jax.random.randint(k5c, (), 0, 4, jnp.int32)
            return grid, jnp.stack([ax, ay]), d

        if name == "lavagap":
            # Lava column at w//2 with one gap.
            col = w // 2
            rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            lava_cell = jnp.asarray([mg.LAVA, mg.RED, 0], jnp.int8)
            inner = (rows > 0) & (rows < h - 1)
            grid = jnp.where(
                ((cols == col) & inner)[..., None], lava_cell, grid
            ).astype(jnp.int8)
            gap = int(self.config["gap_pos"]) or 0
            gap_row = (
                jnp.int32(gap)
                if gap
                else jax.random.randint(k1, (), 1, h - 1, jnp.int32)
            )
            grid = grid.at[gap_row, col].set(
                jnp.asarray([mg.EMPTY, 0, 0], jnp.int8)
            )
            grid = mg.set_cell(grid, w - 2, h - 2, mg.GOAL, mg.GREEN)
            return grid, jnp.asarray([1, 1], jnp.int32), jnp.int32(0)

        if name == "distshift":
            strip_row = int(self.config["strip2_row"])
            lava_cell = jnp.asarray([mg.LAVA, mg.RED, 0], jnp.int8)
            for c in range(3, 6):
                grid = grid.at[strip_row, c].set(lava_cell)
            grid = mg.set_cell(grid, w - 2, 1, mg.GOAL, mg.GREEN)
            return grid, jnp.asarray([1, 1], jnp.int32), jnp.int32(0)

        if name == "crossing":
            return self._gen_crossing(key, grid, w, h)

        raise ValueError(f"unknown minigrid task {name}")

    def _gen_crossing(self, key, grid, w, h):
        """SimpleCrossing / LavaCrossing: N horizontal rivers with gaps."""
        n = int(self.config["num_crossings"])
        obstacle = (
            mg.LAVA
            if str(self.config["obstacle_type"]) == "lava"
            else mg.WALL
        )
        color = mg.RED if obstacle == mg.LAVA else mg.GREY
        cell = jnp.asarray([obstacle, color, 0], jnp.int8)
        keys = jax.random.split(key, 2 * n)
        # Evenly spaced candidate rows (2, 4, 6, ...).
        rows_avail = [2 * (i + 1) for i in range(min(n, (h - 3) // 2))]
        for idx, row in enumerate(rows_avail):
            for c in range(1, w - 1):
                grid = grid.at[row, c].set(cell)
            gap_col = jax.random.randint(
                keys[2 * idx], (), 1, w - 1, jnp.int32
            )
            grid = grid.at[row, gap_col].set(
                jnp.asarray([mg.EMPTY, 0, 0], jnp.int8)
            )
        grid = mg.set_cell(grid, w - 2, h - 2, mg.GOAL, mg.GREEN)
        return grid, jnp.asarray([1, 1], jnp.int32), jnp.int32(0)

    # -- rendering ---------------------------------------------------------

    _TILE = 8  # pixels per cell

    @property
    def render_size(self):
        w, h = self._wh
        return (h * self._TILE, w * self._TILE)

    def render_state(self, state):
        """Flat-color tile render (agent = red cell with direction notch)."""
        from . import core as mg_core

        palette = jnp.asarray(
            [
                [0, 0, 0],        # unseen
                [0, 0, 0],        # empty → black floor
                [100, 100, 100],  # wall
                [40, 40, 40],     # floor
                [200, 150, 0],    # door
                [220, 220, 0],    # key
                [0, 0, 220],      # ball
                [120, 80, 30],    # box
                [0, 200, 0],      # goal
                [255, 80, 0],     # lava
                [255, 0, 0],      # agent
            ],
            jnp.uint8,
        )
        grid = state["grid"]
        obj = grid[:, :, 0].astype(jnp.int32)
        # Put the agent marker on its cell.
        ax, ay = state["pos"][0], state["pos"][1]
        obj = obj.at[ay, ax].set(mg_core.AGENT)
        colors = palette[obj]  # [H, W, 3]
        t = self._TILE
        return jnp.repeat(jnp.repeat(colors, t, axis=0), t, axis=1)

    # -- env contract ------------------------------------------------------

    def _obs(self, st):
        return {
            "obs:direction": st["dir"],
            "obs:image": mg.egocentric_view(
                st["grid"], st["pos"], st["dir"], st["carrying"], self._view
            ),
            "info:agent_pos": st["pos"],
            "info:mission_id": jnp.int32(0),
        }

    def reset_env(self, key):
        grid, pos, d = self._gen(key)
        st = {
            "grid": grid,
            "pos": pos.astype(jnp.int32),
            "dir": d.astype(jnp.int32),
            "carrying": jnp.asarray([mg.EMPTY, 0], jnp.int8),
            "t": jnp.int32(0),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        grid, pos, d, carrying, goal, lava = mg.step_agent(
            state["grid"],
            state["pos"],
            state["dir"],
            state["carrying"],
            action,
        )
        t = state["t"] + 1
        max_steps = self.max_episode_steps
        reward = jnp.where(
            goal, 1.0 - 0.9 * t.astype(jnp.float32) / max_steps, 0.0
        ).astype(jnp.float32)
        st = {"grid": grid, "pos": pos, "dir": d, "carrying": carrying, "t": t}
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward,
            terminated=goal | lava,
        )
