"""Jumanji-class Cleaner env (3 cooperative agents sweep a dirty grid).

Behavioral reference: ``envpool/jumanji/cleaner_env.h`` — 10×10 grid with
cell codes 0 = dirty, 1 = clean, 2 = wall; walls sampled Bernoulli(0.15)
per cell at reset; all 3 agents start at (0,0) (forced clean); each step
every agent moves up/right/down/left, the episode ends if ANY agent's move
is invalid (off-grid or into a wall), all tiles are clean, or 100 steps
elapse; reward = newly cleaned tiles − per-timestep penalty (default 0.5).

TPU-native: agents move as a (3,)-vector update; "newly cleaned" is a
scatter of agent positions into an occupancy mask intersected with the
dirty mask (distinct cells count once, matching the sequential C++ sweep).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_MOVES = ((-1, 0), (0, 1), (1, 0), (0, -1))
_DIRTY, _CLEAN, _WALL = 0, 1, 2


class CleanerEnv(TpuEnv):
    DEFAULT_CONFIG = {
        "rows": 10,
        "cols": 10,
        "num_agents": 3,
        "wall_prob": 0.15,
        "penalty_per_timestep": 0.5,
        "time_limit": 100,
    }

    @property
    def _shape(self):
        return int(self.config["rows"]), int(self.config["cols"])

    @property
    def _agents(self) -> int:
        return int(self.config["num_agents"])

    def state_spec(self):
        rows, cols = self._shape
        a = self._agents
        return {
            "obs:grid": ArraySpec(jnp.int8, (rows, cols), 0, 2),
            "obs:agents_locations": ArraySpec(
                jnp.int32, (a, 2), 0, max(rows, cols)
            ),
            "obs:action_mask": ArraySpec(jnp.bool_, (a, 4)),
            "obs:step_count": ArraySpec(
                jnp.int32, (), 0, int(self.config["time_limit"])
            ),
        }

    def action_spec(self):
        return {
            "action": ArraySpec(
                jnp.int32, (self._agents,), 0, 3, is_discrete=True
            )
        }

    def _move_targets(self, grid, rows_pos, cols_pos):
        """Per-agent per-action target validity, (A, 4)."""
        rows, cols = self._shape
        masks = []
        for dr, dc in _MOVES:
            r = rows_pos + dr
            c = cols_pos + dc
            in_grid = (r >= 0) & (r < rows) & (c >= 0) & (c < cols)
            rr = jnp.clip(r, 0, rows - 1)
            cc = jnp.clip(c, 0, cols - 1)
            masks.append(in_grid & (grid[rr, cc] != _WALL))
        return jnp.stack(masks, axis=1)

    def _obs(self, grid, rows_pos, cols_pos, step):
        return {
            "obs:grid": grid.astype(jnp.int8),
            "obs:agents_locations": jnp.stack(
                [rows_pos, cols_pos], axis=1
            ).astype(jnp.int32),
            "obs:action_mask": self._move_targets(grid, rows_pos, cols_pos),
            "obs:step_count": step,
        }

    def reset_env(self, key):
        rows, cols = self._shape
        a = self._agents
        walls = jax.random.bernoulli(
            key, float(self.config["wall_prob"]), (rows, cols)
        )
        grid = jnp.where(walls, _WALL, _DIRTY).astype(jnp.int32)
        grid = grid.at[0, 0].set(_CLEAN)  # agents spawn here
        rows_pos = jnp.zeros(a, jnp.int32)
        cols_pos = jnp.zeros(a, jnp.int32)
        st = {
            "grid": grid,
            "rows": rows_pos,
            "cols": cols_pos,
            "step": jnp.int32(0),
        }
        return st, self._obs(grid, rows_pos, cols_pos, st["step"])

    def step_env(self, state, action, key):
        rows, cols = self._shape
        grid = state["grid"]
        rows_pos, cols_pos = state["rows"], state["cols"]
        action = jnp.clip(action, 0, 3)
        dr = jnp.asarray([m[0] for m in _MOVES], jnp.int32)[action]
        dc = jnp.asarray([m[1] for m in _MOVES], jnp.int32)[action]
        r = rows_pos + dr
        c = cols_pos + dc
        in_grid = (r >= 0) & (r < rows) & (c >= 0) & (c < cols)
        rr = jnp.clip(r, 0, rows - 1)
        cc = jnp.clip(c, 0, cols - 1)
        valid = in_grid & (grid[rr, cc] != _WALL)
        new_r = jnp.where(valid, rr, rows_pos)
        new_c = jnp.where(valid, cc, cols_pos)

        occupied = (
            jnp.zeros((rows, cols), jnp.bool_).at[new_r, new_c].set(True)
        )
        cleaned = (occupied & (grid == _DIRTY)).sum()
        new_grid = jnp.where(occupied, _CLEAN, grid)

        step = state["step"] + 1
        terminated = (
            ~valid.all()
            | ~(new_grid == _DIRTY).any()
            | (step >= int(self.config["time_limit"]))
        )
        reward = cleaned.astype(jnp.float32) - float(
            self.config["penalty_per_timestep"]
        )
        st = {"grid": new_grid, "rows": new_r, "cols": new_c, "step": step}
        return EnvOut(
            state=st,
            obs=self._obs(new_grid, new_r, new_c, step),
            reward=reward,
            terminated=terminated,
        )
