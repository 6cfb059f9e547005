"""Jumanji-class navigation/search envs: Sokoban, PacMan, MMST,
SearchAndRescue.

Behavioral reference (jumanji v1.1.1 semantics):

* Sokoban — ``envpool/jumanji/sokoban_env.h``: 10x10 Boxoban-style level
  (the built-in fallback level, used whenever the Boxoban .npy asset is
  absent); invalid pushes are no-ops; reward = change in on-target boxes
  - 0.1 per step + 10 on solving all 4 boxes.
* PacMan — ``envpool/jumanji/pac_man_env.h``: 31x28 grid with boundary
  walls, 3 active pellets at (1, 2..4); +10 per pellet, -1 and terminal
  for walking into a wall; ghosts/power-ups are static observation
  fields in the default configuration.
* MMST — ``envpool/jumanji/mmst_env.h``: 3 agents walk a 36-node path
  graph (|a-b| == 1 adjacency); each step every agent must hop to an
  unvisited neighbor (+1 each), an impossible hop gives -1 and ends the
  episode; agents move in index order.
* SearchAndRescue — ``envpool/jumanji/search_and_rescue_env.h``: 2
  searchers in the unit square move by 0.1 * action per axis; +1 and
  terminal when any searcher comes within 0.051 of the hidden target at
  (0.1, 0.0).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

# ---------------------------------------------------------------------------
# Sokoban
# ---------------------------------------------------------------------------

_S_N = 10
_S_BOXES = 4
_S_EMPTY, _S_WALL, _S_TARGET, _S_AGENT, _S_BOX = 0, 1, 2, 3, 4
# up, right, down, left
_S_DR = jnp.asarray([-1, 0, 1, 0], jnp.int32)
_S_DC = jnp.asarray([0, 1, 0, -1], jnp.int32)

# The reference's built-in fallback level (sokoban_env.h:101-114), used
# when the Boxoban dataset asset is unavailable.
_S_ASCII = (
    "##########",
    "#       ##",
    "# ....   #",
    "# $$$$  ##",
    "# @    # #",
    "#   #   # ",
    "#        #",
    "##########",
    "##########",
    "##########",
)


def _parse_level():
    fixed = np.zeros((_S_N, _S_N), np.uint8)
    variable = np.zeros((_S_N, _S_N), np.uint8)
    agent = (0, 0)
    for r, line in enumerate(_S_ASCII):
        for c, ch in enumerate(line):
            if ch == "#":
                fixed[r, c] = _S_WALL
            elif ch == ".":
                fixed[r, c] = _S_TARGET
            elif ch == "@":
                variable[r, c] = _S_AGENT
                agent = (r, c)
            elif ch == "$":
                variable[r, c] = _S_BOX
    return fixed, variable, agent


class SokobanEnv(TpuEnv):
    DEFAULT_CONFIG = {"sokoban_level_index": -1}

    def state_spec(self):
        return {
            "obs:grid": ArraySpec(jnp.uint8, (_S_N, _S_N, 2), 0, 4),
            "obs:step_count": ArraySpec(jnp.int32, (), 0, 120),
            "info:prop_correct_boxes": ArraySpec(jnp.float32, (), 0.0, 1.0),
            "info:solved": ArraySpec(jnp.bool_, ()),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.int32, (), 0, 3, is_discrete=True)}

    def _fixed(self):
        fixed, _, _ = _parse_level()
        return jnp.asarray(fixed)

    def _targets(self, variable):
        return jnp.sum(
            (self._fixed() == _S_TARGET) & (variable == _S_BOX)
        ).astype(jnp.int32)

    def _obs(self, variable, step):
        targets = self._targets(variable)
        return {
            "obs:grid": jnp.stack(
                [variable, self._fixed()], axis=-1
            ).astype(jnp.uint8),
            "obs:step_count": step,
            "info:prop_correct_boxes": targets.astype(jnp.float32)
            / _S_BOXES,
            "info:solved": targets == _S_BOXES,
        }

    def reset_env(self, key):
        _, variable, agent = _parse_level()
        st = {
            "variable": jnp.asarray(variable),
            "ar": jnp.int32(agent[0]),
            "ac": jnp.int32(agent[1]),
            "step": jnp.int32(0),
        }
        return st, self._obs(st["variable"], st["step"])

    def step_env(self, state, action, key):
        action = jnp.clip(action, 0, 3)
        fixed = self._fixed()
        var = state["variable"]
        prev_targets = self._targets(var)

        r1 = state["ar"] + _S_DR[action]
        c1 = state["ac"] + _S_DC[action]
        in1 = (r1 >= 0) & (r1 < _S_N) & (c1 >= 0) & (c1 < _S_N)
        r1c = jnp.clip(r1, 0, _S_N - 1)
        c1c = jnp.clip(c1, 0, _S_N - 1)
        wall1 = fixed[r1c, c1c] == _S_WALL
        pushes = var[r1c, c1c] == _S_BOX
        r2 = r1 + _S_DR[action]
        c2 = c1 + _S_DC[action]
        in2 = (r2 >= 0) & (r2 < _S_N) & (c2 >= 0) & (c2 < _S_N)
        r2c = jnp.clip(r2, 0, _S_N - 1)
        c2c = jnp.clip(c2, 0, _S_N - 1)
        push_blocked = (var[r2c, c2c] == _S_BOX) | (
            fixed[r2c, c2c] == _S_WALL
        )
        move = in1 & ~wall1 & (~pushes | (in2 & ~push_blocked))

        var = var.at[state["ar"], state["ac"]].set(
            jnp.where(move, _S_EMPTY, var[state["ar"], state["ac"]])
        )
        var = var.at[r2c, c2c].set(
            jnp.where(move & pushes, _S_BOX, var[r2c, c2c])
        )
        var = var.at[r1c, c1c].set(
            jnp.where(move, _S_AGENT, var[r1c, c1c])
        )
        ar = jnp.where(move, r1c, state["ar"])
        ac = jnp.where(move, c1c, state["ac"])

        step = state["step"] + 1
        targets = self._targets(var)
        solved = targets == _S_BOXES
        reward = (
            (targets - prev_targets).astype(jnp.float32)
            + jnp.where(solved, 10.0, 0.0)
            - 0.1
        )
        st = {"variable": var, "ar": ar, "ac": ac, "step": step}
        return EnvOut(
            state=st,
            obs=self._obs(var, step),
            reward=reward,
            terminated=solved,
        )


# ---------------------------------------------------------------------------
# PacMan
# ---------------------------------------------------------------------------

_P_ROWS = 31
_P_COLS = 28
_P_GHOSTS = 4
_P_POWER = 4
_P_PELLETS = 318
_P_ACTIVE = 3
_P_LIMIT = 1000
# noop, up, right, down, left
_P_DR = jnp.asarray([0, -1, 0, 1, 0], jnp.int32)
_P_DC = jnp.asarray([0, 0, 1, 0, -1], jnp.int32)


class PacManEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs:grid": ArraySpec(jnp.int32, (_P_ROWS, _P_COLS), 0, 1),
            "obs:player_locations.y": ArraySpec(
                jnp.int32, (), 0, _P_ROWS - 1
            ),
            "obs:player_locations.x": ArraySpec(
                jnp.int32, (), 0, _P_COLS - 1
            ),
            "obs:ghost_locations": ArraySpec(jnp.int32, (_P_GHOSTS, 2)),
            "obs:power_up_locations": ArraySpec(jnp.int32, (_P_POWER, 2)),
            "obs:frightened_state_time": ArraySpec(jnp.int32, ()),
            "obs:pellet_locations": ArraySpec(jnp.int32, (_P_PELLETS, 2)),
            "obs:action_mask": ArraySpec(jnp.bool_, (5,)),
            "obs:score": ArraySpec(jnp.int32, ()),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.int32, (), 0, 4, is_discrete=True)}

    def _grid(self):
        g = jnp.zeros((_P_ROWS, _P_COLS), jnp.int32)
        g = g.at[0].set(1).at[-1].set(1)
        return g.at[:, 0].set(1).at[:, -1].set(1)

    def _open(self, grid, r, c):
        in_grid = (r >= 0) & (r < _P_ROWS) & (c >= 0) & (c < _P_COLS)
        rc = jnp.clip(r, 0, _P_ROWS - 1)
        cc = jnp.clip(c, 0, _P_COLS - 1)
        return in_grid & (grid[rc, cc] == 0)

    def _obs(self, st):
        grid = self._grid()
        mask = jnp.stack(
            [
                self._open(grid, st["pr"] + _P_DR[a], st["pc"] + _P_DC[a])
                for a in range(5)
            ]
        )
        return {
            "obs:grid": grid,
            "obs:player_locations.y": st["pr"],
            "obs:player_locations.x": st["pc"],
            "obs:ghost_locations": jnp.zeros((_P_GHOSTS, 2), jnp.int32),
            "obs:power_up_locations": jnp.zeros((_P_POWER, 2), jnp.int32),
            "obs:frightened_state_time": st["fright"],
            "obs:pellet_locations": st["pellets"],
            "obs:action_mask": mask,
            "obs:score": st["score"],
        }

    def reset_env(self, key):
        pellets = jnp.full((_P_PELLETS, 2), -1, jnp.int32)
        pellets = pellets.at[:_P_ACTIVE, 0].set(1)
        pellets = pellets.at[:_P_ACTIVE, 1].set(
            2 + jnp.arange(_P_ACTIVE, dtype=jnp.int32)
        )
        st = {
            "pr": jnp.int32(1),
            "pc": jnp.int32(1),
            "pellets": pellets,
            "score": jnp.int32(0),
            "fright": jnp.int32(0),
            "step": jnp.int32(0),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        action = jnp.clip(action, 0, 4)
        grid = self._grid()
        nr = state["pr"] + _P_DR[action]
        nc = state["pc"] + _P_DC[action]
        valid = self._open(grid, nr, nc)
        pr = jnp.where(valid, jnp.clip(nr, 0, _P_ROWS - 1), state["pr"])
        pc = jnp.where(valid, jnp.clip(nc, 0, _P_COLS - 1), state["pc"])

        active = state["pellets"][:_P_ACTIVE]
        hit = valid & (active[:, 0] == pr) & (active[:, 1] == pc)
        ate = jnp.any(hit)
        pellets = state["pellets"].at[:_P_ACTIVE].set(
            jnp.where(hit[:, None], -1, active)
        )
        score = state["score"] + jnp.where(ate, 10, 0)
        reward = jnp.where(valid, jnp.where(ate, 10.0, 0.0), -1.0).astype(
            jnp.float32
        )
        step = state["step"] + 1
        none_left = jnp.all(pellets[:_P_ACTIVE, 0] < 0)
        terminated = ~valid | none_left | (step >= _P_LIMIT)
        st = {
            "pr": pr,
            "pc": pc,
            "pellets": pellets,
            "score": score,
            "fright": state["fright"] - 1,
            "step": step,
        }
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward,
            terminated=terminated,
        )


# ---------------------------------------------------------------------------
# MMST
# ---------------------------------------------------------------------------

_G_NODES = 36
_G_AGENTS = 3
_G_LIMIT = 70


class MMSTEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs:node_types": ArraySpec(jnp.int32, (_G_NODES,), -1, 5),
            "obs:adj_matrix": ArraySpec(
                jnp.int32, (_G_NODES, _G_NODES), 0, 1
            ),
            "obs:positions": ArraySpec(jnp.int32, (_G_AGENTS,), -1, 35),
            "obs:step_count": ArraySpec(jnp.int32, (), 0, _G_LIMIT),
            "obs:action_mask": ArraySpec(jnp.bool_, (_G_AGENTS, _G_NODES)),
        }

    def action_spec(self):
        return {
            "action": ArraySpec(
                jnp.int32, (_G_AGENTS,), 0, _G_NODES - 1, is_discrete=True
            )
        }

    def _adj(self):
        idx = jnp.arange(_G_NODES)
        return (jnp.abs(idx[:, None] - idx[None, :]) == 1).astype(jnp.int32)

    def _obs(self, visited, positions, step):
        nodes = jnp.arange(_G_NODES)
        adjacent = jnp.abs(positions[:, None] - nodes[None, :]) == 1
        mask = ~visited[None, :] & adjacent
        return {
            "obs:node_types": jnp.where(visited, 5, 0).astype(jnp.int32),
            "obs:adj_matrix": self._adj(),
            "obs:positions": positions,
            "obs:step_count": step,
            "obs:action_mask": mask,
        }

    def reset_env(self, key):
        positions = jnp.asarray([0, 12, 24], jnp.int32)
        visited = jnp.zeros((_G_NODES,), jnp.bool_).at[positions].set(True)
        st = {
            "visited": visited,
            "positions": positions,
            "step": jnp.int32(0),
        }
        return st, self._obs(visited, positions, st["step"])

    def step_env(self, state, action, key):
        action = jnp.clip(action, 0, _G_NODES - 1)

        def body(agent, carry):
            visited, positions, valid, reward = carry
            node = action[agent]
            ok = ~visited[node] & (
                jnp.abs(positions[agent] - node) == 1
            )
            positions = positions.at[agent].set(
                jnp.where(ok, node, positions[agent])
            )
            visited = visited.at[node].set(visited[node] | ok)
            return visited, positions, valid & ok, reward + ok

        visited, positions, valid, reward = lax.fori_loop(
            0,
            _G_AGENTS,
            body,
            (
                state["visited"],
                state["positions"],
                jnp.bool_(True),
                jnp.int32(0),
            ),
        )
        step = state["step"] + 1
        terminated = ~valid | jnp.all(visited) | (step >= _G_LIMIT)
        st = {"visited": visited, "positions": positions, "step": step}
        return EnvOut(
            state=st,
            obs=self._obs(visited, positions, step),
            reward=jnp.where(valid, reward.astype(jnp.float32), -1.0),
            terminated=terminated,
        )


# ---------------------------------------------------------------------------
# SearchAndRescue
# ---------------------------------------------------------------------------

_R_SEARCHERS = 2
_R_VIEW_ROWS = 3
_R_VIEW_COLS = 128
_R_LIMIT = 400
_R_TARGET = jnp.asarray([0.1, 0.0], jnp.float32)
_R_RADIUS = 0.051


class SearchAndRescueEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs:searcher_views": ArraySpec(
                jnp.float32,
                (_R_SEARCHERS, _R_VIEW_ROWS, _R_VIEW_COLS),
                -1.0,
                1.0,
            ),
            "obs:targets_remaining": ArraySpec(jnp.float32, (), 0.0, 1.0),
            "obs:step": ArraySpec(jnp.int32, (), 0, _R_LIMIT),
            "obs:positions": ArraySpec(
                jnp.float32, (_R_SEARCHERS, 2), 0.0, 1.0
            ),
        }

    def action_spec(self):
        return {
            "action": ArraySpec(
                jnp.float32, (_R_SEARCHERS, 2), -1.0, 1.0
            )
        }

    def _obs(self, pos, found, step):
        views = jnp.zeros(
            (_R_SEARCHERS, _R_VIEW_ROWS, _R_VIEW_COLS), jnp.float32
        )
        views = views.at[:, 0, 0].set(_R_TARGET[0] - pos[:, 0])
        views = views.at[:, 1, 0].set(_R_TARGET[1] - pos[:, 1])
        return {
            "obs:searcher_views": views,
            "obs:targets_remaining": jnp.where(found, 0.0, 1.0).astype(
                jnp.float32
            ),
            "obs:step": step,
            "obs:positions": pos,
        }

    def reset_env(self, key):
        pos = jnp.asarray([[0.0, 0.0], [1.0, 1.0]], jnp.float32)
        st = {
            "pos": pos,
            "found": jnp.bool_(False),
            "step": jnp.int32(0),
        }
        return st, self._obs(pos, st["found"], st["step"])

    def step_env(self, state, action, key):
        delta = 0.1 * jnp.clip(action, -1.0, 1.0)
        pos = jnp.clip(state["pos"] + delta, 0.0, 1.0)
        dist = jnp.sqrt(jnp.sum((pos - _R_TARGET[None, :]) ** 2, axis=1))
        detect = jnp.any(dist <= _R_RADIUS)
        newly = ~state["found"] & detect
        found = state["found"] | detect
        step = state["step"] + 1
        terminated = found | (step >= _R_LIMIT)
        st = {"pos": pos, "found": found, "step": step}
        return EnvOut(
            state=st,
            obs=self._obs(pos, found, step),
            reward=newly.astype(jnp.float32),
            terminated=terminated,
        )
