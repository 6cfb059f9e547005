"""Jumanji-class cooperative multi-agent grids: Connector,
LevelBasedForaging and RobotWarehouse.

Behavioral reference (jumanji v1.1.1 semantics):

* Connector — ``envpool/jumanji/connector_env.h``: 10 agents on a 10x10
  grid draw non-crossing wires from column 0 to column 9 of their own row.
  Agents move strictly in index order within a step (later agents see
  earlier agents' fresh paths); grid encoding path/position/target =
  1/2/3 + 3*agent.  Reward comes from the *last* still-unconnected agent:
  +1 if it just connected, -0.03 otherwise, 0 once everyone is connected
  (``connector_env.h:213-222``, an intentional overwrite loop).
* LevelBasedForaging — ``envpool/jumanji/level_based_foraging_env.h``:
  2 agents / 2 food on an 8x8 grid; simultaneous moves with swap-collision
  rollback; action 5 = load; food is eaten when the summed levels of
  adjacent loading agents reach the food level; reward = eaten food level
  / total food level.
* RobotWarehouse — ``envpool/jumanji/robot_warehouse_env.h``: 4 agents on
  an 8x8 grid; a step is valid only if *every* agent's move is free and
  no two agents collide — otherwise positions freeze, reward = -1 and the
  episode ends.

TPU-native: LBF/RobotWarehouse are pure vector updates; Connector's
sequential sweep is a ``lax.fori_loop`` over the 10 agents carrying the
grid (static trip count, fuses into one XLA program).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

# ---------------------------------------------------------------------------
# Connector
# ---------------------------------------------------------------------------

_C_N = 10  # grid size == num agents
_C_LIMIT = 50
# noop, up, right, down, left
_C_DR = jnp.asarray([0, -1, 0, 1, 0], jnp.int32)
_C_DC = jnp.asarray([0, 0, 1, 0, -1], jnp.int32)


def _c_valid(grid, rows, cols, connected, agent, r, c):
    in_grid = (r >= 0) & (r < _C_N) & (c >= 0) & (c < _C_N)
    rr = jnp.clip(r, 0, _C_N - 1)
    cc = jnp.clip(c, 0, _C_N - 1)
    cell = grid[rr, cc]
    target_val = 3 + 3 * agent
    return in_grid & ~connected[agent] & ((cell == 0) | (cell == target_val))


class ConnectorEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs:grid": ArraySpec(jnp.int32, (_C_N, _C_N), 0, 31),
            "obs:action_mask": ArraySpec(jnp.bool_, (_C_N, 5)),
            "obs:step_count": ArraySpec(jnp.int32, (), 0, _C_LIMIT),
            "info:num_connections": ArraySpec(jnp.int32, (), 0, _C_N),
            "info:ratio_connections": ArraySpec(jnp.float32, (), 0.0, 1.0),
            "info:total_path_length": ArraySpec(jnp.int32, (), 0, 100),
        }

    def action_spec(self):
        return {
            "action": ArraySpec(jnp.int32, (_C_N,), 0, 4, is_discrete=True)
        }

    def _mask(self, grid, rows, cols, connected):
        agents = jnp.arange(_C_N)
        cols_mask = [jnp.ones((_C_N,), jnp.bool_)]
        for a in range(1, 5):
            r = rows + _C_DR[a]
            c = cols + _C_DC[a]
            cols_mask.append(
                jax.vmap(
                    lambda agent, rr, cc: _c_valid(
                        grid, rows, cols, connected, agent, rr, cc
                    )
                )(agents, r, c)
            )
        return jnp.stack(cols_mask, axis=1)

    def _obs(self, grid, rows, cols, connected, step):
        ncon = connected.sum().astype(jnp.int32)
        # Path cells have value 1 + 3*agent: (v - 1) % 3 == 0 and v > 0.
        paths = ((grid > 0) & ((grid - 1) % 3 == 0)).sum().astype(jnp.int32)
        return {
            "obs:grid": grid,
            "obs:action_mask": self._mask(grid, rows, cols, connected),
            "obs:step_count": step,
            "info:num_connections": ncon,
            "info:ratio_connections": ncon.astype(jnp.float32) / _C_N,
            "info:total_path_length": _C_N + paths,
        }

    def reset_env(self, key):
        agents = jnp.arange(_C_N, dtype=jnp.int32)
        rows = agents
        cols = jnp.zeros((_C_N,), jnp.int32)
        grid = jnp.zeros((_C_N, _C_N), jnp.int32)
        grid = grid.at[rows, cols].set(2 + 3 * agents)
        grid = grid.at[agents, _C_N - 1].set(3 + 3 * agents)
        connected = jnp.zeros((_C_N,), jnp.bool_)
        st = {
            "grid": grid,
            "rows": rows,
            "cols": cols,
            "connected": connected,
            "step": jnp.int32(0),
        }
        return st, self._obs(grid, rows, cols, connected, st["step"])

    def step_env(self, state, action, key):
        action = jnp.clip(action, 0, 4)
        was_connected = state["connected"]
        target_rows = jnp.arange(_C_N, dtype=jnp.int32)
        target_cols = jnp.full((_C_N,), _C_N - 1, jnp.int32)

        def body(agent, carry):
            grid, rows, cols, connected = carry
            a = action[agent]
            r = rows[agent] + _C_DR[a]
            c = cols[agent] + _C_DC[a]
            move = (a != 0) & _c_valid(
                grid, rows, cols, connected, agent, r, c
            )
            rr = jnp.clip(r, 0, _C_N - 1)
            cc = jnp.clip(c, 0, _C_N - 1)
            old_val = grid[rows[agent], cols[agent]]
            grid = grid.at[rows[agent], cols[agent]].set(
                jnp.where(move, 1 + 3 * agent, old_val)
            )
            new_rows = rows.at[agent].set(jnp.where(move, rr, rows[agent]))
            new_cols = cols.at[agent].set(jnp.where(move, cc, cols[agent]))
            now_connected = (new_rows[agent] == target_rows[agent]) & (
                new_cols[agent] == target_cols[agent]
            )
            connected = connected.at[agent].set(
                jnp.where(move, now_connected, connected[agent])
            )
            cur = grid[new_rows[agent], new_cols[agent]]
            grid = grid.at[new_rows[agent], new_cols[agent]].set(
                jnp.where(move, 2 + 3 * agent, cur)
            )
            return grid, new_rows, new_cols, connected

        grid, rows, cols, connected = lax.fori_loop(
            0,
            _C_N,
            body,
            (state["grid"], state["rows"], state["cols"], state["connected"]),
        )

        # Reward = verdict of the last agent that was still unconnected.
        newly = ~was_connected & connected
        pending = ~was_connected
        idxs = jnp.arange(_C_N)
        last = jnp.max(jnp.where(pending, idxs, -1))
        reward = jnp.where(
            last < 0,
            0.0,
            jnp.where(newly[jnp.clip(last, 0, _C_N - 1)], 1.0, -0.03),
        ).astype(jnp.float32)

        step = state["step"] + 1
        mask = self._mask(grid, rows, cols, connected)
        blocked = connected | ~jnp.any(mask[:, 1:], axis=1)
        terminated = (step >= _C_LIMIT) | jnp.all(blocked)
        st = {
            "grid": grid,
            "rows": rows,
            "cols": cols,
            "connected": connected,
            "step": step,
        }
        return EnvOut(
            state=st,
            obs=self._obs(grid, rows, cols, connected, step),
            reward=reward,
            terminated=terminated,
        )


# ---------------------------------------------------------------------------
# LevelBasedForaging
# ---------------------------------------------------------------------------

_L_N = 8
_L_AGENTS = 2
_L_FOOD = 2
_L_LIMIT = 100
# noop, up, down, left, right, load
_L_DR = jnp.asarray([0, -1, 1, 0, 0, 0], jnp.int32)
_L_DC = jnp.asarray([0, 0, 0, -1, 1, 0], jnp.int32)


class LevelBasedForagingEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        view = 3 * (_L_AGENTS + _L_FOOD)
        return {
            "obs:agents_view": ArraySpec(
                jnp.int32, (_L_AGENTS, view), -1, _L_N
            ),
            "obs:action_mask": ArraySpec(jnp.bool_, (_L_AGENTS, 6)),
            "obs:step_count": ArraySpec(jnp.int32, (), 0, _L_LIMIT),
            "info:percent_eaten": ArraySpec(jnp.float32, (), 0.0, 100.0),
        }

    def action_spec(self):
        return {
            "action": ArraySpec(
                jnp.int32, (_L_AGENTS,), 0, 5, is_discrete=True
            )
        }

    def _is_free(self, st, agent, r, c):
        """Cell (r, c) enterable by ``agent`` given current positions."""
        in_grid = (r >= 0) & (r < _L_N) & (c >= 0) & (c < _L_N)
        food_block = jnp.any(
            ~st["eaten"] & (st["food_r"] == r) & (st["food_c"] == c)
        )
        others = jnp.arange(_L_AGENTS) != agent
        agent_block = jnp.any(
            others & (st["ar"] == r) & (st["ac"] == c)
        )
        return in_grid & ~food_block & ~agent_block

    def _obs(self, st, step):
        views = []
        for viewer in range(_L_AGENTS):
            parts = []
            for f in range(_L_FOOD):
                parts += [
                    jnp.where(st["eaten"][f], -1, st["food_r"][f]),
                    jnp.where(st["eaten"][f], -1, st["food_c"][f]),
                    jnp.where(st["eaten"][f], 0, st["food_lvl"][f]),
                ]
            parts += [st["ar"][viewer], st["ac"][viewer], st["alvl"][viewer]]
            for a in range(_L_AGENTS):
                if a == viewer:
                    continue
                parts += [st["ar"][a], st["ac"][a], st["alvl"][a]]
            views.append(jnp.stack(parts))
        view = jnp.stack(views).astype(jnp.int32)

        masks = []
        for viewer in range(_L_AGENTS):
            row = []
            for a in range(5):
                row.append(
                    self._is_free(
                        st,
                        viewer,
                        st["ar"][viewer] + _L_DR[a],
                        st["ac"][viewer] + _L_DC[a],
                    )
                )
            adj = (
                jnp.abs(st["ar"][viewer] - st["food_r"])
                + jnp.abs(st["ac"][viewer] - st["food_c"])
            ) == 1
            row.append(jnp.any(~st["eaten"] & adj))
            masks.append(jnp.stack(row))
        eaten_n = st["eaten"].sum().astype(jnp.float32)
        return {
            "obs:agents_view": view,
            "obs:action_mask": jnp.stack(masks),
            "obs:step_count": step,
            "info:percent_eaten": 100.0 * eaten_n / _L_FOOD,
        }

    def reset_env(self, key):
        st = {
            "ar": jnp.asarray([0, 0], jnp.int32),
            "ac": jnp.asarray([0, 1], jnp.int32),
            "alvl": jnp.asarray([1, 1], jnp.int32),
            "food_r": jnp.asarray([1, 7], jnp.int32),
            "food_c": jnp.asarray([0, 7], jnp.int32),
            "food_lvl": jnp.asarray([2, 2], jnp.int32),
            "eaten": jnp.zeros((_L_FOOD,), jnp.bool_),
            "step": jnp.int32(0),
        }
        return st, self._obs(st, st["step"])

    def step_env(self, state, action, key):
        action = jnp.clip(action, 0, 5)
        loading = action == 5
        nr = state["ar"] + _L_DR[action]
        nc = state["ac"] + _L_DC[action]
        free = jnp.stack(
            [
                self._is_free(state, a, nr[a], nc[a])
                for a in range(_L_AGENTS)
            ]
        )
        move = (action != 5) & free
        nr = jnp.where(move, nr, state["ar"])
        nc = jnp.where(move, nc, state["ac"])
        # Swap/shared-target collision: both land on the same cell → revert.
        clash = (nr[0] == nr[1]) & (nc[0] == nc[1])
        nr = jnp.where(clash, state["ar"], nr)
        nc = jnp.where(clash, state["ac"], nc)

        total_lvl = state["food_lvl"].sum()
        adj = (
            jnp.abs(nr[None, :] - state["food_r"][:, None])
            + jnp.abs(nc[None, :] - state["food_c"][:, None])
        ) == 1  # (food, agent)
        load_lvl = jnp.sum(
            jnp.where(adj & loading[None, :], state["alvl"][None, :], 0),
            axis=1,
        )
        newly_eaten = (
            ~state["eaten"] & (load_lvl >= state["food_lvl"])
        )
        reward = jnp.sum(
            jnp.where(newly_eaten, state["food_lvl"], 0)
        ).astype(jnp.float32) / total_lvl.astype(jnp.float32)
        eaten = state["eaten"] | newly_eaten

        step = state["step"] + 1
        terminated = jnp.all(eaten) | (step >= _L_LIMIT)
        st = dict(state, ar=nr, ac=nc, eaten=eaten, step=step)
        return EnvOut(
            state=st,
            obs=self._obs(st, step),
            reward=reward,
            terminated=terminated,
        )


# ---------------------------------------------------------------------------
# RobotWarehouse
# ---------------------------------------------------------------------------

_W_N = 8
_W_AGENTS = 4
_W_VIEW = 66
_W_LIMIT = 500
# noop, up, right, down, left
_W_DR = jnp.asarray([0, -1, 0, 1, 0], jnp.int32)
_W_DC = jnp.asarray([0, 0, 1, 0, -1], jnp.int32)


class RobotWarehouseEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs:agents_view": ArraySpec(
                jnp.int32, (_W_AGENTS, _W_VIEW), 0, _W_N
            ),
            "obs:action_mask": ArraySpec(jnp.bool_, (_W_AGENTS, 5)),
            "obs:step_count": ArraySpec(jnp.int32, (), 0, _W_LIMIT),
        }

    def action_spec(self):
        return {
            "action": ArraySpec(
                jnp.int32, (_W_AGENTS,), 0, 4, is_discrete=True
            )
        }

    def _free(self, rows, cols, agent, r, c):
        in_grid = (r >= 0) & (r < _W_N) & (c >= 0) & (c < _W_N)
        others = jnp.arange(_W_AGENTS) != agent
        blocked = jnp.any(others & (rows == r) & (cols == c))
        return in_grid & ~blocked

    def _obs(self, rows, cols, step):
        view = jnp.zeros((_W_AGENTS, _W_VIEW), jnp.int32)
        view = view.at[:, 0].set(rows)
        view = view.at[:, 1].set(cols)
        view = view.at[:, 3].set(_W_N - 1)
        view = view.at[:, 4].set(_W_N - 1)
        mask = jnp.stack(
            [
                jnp.stack(
                    [
                        self._free(
                            rows,
                            cols,
                            a,
                            rows[a] + _W_DR[m],
                            cols[a] + _W_DC[m],
                        )
                        for m in range(5)
                    ]
                )
                for a in range(_W_AGENTS)
            ]
        )
        return {
            "obs:agents_view": view,
            "obs:action_mask": mask,
            "obs:step_count": step,
        }

    def reset_env(self, key):
        rows = jnp.arange(_W_AGENTS, dtype=jnp.int32)
        cols = jnp.zeros((_W_AGENTS,), jnp.int32)
        st = {"rows": rows, "cols": cols, "step": jnp.int32(0)}
        return st, self._obs(rows, cols, st["step"])

    def step_env(self, state, action, key):
        action = jnp.clip(action, 0, 4)
        rows, cols = state["rows"], state["cols"]
        nr = rows + _W_DR[action]
        nc = cols + _W_DC[action]
        free = jnp.stack(
            [self._free(rows, cols, a, nr[a], nc[a]) for a in range(_W_AGENTS)]
        )
        # Pairwise collision on the *proposed* positions (invalid agents
        # keep their proposal for the collision test, per the reference,
        # which only rolls back when the whole step is valid).
        prop_r = jnp.where(free, nr, rows)
        prop_c = jnp.where(free, nc, cols)
        same = (prop_r[:, None] == prop_r[None, :]) & (
            prop_c[:, None] == prop_c[None, :]
        )
        off_diag = ~jnp.eye(_W_AGENTS, dtype=jnp.bool_)
        collide = jnp.any(same & off_diag)
        valid = jnp.all(free) & ~collide

        new_r = jnp.where(valid, prop_r, rows)
        new_c = jnp.where(valid, prop_c, cols)
        step = state["step"] + 1
        terminated = ~valid | (step >= _W_LIMIT)
        reward = jnp.where(valid, 0.0, -1.0).astype(jnp.float32)
        st = {"rows": new_r, "cols": new_c, "step": step}
        return EnvOut(
            state=st,
            obs=self._obs(new_r, new_c, step),
            reward=reward,
            terminated=terminated,
        )
