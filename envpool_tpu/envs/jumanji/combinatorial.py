"""Combinatorial jumanji-class envs: Knapsack, TSP, Maze.

Behavioral reference: ``envpool/jumanji/`` (native C++ reimplementation of
the JAX Jumanji suite).  Rules follow Jumanji:

* **Knapsack**: N items with random (weight, value) ~ U(0,1); each step
  packs one item; packing an already-packed or over-budget item ends the
  episode; reward = value of newly packed items (dense).
* **TSP**: N cities ~ U(0,1)²; visit each exactly once; reward = −distance
  travelled per step; revisiting a city terminates with a penalty.
* **Maze**: random perfect maze (binary-tree algorithm — vectorizable,
  unlike Jumanji's recursive division, same uniform-connectivity spirit);
  reach the target for reward 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec


class KnapsackEnv(TpuEnv):
    DEFAULT_CONFIG = {"num_items": 50, "total_budget": 12.5}

    @property
    def _n(self) -> int:
        return int(self.config["num_items"])

    def state_spec(self):
        n = self._n
        return {
            "obs:weights": ArraySpec(jnp.float32, (n,), 0.0, 1.0),
            "obs:values": ArraySpec(jnp.float32, (n,), 0.0, 1.0),
            "obs:packed": ArraySpec(jnp.bool_, (n,)),
            "obs:remaining_budget": ArraySpec(jnp.float32, ()),
            "info:action_mask": ArraySpec(jnp.bool_, (n,)),
        }

    def action_spec(self):
        return {
            "action": ArraySpec(
                jnp.int32, (), 0, self._n - 1, is_discrete=True
            )
        }

    def _obs(self, st):
        feasible = (
            ~st["packed"] & (st["weights"] <= st["budget"] + 1e-9)
        )
        return {
            "obs:weights": st["weights"],
            "obs:values": st["values"],
            "obs:packed": st["packed"],
            "obs:remaining_budget": st["budget"],
            "info:action_mask": feasible,
        }

    def reset_env(self, key):
        k1, k2 = jax.random.split(key)
        n = self._n
        st = {
            "weights": jax.random.uniform(k1, (n,), jnp.float32),
            "values": jax.random.uniform(k2, (n,), jnp.float32),
            "packed": jnp.zeros(n, jnp.bool_),
            "budget": jnp.float32(float(self.config["total_budget"])),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        w = state["weights"][action]
        legal = ~state["packed"][action] & (w <= state["budget"] + 1e-9)
        packed = state["packed"].at[action].set(
            state["packed"][action] | legal
        )
        budget = jnp.where(legal, state["budget"] - w, state["budget"])
        reward = jnp.where(legal, state["values"][action], 0.0)
        feasible_left = (
            ~packed & (state["weights"] <= budget + 1e-9)
        ).any()
        st = {
            "weights": state["weights"],
            "values": state["values"],
            "packed": packed,
            "budget": budget,
        }
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward.astype(jnp.float32),
            terminated=~legal | ~feasible_left,
        )


class TSPEnv(TpuEnv):
    DEFAULT_CONFIG = {"num_cities": 20}

    @property
    def _n(self) -> int:
        return int(self.config["num_cities"])

    def state_spec(self):
        n = self._n
        return {
            "obs:coordinates": ArraySpec(jnp.float32, (n, 2), 0.0, 1.0),
            "obs:position": ArraySpec(jnp.int32, (), -1, n - 1),
            "obs:visited": ArraySpec(jnp.bool_, (n,)),
            "info:action_mask": ArraySpec(jnp.bool_, (n,)),
        }

    def action_spec(self):
        return {
            "action": ArraySpec(
                jnp.int32, (), 0, self._n - 1, is_discrete=True
            )
        }

    def _obs(self, st):
        return {
            "obs:coordinates": st["coords"],
            "obs:position": st["pos"],
            "obs:visited": st["visited"],
            "info:action_mask": ~st["visited"],
        }

    def reset_env(self, key):
        k1, k2 = jax.random.split(key)
        n = self._n
        coords = jax.random.uniform(k1, (n, 2), jnp.float32)
        start = jax.random.randint(k2, (), 0, n, jnp.int32)
        st = {
            "coords": coords,
            "pos": start,
            "visited": jnp.zeros(n, jnp.bool_).at[start].set(True),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        legal = ~state["visited"][action]
        dist = jnp.linalg.norm(
            state["coords"][action] - state["coords"][state["pos"]]
        )
        visited = state["visited"].at[action].set(True)
        all_done = visited.all()
        # Jumanji: revisiting terminates with a -num_cities penalty.
        reward = jnp.where(legal, -dist, -jnp.float32(self._n))
        st = {
            "coords": state["coords"],
            "pos": jnp.where(legal, action, state["pos"]).astype(jnp.int32),
            "visited": visited,
        }
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward.astype(jnp.float32),
            terminated=~legal | all_done,
        )


class MazeEnv(TpuEnv):
    """Binary-tree perfect maze; walls encoded per cell (N/W)."""

    DEFAULT_CONFIG = {"rows": 10, "cols": 10}

    @property
    def _rc(self):
        return int(self.config["rows"]), int(self.config["cols"])

    def state_spec(self):
        r, c = self._rc
        return {
            # Walls: [r, c, 2] — wall to the north, wall to the west.
            "obs:walls": ArraySpec(jnp.bool_, (r, c, 2)),
            "obs:agent_position": ArraySpec(jnp.int32, (2,), 0, max(r, c)),
            "obs:target_position": ArraySpec(jnp.int32, (2,), 0, max(r, c)),
            "info:action_mask": ArraySpec(jnp.bool_, (4,)),
        }

    def action_spec(self):
        # 0 up, 1 right, 2 down, 3 left.
        return {"action": ArraySpec(jnp.int32, (), 0, 3, is_discrete=True)}

    def _gen_walls(self, key):
        """Binary-tree maze: each cell removes its north OR west wall."""
        r, c = self._rc
        walls = jnp.ones((r, c, 2), jnp.bool_)
        carve_north = jax.random.bernoulli(key, 0.5, (r, c))
        # Border rules: top row must carve west; left column must carve
        # north; cell (0,0) carves nothing.
        rows = jax.lax.broadcasted_iota(jnp.int32, (r, c), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
        carve_north = jnp.where(rows == 0, False, carve_north)
        carve_north = jnp.where((cols == 0) & (rows > 0), True, carve_north)
        carve_west = ~carve_north & (cols > 0)
        walls = walls.at[:, :, 0].set(~carve_north)
        walls = walls.at[:, :, 1].set(~carve_west)
        return walls

    def _mask(self, st):
        r, c = self._rc
        y, x = st["agent"][0], st["agent"][1]
        walls = st["walls"]
        up_ok = (y > 0) & ~walls[y, x, 0]
        down_ok = (y < r - 1) & ~walls[jnp.minimum(y + 1, r - 1), x, 0]
        left_ok = (x > 0) & ~walls[y, x, 1]
        right_ok = (x < c - 1) & ~walls[y, jnp.minimum(x + 1, c - 1), 1]
        return jnp.stack([up_ok, right_ok, down_ok, left_ok])

    def _obs(self, st):
        return {
            "obs:walls": st["walls"],
            "obs:agent_position": st["agent"],
            "obs:target_position": st["target"],
            "info:action_mask": self._mask(st),
        }

    def reset_env(self, key):
        r, c = self._rc
        k1, k2, k3 = jax.random.split(key, 3)
        walls = self._gen_walls(k1)
        agent_idx = jax.random.randint(k2, (), 0, r * c, jnp.int32)
        target_idx = jax.random.randint(k3, (), 0, r * c, jnp.int32)
        st = {
            "walls": walls,
            "agent": jnp.stack([agent_idx // c, agent_idx % c]).astype(
                jnp.int32
            ),
            "target": jnp.stack([target_idx // c, target_idx % c]).astype(
                jnp.int32
            ),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        mask = self._mask(state)
        can = mask[action]
        dy = jnp.asarray([-1, 0, 1, 0])[action]
        dx = jnp.asarray([0, 1, 0, -1])[action]
        agent = jnp.where(
            can,
            state["agent"] + jnp.stack([dy, dx]),
            state["agent"],
        ).astype(jnp.int32)
        reached = (agent == state["target"]).all()
        st = {"walls": state["walls"], "agent": agent, "target": state["target"]}
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reached.astype(jnp.float32),
            terminated=reached,
        )
