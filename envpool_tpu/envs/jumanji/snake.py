"""Snake — TPU-native functional implementation (jumanji-class).

Behavioral reference: ``envpool/jumanji/`` reimplements the JAX Jumanji
suite in C++ (``jumanji/jumanji_env.h:20-43``); here Snake follows
jumanji's rules: 12x12 board, +1 for fruit, episode ends on wall/self
collision.  Body is a fixed ring buffer of cells (static shapes).
Observation: [num_rows, num_cols, 5] float32 planes
(body, head, tail, fruit, body-order) like jumanji.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_N = 12
_MAX = _N * _N
# 0 up, 1 right, 2 down, 3 left.
_DY = jnp.asarray([-1, 0, 1, 0])
_DX = jnp.asarray([0, 1, 0, -1])


class SnakeEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs": ArraySpec(jnp.float32, (_N, _N, 5), 0.0, 1.0),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.int32, (), 0, 3, is_discrete=True)}

    def _spawn_fruit(self, key, body_mask):
        logits = jnp.where(body_mask.reshape(-1), -jnp.inf, 0.0)
        idx = jax.random.categorical(key, logits)
        return jnp.stack([idx // _N, idx % _N]).astype(jnp.int32)

    def _obs(self, st):
        body = st["body"]          # [MAX, 2] ring buffer of (y, x)
        length = st["length"]
        head_i = st["head"]        # ring index of the head
        order = jnp.arange(_MAX)
        # Cell k in the buffer is alive if its age < length.
        age = jnp.mod(head_i - order, _MAX)
        alive = age < length
        grid_body = jnp.zeros((_N, _N), jnp.float32)
        grid_order = jnp.zeros((_N, _N), jnp.float32)
        ys, xs = body[:, 0], body[:, 1]
        grid_body = grid_body.at[ys, xs].max(alive.astype(jnp.float32))
        grid_order = grid_order.at[ys, xs].max(
            jnp.where(alive, 1.0 - age / _MAX, 0.0)
        )
        head = body[head_i]
        tail_i = jnp.mod(head_i - (length - 1), _MAX)
        tail = body[tail_i]
        plane = lambda pos: jnp.zeros((_N, _N), jnp.float32).at[
            pos[0], pos[1]
        ].set(1.0)
        return {
            "obs": jnp.stack(
                [
                    grid_body,
                    plane(head),
                    plane(tail),
                    plane(st["fruit"]),
                    grid_order,
                ],
                axis=-1,
            )
        }

    def reset_env(self, key):
        k1, k2 = jax.random.split(key)
        head = jax.random.randint(k1, (2,), 0, _N, jnp.int32)
        body = jnp.zeros((_MAX, 2), jnp.int32).at[0].set(head)
        body_mask = jnp.zeros((_N, _N), jnp.bool_).at[head[0], head[1]].set(
            True
        )
        st = {
            "body": body,
            "head": jnp.int32(0),
            "length": jnp.int32(1),
            "fruit": self._spawn_fruit(k2, body_mask),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        head = state["body"][state["head"]]
        ny = head[0] + _DY[action]
        nx = head[1] + _DX[action]
        hit_wall = (ny < 0) | (ny >= _N) | (nx < 0) | (nx >= _N)
        ny_c = jnp.clip(ny, 0, _N - 1)
        nx_c = jnp.clip(nx, 0, _N - 1)

        ate = (ny_c == state["fruit"][0]) & (nx_c == state["fruit"][1]) & ~hit_wall
        new_length = state["length"] + ate.astype(jnp.int32)

        # Self collision: new head cell occupied by a still-alive segment
        # (the tail cell is vacated unless we just ate).
        order = jnp.arange(_MAX)
        age = jnp.mod(state["head"] - order, _MAX)
        alive_after = age < (new_length - 1)  # segments that remain occupied
        ys, xs = state["body"][:, 0], state["body"][:, 1]
        occupied = jnp.zeros((_N, _N), jnp.bool_).at[ys, xs].max(alive_after)
        hit_self = occupied[ny_c, nx_c]

        terminated = hit_wall | hit_self
        new_head_i = jnp.mod(state["head"] + 1, _MAX)
        body = state["body"].at[new_head_i].set(
            jnp.stack([ny_c, nx_c]).astype(jnp.int32)
        )
        # Respawn fruit when eaten.
        age2 = jnp.mod(new_head_i - order, _MAX)
        alive2 = age2 < new_length
        occ2 = jnp.zeros((_N, _N), jnp.bool_).at[
            body[:, 0], body[:, 1]
        ].max(alive2)
        fruit = jnp.where(
            ate, self._spawn_fruit(key, occ2), state["fruit"]
        )
        st = {
            "body": body,
            "head": new_head_i,
            "length": new_length,
            "fruit": fruit,
        }
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=ate.astype(jnp.float32),
            terminated=terminated,
        )
