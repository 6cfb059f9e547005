"""Hex — TPU-native functional implementation.

Behavioral reference: the reference's pgx family registers ``Hex-v1``.
11x11 rhombus; player 0 connects top↔bottom, player 1 left↔right; no
draws.  Win detection is iterative connectivity propagation over the six
hex neighbors (a ``lax.while_loop`` until the reachable set stops
growing).  Supports pgx-style turns and the EnvPool per-player protocol.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_N = 11
# Hex neighbors on the rhombus grid.
_NBRS = [(-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0)]


def _dilate(mask, allowed):
    """One step of hex-adjacency growth of ``mask`` within ``allowed``."""
    grown = mask
    for dr, dc in _NBRS:
        shifted = jnp.roll(mask, (dr, dc), axis=(0, 1))
        # Zero the wrapped-around rows/cols.
        if dr == -1:
            shifted = shifted.at[-1, :].set(False)
        elif dr == 1:
            shifted = shifted.at[0, :].set(False)
        if dc == -1:
            shifted = shifted.at[:, -1].set(False)
        elif dc == 1:
            shifted = shifted.at[:, 0].set(False)
        grown = grown | shifted
    return grown & allowed


def _connected(stones, player):
    """Whether ``player``'s stones connect their two edges."""
    if player == 0:
        seed = stones & (
            jax.lax.broadcasted_iota(jnp.int32, (_N, _N), 0) == 0
        )
        goal_axis = 0
    else:
        seed = stones & (
            jax.lax.broadcasted_iota(jnp.int32, (_N, _N), 1) == 0
        )
        goal_axis = 1

    def cond(carry):
        mask, prev_count = carry
        return mask.sum() > prev_count

    def body(carry):
        mask, _ = carry
        return _dilate(mask, stones), mask.sum()

    mask, _ = jax.lax.while_loop(
        cond, body, (seed, jnp.int32(-1))
    )
    if goal_axis == 0:
        return mask[-1, :].any()
    return mask[:, -1].any()


class HexEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs:board": ArraySpec(jnp.int32, (_N, _N), 0, 2),
            "obs:current_player": ArraySpec(
                jnp.int32, (), 0, 1, is_discrete=True
            ),
            "info:legal_moves": ArraySpec(jnp.bool_, (_N * _N,)),
        }

    def action_spec(self):
        if self.max_num_players > 1:
            return {
                "action": ArraySpec(
                    jnp.int32, (-1,), 0, _N * _N - 1, is_discrete=True
                )
            }
        return {
            "action": ArraySpec(
                jnp.int32, (), 0, _N * _N - 1, is_discrete=True
            )
        }

    def _obs(self, board, player):
        return {
            "obs:board": board,
            "obs:current_player": player,
            "info:legal_moves": (board == 0).reshape(-1),
        }

    def reset_env(self, key):
        board = jnp.zeros((_N, _N), jnp.int32)
        player = jnp.int32(0)
        return {"board": board, "player": player}, self._obs(board, player)

    def step_env(self, state, action, key):
        board, player = state["board"], state["player"]
        if self.max_num_players > 1:
            action = action[player]
        r, c = action // _N, action % _N
        legal = board[r, c] == 0
        new_board = jnp.where(
            legal, board.at[r, c].set(player + 1), board
        )
        stones = new_board == player + 1
        won = jax.lax.cond(
            player == 0,
            lambda s: _connected(s, 0),
            lambda s: _connected(s, 1),
            stones,
        )
        terminated = won | ~legal
        mover_reward = jnp.where(
            ~legal, -1.0, jnp.where(won, 1.0, 0.0)
        ).astype(jnp.float32)
        if self.max_num_players > 1:
            rewards = jnp.zeros(self.max_num_players, jnp.float32)
            rewards = rewards.at[player].set(mover_reward)
            rewards = rewards.at[1 - player].set(
                jnp.where(terminated, -mover_reward, 0.0)
            )
            reward = rewards
        else:
            reward = mover_reward
        next_player = jnp.where(terminated, player, 1 - player)
        st = {"board": new_board, "player": next_player.astype(jnp.int32)}
        return EnvOut(
            state=st,
            obs=self._obs(new_board, st["player"]),
            reward=reward,
            terminated=terminated,
        )
