"""Turn-based two-player board games: TicTacToe, Connect4.

Behavioral reference: the reference's pgx family
(``envpool/pgx/board_games.h``) exposes these with EnvPool's multi-player
machinery.  This build uses pgx-style single-action turns: each step
consumes the *current player's* action; ``obs:current_player`` says whose
turn it is, and the reward of a step is from the mover's perspective
(+1 win, -1 illegal move, 0 otherwise).  EnvPool's per-player action-row
protocol is queued for the multi-player engine round.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec


class TicTacToeEnv(TpuEnv):
    """3x3; board cells: 0 empty, 1 player0, 2 player1."""

    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs:board": ArraySpec(jnp.int32, (3, 3), 0, 2),
            "obs:current_player": ArraySpec(
                jnp.int32, (), 0, 1, is_discrete=True
            ),
            "info:legal_moves": ArraySpec(jnp.bool_, (9,)),
        }

    def action_spec(self):
        if self.max_num_players > 1:
            # EnvPool multi-player protocol: one action row per player
            # (leading -1 = player axis); the env consumes the current
            # player's row.
            return {
                "action": ArraySpec(jnp.int32, (-1,), 0, 8, is_discrete=True)
            }
        return {"action": ArraySpec(jnp.int32, (), 0, 8, is_discrete=True)}

    def _obs(self, board, player):
        return {
            "obs:board": board,
            "obs:current_player": player,
            "info:legal_moves": (board == 0).reshape(-1),
        }

    def reset_env(self, key):
        board = jnp.zeros((3, 3), jnp.int32)
        player = jnp.int32(0)
        return {"board": board, "player": player}, self._obs(board, player)

    @staticmethod
    def _wins(board, mark):
        b = board == mark
        rows = b.all(axis=1).any()
        cols = b.all(axis=0).any()
        diag = jnp.diag(b).all() | jnp.diag(b[:, ::-1]).all()
        return rows | cols | diag

    def step_env(self, state, action, key):
        board, player = state["board"], state["player"]
        if self.max_num_players > 1:
            action = action[player]
        r, c = action // 3, action % 3
        legal = board[r, c] == 0
        mark = player + 1
        new_board = jnp.where(
            legal, board.at[r, c].set(mark), board
        )
        won = self._wins(new_board, mark)
        draw = (new_board != 0).all() & ~won
        terminated = won | draw | ~legal
        mover_reward = jnp.where(
            ~legal, -1.0, jnp.where(won, 1.0, 0.0)
        ).astype(jnp.float32)
        reward = _per_player_reward(self, mover_reward, player, terminated)
        next_player = jnp.where(terminated, player, 1 - player)
        st = {"board": new_board, "player": next_player}
        return EnvOut(
            state=st,
            obs=self._obs(new_board, next_player),
            reward=reward,
            terminated=terminated,
        )


def _per_player_reward(env, mover_reward, player, terminated):
    """Single-row reward (pgx style) or [P] rows (EnvPool protocol).

    In multi-player mode the loser gets the negated terminal reward
    (zero-sum), matching the reference's per-player reward rows.
    """
    if env.max_num_players <= 1:
        return mover_reward
    p = env.max_num_players
    rewards = jnp.zeros(p, jnp.float32)
    rewards = rewards.at[player].set(mover_reward)
    other = 1 - player
    rewards = rewards.at[other].set(
        jnp.where(terminated, -mover_reward, 0.0)
    )
    return rewards


class Connect4Env(TpuEnv):
    """6x7 connect-four; action = column; pieces fall to the lowest row."""

    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs:board": ArraySpec(jnp.int32, (6, 7), 0, 2),
            "obs:current_player": ArraySpec(
                jnp.int32, (), 0, 1, is_discrete=True
            ),
            "info:legal_moves": ArraySpec(jnp.bool_, (7,)),
        }

    def action_spec(self):
        if self.max_num_players > 1:
            return {
                "action": ArraySpec(jnp.int32, (-1,), 0, 6, is_discrete=True)
            }
        return {"action": ArraySpec(jnp.int32, (), 0, 6, is_discrete=True)}

    def _obs(self, board, player):
        return {
            "obs:board": board,
            "obs:current_player": player,
            "info:legal_moves": board[0] == 0,
        }

    def reset_env(self, key):
        board = jnp.zeros((6, 7), jnp.int32)
        player = jnp.int32(0)
        return {"board": board, "player": player}, self._obs(board, player)

    @staticmethod
    def _wins(board, mark):
        b = (board == mark).astype(jnp.int32)
        h = (b[:, :-3] & b[:, 1:-2] & b[:, 2:-1] & b[:, 3:]).any()
        v = (b[:-3] & b[1:-2] & b[2:-1] & b[3:]).any()
        d1 = (
            b[:-3, :-3] & b[1:-2, 1:-2] & b[2:-1, 2:-1] & b[3:, 3:]
        ).any()
        d2 = (
            b[3:, :-3] & b[2:-1, 1:-2] & b[1:-2, 2:-1] & b[:-3, 3:]
        ).any()
        return h | v | d1 | d2

    def step_env(self, state, action, key):
        board, player = state["board"], state["player"]
        if self.max_num_players > 1:
            action = action[player]
        col = board[:, action]
        legal = col[0] == 0
        # Lowest empty row in this column.
        filled = col != 0
        row = 5 - jnp.sum(filled)
        mark = player + 1
        new_board = jnp.where(
            legal, board.at[row, action].set(mark), board
        )
        won = self._wins(new_board, mark)
        draw = (new_board != 0).all() & ~won
        terminated = won | draw | ~legal
        mover_reward = jnp.where(
            ~legal, -1.0, jnp.where(won, 1.0, 0.0)
        ).astype(jnp.float32)
        reward = _per_player_reward(self, mover_reward, player, terminated)
        next_player = jnp.where(terminated, player, 1 - player)
        st = {"board": new_board, "player": next_player}
        return EnvOut(
            state=st,
            obs=self._obs(new_board, next_player),
            reward=reward,
            terminated=terminated,
        )
