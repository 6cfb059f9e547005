"""Othello (Reversi) — TPU-native functional implementation.

Behavioral reference: the reference's pgx family registers ``Othello-v1``
(``pgx/registration.py:105``).  Standard rules: 8x8 board, a move must
flip at least one opponent line in one of 8 directions; a player with no
legal move passes automatically; the game ends when neither side can
move; final reward is ±1 by disc count (0 on ties).  Supports both
pgx-style single-action turns and the EnvPool per-player protocol
(``max_num_players=2``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_N = 8
_DIRS = np.array(
    [[-1, -1], [-1, 0], [-1, 1], [0, -1], [0, 1], [1, -1], [1, 0], [1, 1]],
    np.int32,
)


def _flips_for_move(board, r, c, me, opp):
    """Discs flipped by playing (r, c); [8,8] bool (empty → all False)."""
    total = jnp.zeros((_N, _N), jnp.bool_)
    rows = jax.lax.broadcasted_iota(jnp.int32, (_N, _N), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (_N, _N), 1)
    for dr, dc in _DIRS:
        # Walk outward: a run of opponent discs closed by one of mine is
        # captured; an empty cell or the border kills the direction.
        run = jnp.zeros((_N, _N), jnp.bool_)
        captured = jnp.zeros((_N, _N), jnp.bool_)
        still = jnp.bool_(True)  # consecutive-opponent walk continues
        for k in range(1, _N):
            rr = r + dr * k
            cc = c + dc * k
            inside = (rr >= 0) & (rr < _N) & (cc >= 0) & (cc < _N)
            rrc = jnp.clip(rr, 0, _N - 1)
            ccc = jnp.clip(cc, 0, _N - 1)
            cell = board[rrc, ccc]
            is_opp = inside & (cell == opp)
            is_me = inside & (cell == me)
            here = (rows == rrc) & (cols == ccc) & inside
            # My disc closes the run (empty run ⇒ captures nothing).
            captured = jnp.where(still & is_me, run, captured)
            run = jnp.where(still & is_opp, run | here, run)
            still = still & is_opp
        total = total | captured
    return total


def _move_result(board, action, player):
    """Apply action (0..63) for player; returns (board, legal)."""
    me = player + 1
    opp = 2 - player
    r, c = action // _N, action % _N
    empty = board[r, c] == 0
    flips = _flips_for_move(board, r, c, me, opp)
    legal = empty & flips.any()
    new_board = jnp.where(flips, me, board)
    new_board = new_board.at[r, c].set(
        jnp.where(legal, me, board[r, c])
    )
    return jnp.where(legal, new_board, board).astype(jnp.int32), legal


def _legal_mask(board, player):
    """[64] legality of every move for ``player`` (vectorized)."""
    actions = jnp.arange(_N * _N)
    def check(a):
        _, legal = _move_result(board, a, player)
        return legal
    return jax.vmap(check)(actions)


class OthelloEnv(TpuEnv):
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
            "info:legal_moves": _legal_mask(board, player),
        }

    def reset_env(self, key):
        board = jnp.zeros((_N, _N), jnp.int32)
        board = board.at[3, 3].set(2).at[4, 4].set(2)
        board = board.at[3, 4].set(1).at[4, 3].set(1)
        player = jnp.int32(0)
        return {"board": board, "player": player}, self._obs(board, player)

    def step_env(self, state, action, key):
        board, player = state["board"], state["player"]
        if self.max_num_players > 1:
            action = action[player]
        new_board, legal = _move_result(board, action, player)
        # Auto-pass: next player moves if they can, else turn returns.
        opp = 1 - player
        opp_can = _legal_mask(new_board, opp).any()
        me_can = _legal_mask(new_board, player).any()
        next_player = jnp.where(opp_can, opp, player)
        game_over = ~opp_can & ~me_can
        illegal = ~legal
        terminated = game_over | illegal
        me_count = (new_board == player + 1).sum()
        opp_count = (new_board == 2 - player).sum()
        outcome = jnp.where(
            me_count > opp_count,
            1.0,
            jnp.where(me_count < opp_count, -1.0, 0.0),
        )
        mover_reward = jnp.where(
            illegal, -1.0, jnp.where(game_over, outcome, 0.0)
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
        st = {"board": new_board, "player": next_player.astype(jnp.int32)}
        return EnvOut(
            state=st,
            obs=self._obs(new_board, st["player"]),
            reward=reward,
            terminated=terminated,
        )
