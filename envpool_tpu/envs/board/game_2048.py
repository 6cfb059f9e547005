"""2048 — TPU-native functional implementation.

Behavioral reference: ``envpool/pgx/`` registers 2048 among its board games
(``pgx/registration.py:20-60``); this follows the classic rules: board is
4x4 tile exponents (0 = empty), a move slides+merges along one of four
directions, reward is the sum of merged tile values, a random empty cell
spawns 2 (p=0.9) or 4 (p=0.1) after any moving move, and the game ends
when no move changes the board.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec


def _slide_row_left(row):
    """Slide+merge one 4-row of exponents; returns (row, reward)."""
    # Compact non-zeros to the left (stable) via explicit 4-element logic.
    def compact(r):
        out = jnp.zeros_like(r)
        idx = jnp.int32(0)
        for i in range(4):
            nz = r[i] > 0
            out = out.at[idx].set(jnp.where(nz, r[i], out[idx]))
            idx = idx + nz.astype(jnp.int32)
        return out

    r = compact(row)
    # Merge pairs left-to-right.
    reward = jnp.float32(0.0)
    merged = jnp.zeros(4, jnp.bool_)
    for i in range(3):
        can = (r[i] > 0) & (r[i] == r[i + 1]) & ~merged[i]
        reward = reward + jnp.where(can, 2.0 ** (r[i] + 1), 0.0)
        r = r.at[i].set(jnp.where(can, r[i] + 1, r[i]))
        r = r.at[i + 1].set(jnp.where(can, 0, r[i + 1]))
        merged = merged.at[i].set(can)
    r = compact(r)
    return r, reward


def _move(board, action):
    """action: 0 left, 1 up, 2 right, 3 down (rotate → slide left)."""
    def apply(b):
        rows, rewards = jax.vmap(_slide_row_left)(b)
        return rows, rewards.sum()

    b0, r0 = apply(board)
    b1, r1 = apply(board.T)
    b2, r2 = apply(board[:, ::-1])
    b3, r3 = apply(board.T[:, ::-1])
    boards = jnp.stack([b0, b1.T, b2[:, ::-1], (b3[:, ::-1]).T])
    rewards = jnp.stack([r0, r1, r2, r3])
    return boards[action], rewards[action]


class Game2048Env(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs": ArraySpec(jnp.int32, (4, 4), 0, 16),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.int32, (), 0, 3, is_discrete=True)}

    def _spawn(self, key, board):
        k1, k2 = jax.random.split(key)
        empty = board == 0
        logits = jnp.where(empty, 0.0, -jnp.inf).reshape(-1)
        idx = jax.random.categorical(k1, logits)
        val = jnp.where(jax.random.uniform(k2) < 0.9, 1, 2)  # exp of 2 or 4
        has_empty = empty.any()
        return jnp.where(
            has_empty, board.reshape(-1).at[idx].set(val).reshape(4, 4), board
        )

    def reset_env(self, key):
        k1, k2 = jax.random.split(key)
        board = jnp.zeros((4, 4), jnp.int32)
        board = self._spawn(k1, board)
        board = self._spawn(k2, board)
        return board, {"obs": board}

    def _dead(self, board):
        """No move changes the board."""
        moved = []
        for a in range(4):
            nb, _ = _move(board, jnp.int32(a))
            moved.append(jnp.any(nb != board))
        return ~jnp.stack(moved).any()

    def step_env(self, state, action, key):
        new_board, reward = _move(state, action)
        changed = jnp.any(new_board != state)
        new_board = jnp.where(
            changed, self._spawn(key, new_board), state
        )
        terminated = self._dead(new_board)
        return EnvOut(
            state=new_board,
            obs={"obs": new_board},
            reward=jnp.where(changed, reward, 0.0).astype(jnp.float32),
            terminated=terminated,
        )
