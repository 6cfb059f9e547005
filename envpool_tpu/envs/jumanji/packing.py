"""Jumanji-class placement puzzles: Tetris and FlatPack.

Behavioral reference: ``envpool/jumanji/tetris_env.h`` and
``envpool/jumanji/flat_pack_env.h`` (jumanji v1.1.1 behavior).  Both are
deterministic-start placement games:

* Tetris — 10x10 board, the falling piece is always the 2x2 square
  tetromino (``tetris_env.h:60-67 SquareTetromino``); action =
  (rotation, column), rotation is cosmetic for the square piece; the piece
  drops to the lowest collision-free row (``tetris_env.h:262-281``);
  reward = rows cleared, -1 for an unplaceable column; episode ends on an
  invalid placement, no remaining placement, or 400 steps.
* FlatPack — 11x11 grid, 25 blocks of 3x3 cells (default: block 0 is a
  2x2 of ones, the rest empty, ``flat_pack_env.h:134-146``); action =
  (block, rotation, row, col); reward = newly covered cells / 121, -1 for
  an invalid placement; the full (25,4,9,9) action mask is part of the
  observation.

TPU-native: drop rows and the FlatPack action mask are computed as
vectorized window reductions over the occupancy grid (no per-cell scans),
and row clears are a single scatter by destination index.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_T_ROWS = 10
_T_COLS = 10
_T_LIMIT = 400


def _square_tetromino() -> jnp.ndarray:
    t = jnp.zeros((4, 4), jnp.int32)
    return t.at[:2, :2].set(1)


def _tetris_can_place(grid: jnp.ndarray) -> jnp.ndarray:
    """Per-column placement validity for the 2x2 piece, (10,) bool."""
    occ = grid != 0
    # 2x2 window occupied at anchor (row, col), rows 0..8, cols 0..8.
    win = occ[:-1, :-1] | occ[:-1, 1:] | occ[1:, :-1] | occ[1:, 1:]
    free_any = ~jnp.all(win, axis=0)  # some drop row exists per col 0..8
    return jnp.concatenate([free_any, jnp.zeros((1,), jnp.bool_)])


def _tetris_drop_row(grid: jnp.ndarray, col: jnp.ndarray) -> jnp.ndarray:
    """Lowest collision-free anchor row for the 2x2 piece at ``col``.

    Mirrors the bottom-up scan of ``tetris_env.h:266-281``: returns the
    max row in 0..8 whose 2x2 window is fully empty, or -1.
    """
    occ = grid != 0
    win = occ[:-1, :-1] | occ[:-1, 1:] | occ[1:, :-1] | occ[1:, 1:]
    col_c = jnp.clip(col, 0, _T_COLS - 2)
    free = ~win[:, col_c]  # (9,)
    rows = jnp.arange(_T_ROWS - 1)
    return jnp.max(jnp.where(free, rows, -1))


class TetrisEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs:grid": ArraySpec(jnp.int32, (_T_ROWS, _T_COLS), 0, 1),
            "obs:tetromino": ArraySpec(jnp.int32, (4, 4), 0, 1),
            "obs:action_mask": ArraySpec(jnp.bool_, (4, _T_COLS)),
            "obs:step_count": ArraySpec(jnp.int32, (), 0, _T_LIMIT),
        }

    def action_spec(self):
        # [rotation 0..3, column 0..9]
        return {"action": ArraySpec(jnp.int32, (2,), 0, 9, is_discrete=True)}

    def _obs(self, grid, step):
        mask = _tetris_can_place(grid)
        return {
            "obs:grid": grid,
            "obs:tetromino": _square_tetromino(),
            "obs:action_mask": jnp.broadcast_to(mask, (4, _T_COLS)),
            "obs:step_count": step,
        }

    def reset_env(self, key):
        grid = jnp.zeros((_T_ROWS, _T_COLS), jnp.int32)
        st = {"grid": grid, "step": jnp.int32(0)}
        return st, self._obs(grid, st["step"])

    def step_env(self, state, action, key):
        grid = state["grid"]
        col = jnp.clip(action[1], 0, _T_COLS - 1)
        drop = _tetris_drop_row(grid, col)
        valid = (col < _T_COLS - 1) & (drop >= 0)

        row = jnp.clip(drop, 0, _T_ROWS - 2)
        placed = jnp.zeros_like(grid, jnp.bool_)
        placed = placed.at[row, col].set(True)
        placed = placed.at[row + 1, col].set(True)
        placed = placed.at[row, col + 1].set(True)
        placed = placed.at[row + 1, col + 1].set(True)
        g1 = jnp.where(valid & placed, 1, grid)

        # Clear full rows: each non-full row falls by the number of full
        # rows below it; full rows vanish (zeros enter at the top).
        full = jnp.all(g1 != 0, axis=1)
        below_full = jnp.cumsum(full[::-1])[::-1] - full.astype(jnp.int32)
        dest = jnp.arange(_T_ROWS) + below_full
        g2 = (
            jnp.zeros_like(g1)
            .at[dest]
            .add(g1 * (~full)[:, None].astype(jnp.int32))
        )
        cleared = full.sum()
        g2 = jnp.where(valid, g2, grid)

        step = state["step"] + 1
        reward = jnp.where(valid, cleared.astype(jnp.float32), -1.0)
        terminated = (
            ~valid
            | ~jnp.any(_tetris_can_place(g2))
            | (step >= _T_LIMIT)
        )
        st = {"grid": g2, "step": step}
        return EnvOut(
            state=st,
            obs=self._obs(g2, step),
            reward=reward,
            terminated=terminated,
        )


_FP_GRID = 11
_FP_BLOCKS = 25
_FP_PLACE = 9
_FP_LIMIT = 25


def _default_blocks() -> jnp.ndarray:
    b = jnp.zeros((_FP_BLOCKS, 3, 3), jnp.int32)
    return b.at[0, :2, :2].set(1)


def _rot_blocks(blocks: jnp.ndarray) -> jnp.ndarray:
    """(B,3,3) -> (B,4,3,3) under the reference's rotation indexing.

    flat_pack_env.h:189-199: rotation 1 = clockwise 90, 2 = 180,
    3 = counter-clockwise 90 — i.e. jnp.rot90 with k = 0, 3, 2, 1.
    """
    return jnp.stack(
        [jnp.rot90(blocks, k, axes=(1, 2)) for k in (0, 3, 2, 1)], axis=1
    )


def _fp_action_mask(grid, blocks, placed):
    """Full (25, 4, 9, 9) validity mask via shifted-window reduction."""
    occ = grid != 0
    rots = _rot_blocks(blocks) != 0  # (25, 4, 3, 3)
    overlap = jnp.zeros(
        (_FP_BLOCKS, 4, _FP_PLACE, _FP_PLACE), jnp.bool_
    )
    for dr in range(3):
        for dc in range(3):
            win = occ[dr : dr + _FP_PLACE, dc : dc + _FP_PLACE]
            overlap = overlap | (
                rots[:, :, dr, dc][:, :, None, None] & win[None, None]
            )
    return ~placed[:, None, None, None] & ~overlap


class FlatPackEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs:grid": ArraySpec(jnp.int32, (_FP_GRID, _FP_GRID), 0, 25),
            "obs:blocks": ArraySpec(jnp.int32, (_FP_BLOCKS, 3, 3), 0, 25),
            "obs:action_mask": ArraySpec(
                jnp.bool_, (_FP_BLOCKS, 4, _FP_PLACE, _FP_PLACE)
            ),
        }

    def action_spec(self):
        # [block 0..24, rotation 0..3, row 0..8, col 0..8]
        return {"action": ArraySpec(jnp.int32, (4,), 0, 24, is_discrete=True)}

    def _obs(self, grid, blocks, placed):
        return {
            "obs:grid": grid,
            "obs:blocks": blocks,
            "obs:action_mask": _fp_action_mask(grid, blocks, placed),
        }

    def reset_env(self, key):
        grid = jnp.zeros((_FP_GRID, _FP_GRID), jnp.int32)
        blocks = _default_blocks()
        placed = jnp.zeros((_FP_BLOCKS,), jnp.bool_)
        st = {
            "grid": grid,
            "blocks": blocks,
            "placed": placed,
            "step": jnp.int32(0),
        }
        return st, self._obs(grid, blocks, placed)

    def step_env(self, state, action, key):
        grid, blocks, placed = state["grid"], state["blocks"], state["placed"]
        block = jnp.clip(action[0], 0, _FP_BLOCKS - 1)
        rotation = jnp.clip(action[1], 0, 3)
        row = jnp.clip(action[2], 0, _FP_PLACE - 1)
        col = jnp.clip(action[3], 0, _FP_PLACE - 1)

        cells = _rot_blocks(blocks)[block, rotation]  # (3, 3) values
        stamp = jnp.zeros_like(grid)
        stamp = jax_dynamic_stamp(stamp, cells, row, col)
        overlap = jnp.any((stamp != 0) & (grid != 0))
        valid = ~placed[block] & ~overlap

        new_grid = jnp.where(valid & (stamp != 0), stamp, grid)
        covered = (stamp != 0).sum()
        reward = jnp.where(
            valid,
            covered.astype(jnp.float32) / (_FP_GRID * _FP_GRID),
            -1.0,
        )
        new_placed = placed.at[block].set(placed[block] | valid)
        step = state["step"] + 1
        mask = _fp_action_mask(new_grid, blocks, new_placed)
        terminated = ~valid | ~jnp.any(mask) | (step >= _FP_LIMIT)
        st = {
            "grid": new_grid,
            "blocks": blocks,
            "placed": new_placed,
            "step": step,
        }
        return EnvOut(
            state=st,
            obs={
                "obs:grid": new_grid,
                "obs:blocks": blocks,
                "obs:action_mask": mask,
            },
            reward=reward,
            terminated=terminated,
        )


def jax_dynamic_stamp(canvas, cells, row, col):
    """Write a 3x3 ``cells`` patch at dynamic (row, col) into ``canvas``."""
    import jax.lax as lax

    patch = lax.dynamic_slice(canvas, (row, col), (3, 3))
    patch = jnp.where(cells != 0, cells, patch)
    return lax.dynamic_update_slice(canvas, patch, (row, col))
