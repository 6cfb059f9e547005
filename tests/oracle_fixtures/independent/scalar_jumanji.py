"""Scalar jumanji-puzzle oracles — plain-Python rules implementations.

Written from the published game rules (jumanji Game2048 / SlidingTilePuzzle
semantics; reference C++ at ``/root/reference/envpool/jumanji/
game2048_env.h`` and ``sliding_tile_puzzle_env.h``), structurally
independent from ``envpool_tpu/envs/jumanji`` and ``envs/board``.
"""

from __future__ import annotations

import numpy as np


def slide_2048(board, direction):
    """Classic 2048 slide+merge on a 4x4 exponent board.

    ``direction``: 0 = left, 1 = up, 2 = right, 3 = down (the board-env
    convention; jumanji's 0=up,1=right,2=down,3=left maps via (a+1)%4).
    Returns (new_board list-of-lists, reward).
    """
    b = [list(r) for r in board]

    def slide_row(row):
        vals = [v for v in row if v > 0]
        out, reward, i = [], 0.0, 0
        while i < len(vals):
            if i + 1 < len(vals) and vals[i] == vals[i + 1]:
                out.append(vals[i] + 1)
                reward += float(2 ** (vals[i] + 1))
                i += 2
            else:
                out.append(vals[i])
                i += 1
        return out + [0] * (4 - len(out)), reward

    total = 0.0
    if direction == 0:  # left
        rows = b
    elif direction == 2:  # right
        rows = [r[::-1] for r in b]
    elif direction == 1:  # up
        rows = [[b[r][c] for r in range(4)] for c in range(4)]
    else:  # down
        rows = [[b[r][c] for r in range(3, -1, -1)] for c in range(4)]
    new_rows = []
    for r in rows:
        nr, rew = slide_row(r)
        new_rows.append(nr)
        total += rew
    if direction == 0:
        out = new_rows
    elif direction == 2:
        out = [r[::-1] for r in new_rows]
    elif direction == 1:
        out = [[new_rows[c][r] for c in range(4)] for r in range(4)]
    else:
        out = [[new_rows[c][3 - r] for c in range(4)] for r in range(4)]
    return out, total


def movable_2048(board, direction):
    nb, _ = slide_2048(board, direction)
    return any(
        nb[r][c] != board[r][c] for r in range(4) for c in range(4)
    )


def verify_2048_transition(before, after, action_dir, reward):
    """Check one (board, action, board', reward) transition obeys the 2048
    laws: board' = slide(board) + exactly one spawned tile (value 1 or 2 in
    an empty cell of the slid board) when the slide changes the board, else
    board' == board and reward 0.  Returns an error string or None."""
    before = np.asarray(before).tolist()
    after = np.asarray(after).tolist()
    moved, want_reward = slide_2048(before, action_dir)
    changed = moved != before
    if not changed:
        if after != before:
            return "board changed on a non-moving move"
        if abs(reward) > 1e-6:
            return f"nonzero reward {reward} on a non-moving move"
        return None
    if abs(reward - want_reward) > 1e-6:
        return f"reward {reward} != merge total {want_reward}"
    diffs = [
        (r, c)
        for r in range(4)
        for c in range(4)
        if moved[r][c] != after[r][c]
    ]
    if len(diffs) != 1:
        return f"spawn changed {len(diffs)} cells (want exactly 1)"
    r, c = diffs[0]
    if moved[r][c] != 0:
        return "spawn landed on a non-empty cell"
    if after[r][c] not in (1, 2):
        return f"spawned tile exponent {after[r][c]} not in (1, 2)"
    return None


class ScalarSlidingTile:
    """Fifteen-puzzle from an injected scrambled layout; moves the empty
    slot by (up, right, down, left) = ((-1,0),(0,1),(1,0),(0,-1))."""

    MOVES = ((-1, 0), (0, 1), (1, 0), (0, -1))

    def __init__(self, puzzle, pos, n, time_limit):
        self.puzzle = [list(r) for r in np.asarray(puzzle).tolist()]
        self.pos = tuple(int(v) for v in pos)
        self.n = int(n)
        self.time_limit = int(time_limit)
        self.step_count = 0

    def solved_ref(self):
        n = self.n
        return [
            [(r * n + c + 1) % (n * n) for c in range(n)] for r in range(n)
        ]

    def action_mask(self):
        r, c = self.pos
        return [
            0 <= r + dr < self.n and 0 <= c + dc < self.n
            for dr, dc in self.MOVES
        ]

    def step(self, action):
        """Returns (reward, terminated)."""
        ref = self.solved_ref()
        before = sum(
            self.puzzle[r][c] == ref[r][c]
            for r in range(self.n) for c in range(self.n)
        )
        dr, dc = self.MOVES[int(action)]
        r, c = self.pos[0] + dr, self.pos[1] + dc
        if 0 <= r < self.n and 0 <= c < self.n:
            self.puzzle[self.pos[0]][self.pos[1]] = self.puzzle[r][c]
            self.puzzle[r][c] = 0
            self.pos = (r, c)
        after = sum(
            self.puzzle[r][c] == ref[r][c]
            for r in range(self.n) for c in range(self.n)
        )
        self.step_count += 1
        reward = float(after - before)
        solved = self.puzzle == ref
        return reward, solved or self.step_count >= self.time_limit

    def puzzle_array(self):
        return np.asarray(self.puzzle, np.int32)
