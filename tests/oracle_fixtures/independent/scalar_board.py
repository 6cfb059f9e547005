"""Scalar board-game oracles — plain-Python rules implementations.

Written directly from the published rules of each game (the surfaces the
reference's pgx family exposes: ``/root/reference/envpool/pgx/
board_games.h``), sharing no code or structure with the vectorized JAX
implementations in ``envpool_tpu/envs/board``.  Conventions match the
repo's surface so goldens line up:

* boards are 0 = empty, 1 = player0's mark, 2 = player1's mark
* rewards are from the mover's perspective: +1 win, -1 loss/illegal,
  0 otherwise (two-player zero-sum)
"""

from __future__ import annotations

import numpy as np


class ScalarTicTacToe:
    def __init__(self):
        self.board = [[0] * 3 for _ in range(3)]
        self.player = 0
        self.done = False

    def legal_moves(self):
        return [
            self.board[a // 3][a % 3] == 0 and not self.done
            for a in range(9)
        ]

    def board_array(self):
        return np.asarray(self.board, np.int32)

    def step(self, action):
        """Returns (mover_reward, terminated)."""
        r, c = divmod(int(action), 3)
        mark = self.player + 1
        if self.board[r][c] != 0:
            self.done = True
            return -1.0, True
        self.board[r][c] = mark
        lines = (
            [[(i, j) for j in range(3)] for i in range(3)]
            + [[(i, j) for i in range(3)] for j in range(3)]
            + [[(i, i) for i in range(3)], [(i, 2 - i) for i in range(3)]]
        )
        won = any(
            all(self.board[i][j] == mark for i, j in line) for line in lines
        )
        draw = all(v != 0 for row in self.board for v in row)
        self.done = won or draw
        if not self.done:
            self.player = 1 - self.player
        return (1.0 if won else 0.0), self.done


class ScalarConnect4:
    H, W = 6, 7

    def __init__(self):
        self.board = [[0] * self.W for _ in range(self.H)]
        self.player = 0
        self.done = False

    def legal_moves(self):
        return [
            self.board[0][c] == 0 and not self.done for c in range(self.W)
        ]

    def board_array(self):
        return np.asarray(self.board, np.int32)

    def step(self, action):
        c = int(action)
        mark = self.player + 1
        if self.board[0][c] != 0:
            self.done = True
            return -1.0, True
        # Drop to the lowest empty row.
        row = max(r for r in range(self.H) if self.board[r][c] == 0)
        self.board[row][c] = mark
        won = self._check_win(row, c, mark)
        draw = all(self.board[0][cc] != 0 for cc in range(self.W))
        self.done = won or draw
        if not self.done:
            self.player = 1 - self.player
        return (1.0 if won else 0.0), self.done

    def _check_win(self, r, c, mark):
        for dr, dc in ((0, 1), (1, 0), (1, 1), (1, -1)):
            run = 1
            for sign in (1, -1):
                rr, cc = r + sign * dr, c + sign * dc
                while (
                    0 <= rr < self.H
                    and 0 <= cc < self.W
                    and self.board[rr][cc] == mark
                ):
                    run += 1
                    rr += sign * dr
                    cc += sign * dc
            if run >= 4:
                return True
        return False


class ScalarOthello:
    N = 8
    DIRS = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
            (0, 1), (1, -1), (1, 0), (1, 1)]

    def __init__(self):
        self.board = [[0] * self.N for _ in range(self.N)]
        self.board[3][3] = self.board[4][4] = 2
        self.board[3][4] = self.board[4][3] = 1
        self.player = 0
        self.done = False

    def board_array(self):
        return np.asarray(self.board, np.int32)

    def _flips(self, r, c, player):
        """Cells flipped by player playing (r, c); [] if not legal."""
        if self.board[r][c] != 0:
            return []
        me, opp = player + 1, 2 - player
        out = []
        for dr, dc in self.DIRS:
            run = []
            rr, cc = r + dr, c + dc
            while 0 <= rr < self.N and 0 <= cc < self.N:
                if self.board[rr][cc] == opp:
                    run.append((rr, cc))
                elif self.board[rr][cc] == me:
                    out.extend(run)
                    break
                else:
                    break
                rr, cc = rr + dr, cc + dc
        return out

    def legal_moves(self):
        return [
            bool(self._flips(a // self.N, a % self.N, self.player))
            and not self.done
            for a in range(self.N * self.N)
        ]

    def step(self, action):
        """Auto-pass semantics: after a move, the turn goes to the opponent
        if they can move, else back to the mover; game over when neither
        side can move."""
        r, c = divmod(int(action), self.N)
        me = self.player + 1
        flips = self._flips(r, c, self.player)
        if not flips:
            self.done = True
            return -1.0, True
        self.board[r][c] = me
        for rr, cc in flips:
            self.board[rr][cc] = me
        opp = 1 - self.player
        opp_can = any(
            self._flips(a // self.N, a % self.N, opp)
            for a in range(self.N * self.N)
        )
        me_can = any(
            self._flips(a // self.N, a % self.N, self.player)
            for a in range(self.N * self.N)
        )
        if not opp_can and not me_can:
            self.done = True
            mine = sum(v == me for row in self.board for v in row)
            theirs = sum(v == 2 - self.player for row in self.board for v in row)
            return (1.0 if mine > theirs else -1.0 if mine < theirs else 0.0), True
        if opp_can:
            self.player = opp
        return 0.0, False


class ScalarGo:
    """Go with simple ko, suicide illegal, area scoring (stones + empty
    regions bordering only one color), komi, two passes end the game."""

    def __init__(self, n=9, komi=7.5):
        self.n = n
        self.komi = komi
        self.board = [[0] * n for _ in range(n)]
        self.player = 0  # 0 = black (mark 1), 1 = white (mark 2)
        self.ko = None   # (r, c) forbidden by simple ko, or None
        self.passes = 0
        self.done = False

    def board_array(self):
        return np.asarray(self.board, np.int32)

    def _neighbors(self, r, c):
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            rr, cc = r + dr, c + dc
            if 0 <= rr < self.n and 0 <= cc < self.n:
                yield rr, cc

    def _group(self, r, c, board=None):
        """(stones, liberties) of the group containing (r, c)."""
        board = board or self.board
        mark = board[r][c]
        seen = {(r, c)}
        libs = set()
        stack = [(r, c)]
        while stack:
            rr, cc = stack.pop()
            for nr, nc in self._neighbors(rr, cc):
                if board[nr][nc] == 0:
                    libs.add((nr, nc))
                elif board[nr][nc] == mark and (nr, nc) not in seen:
                    seen.add((nr, nc))
                    stack.append((nr, nc))
        return seen, libs

    def _try_move(self, r, c, player):
        """Simulate: returns (new_board, captured_set) or None if illegal."""
        if self.board[r][c] != 0 or self.ko == (r, c):
            return None
        me, opp = player + 1, 2 - player
        board = [row[:] for row in self.board]
        board[r][c] = me
        captured = set()
        for nr, nc in self._neighbors(r, c):
            if board[nr][nc] == opp:
                stones, libs = self._group(nr, nc, board)
                if not libs:
                    captured |= stones
        for rr, cc in captured:
            board[rr][cc] = 0
        stones, libs = self._group(r, c, board)
        if not libs:  # suicide
            return None
        return board, captured

    def legal_moves(self):
        """[n*n + 1] — last entry is pass (always legal)."""
        out = [
            self._try_move(a // self.n, a % self.n, self.player) is not None
            and not self.done
            for a in range(self.n * self.n)
        ]
        out.append(not self.done)
        return out

    def _score(self):
        """Area score margin: black - white - komi."""
        n = self.n
        black = sum(v == 1 for row in self.board for v in row)
        white = sum(v == 2 for row in self.board for v in row)
        seen = set()
        for r in range(n):
            for c in range(n):
                if self.board[r][c] != 0 or (r, c) in seen:
                    continue
                region = {(r, c)}
                stack = [(r, c)]
                borders = set()
                while stack:
                    rr, cc = stack.pop()
                    for nr, nc in self._neighbors(rr, cc):
                        if self.board[nr][nc] == 0:
                            if (nr, nc) not in region:
                                region.add((nr, nc))
                                stack.append((nr, nc))
                        else:
                            borders.add(self.board[nr][nc])
                seen |= region
                if borders == {1}:
                    black += len(region)
                elif borders == {2}:
                    white += len(region)
        return black - white - self.komi

    def step(self, action):
        """Returns (mover_reward, terminated).  action n*n = pass."""
        a = int(action)
        if a == self.n * self.n:
            self.passes += 1
            self.ko = None
            if self.passes >= 2:
                self.done = True
                margin = self._score()
                mover_margin = margin if self.player == 0 else -margin
                return float(np.sign(mover_margin)), True
            self.player = 1 - self.player
            return 0.0, False
        r, c = divmod(a, self.n)
        result = self._try_move(r, c, self.player)
        if result is None:
            self.done = True
            return -1.0, True
        board, captured = result
        # Simple ko: single-stone capture by a single new stone whose group
        # has exactly one liberty (the captured point).
        self.ko = None
        if len(captured) == 1:
            stones, libs = self._group(r, c, board)
            if len(stones) == 1 and len(libs) == 1:
                self.ko = next(iter(captured))
        self.board = board
        self.passes = 0
        self.player = 1 - self.player
        return 0.0, False
