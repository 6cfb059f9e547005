"""Jumanji-class puzzle envs: Minesweeper, SlidingTilePuzzle, RubiksCube.

Behavioral reference: the reference's native C++ jumanji family —
``envpool/jumanji/minesweeper_env.h`` (10×10, 10 mines, flood-fill reveal,
+1 per safe reveal, done on mine/invalid/solved),
``envpool/jumanji/sliding_tile_puzzle_env.h`` (5×5, 200-move random-walk
scramble, dense newly-correct−newly-incorrect reward, 500-step limit),
``envpool/jumanji/rubiks_cube_env.h`` (3×3×3 sticker cube, action =
(face, depth, amount), sparse solved reward; ``RubiksCube-v0`` = 100
scrambles / 200 steps, ``RubiksCube-partly-scrambled-v0`` = 20/20).

TPU-native design notes:

* Minesweeper's BFS reveal becomes an **iterative 8-neighbor dilation** to
  fixpoint (``lax.while_loop``): the revealed mask grows through
  zero-adjacency non-mine cells only — identical final set to the queue
  version.
* Rubik's cube moves are **precomputed sticker permutations**: all 18
  (face × amount) index maps are built once in numpy (from the face
  rotation + the 12-sticker adjacent ring cycled by 3·amount, the layout
  convention of jumanji v1.1.1 / ``rubiks_cube_env.h:96-165``) and applied
  as a single gather — no branching on device.
* Scrambles/random walks run as ``lax.scan`` over per-reset PRNG draws
  (counter-based keys, not mt19937; parity is at the rules level, per the
  project's documented RNG decision).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

# ---------------------------------------------------------------------------
# Minesweeper
# ---------------------------------------------------------------------------

_DIRS8 = tuple(
    (dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1) if (dr, dc) != (0, 0)
)


def _nbr(x: jax.Array, dr: int, dc: int, fill) -> jax.Array:
    """y[r, c] = x[r+dr, c+dc] with off-board = fill."""
    y = jnp.roll(x, (-dr, -dc), (0, 1))
    if dr == 1:
        y = y.at[-1, :].set(fill)
    elif dr == -1:
        y = y.at[0, :].set(fill)
    if dc == 1:
        y = y.at[:, -1].set(fill)
    elif dc == -1:
        y = y.at[:, 0].set(fill)
    return y


class MinesweeperEnv(TpuEnv):
    """10×10 board, 10 mines; action = (row, col); board −1 = unexplored."""

    DEFAULT_CONFIG = {
        "rows": 10,
        "cols": 10,
        "num_mines": 10,
        # Fixed mine cells (flat offsets) for deterministic tests; empty =
        # uniform random placement per episode (minesweeper_env.h:184-196).
        "mine_locations": (),
    }

    @property
    def _shape(self):
        return int(self.config["rows"]), int(self.config["cols"])

    def state_spec(self):
        rows, cols = self._shape
        return {
            "obs:board": ArraySpec(jnp.int32, (rows, cols), -1, 8),
            "obs:action_mask": ArraySpec(jnp.bool_, (rows, cols)),
            "obs:num_mines": ArraySpec(jnp.int32, (), 0, rows * cols - 1),
            "obs:step_count": ArraySpec(jnp.int32, ()),
        }

    def action_spec(self):
        rows, cols = self._shape
        return {
            "action": ArraySpec(
                jnp.int32, (2,), 0, max(rows, cols) - 1, is_discrete=True
            )
        }

    def _num_mines(self) -> int:
        locs = self.config["mine_locations"]
        return len(locs) if len(locs) else int(self.config["num_mines"])

    def _obs(self, board, step):
        return {
            "obs:board": board,
            "obs:action_mask": board == -1,
            "obs:num_mines": jnp.int32(self._num_mines()),
            "obs:step_count": step,
        }

    def reset_env(self, key):
        rows, cols = self._shape
        locs = self.config["mine_locations"]
        if len(locs):
            mines = (
                jnp.zeros(rows * cols, jnp.bool_)
                .at[jnp.asarray(locs, jnp.int32)]
                .set(True)
                .reshape(rows, cols)
            )
        else:
            order = jax.random.permutation(key, rows * cols)
            mines = (
                jnp.zeros(rows * cols, jnp.bool_)
                .at[order[: self._num_mines()]]
                .set(True)
                .reshape(rows, cols)
            )
        counts = jnp.zeros((rows, cols), jnp.int32)
        for dr, dc in _DIRS8:
            counts = counts + _nbr(mines, dr, dc, False).astype(jnp.int32)
        board = jnp.full((rows, cols), -1, jnp.int32)
        st = {
            "mines": mines,
            "counts": counts,
            "board": board,
            "step": jnp.int32(0),
        }
        return st, self._obs(board, st["step"])

    def step_env(self, state, action, key):
        rows, cols = self._shape
        board, mines, counts = state["board"], state["mines"], state["counts"]
        r = jnp.clip(action[0], 0, rows - 1)
        c = jnp.clip(action[1], 0, cols - 1)
        valid = board[r, c] == -1
        hit = mines[r, c]

        zero_expand = (counts == 0) & ~mines
        seed = (board != -1) | (
            jnp.zeros((rows, cols), jnp.bool_).at[r, c].set(valid)
        )

        def body(carry):
            revealed, _ = carry
            grow = revealed & zero_expand
            nxt = revealed
            for dr, dc in _DIRS8:
                nxt = nxt | _nbr(grow, dr, dc, False)
            return nxt, (nxt != revealed).any()

        revealed, _ = jax.lax.while_loop(
            lambda cr: cr[1], body, (seed, jnp.bool_(True))
        )
        new_board = jnp.where(revealed, counts, -1)
        solved = revealed.sum() == rows * cols - self._num_mines()
        reward = jnp.where(valid & ~hit, 1.0, 0.0).astype(jnp.float32)
        terminated = ~valid | hit | solved
        step = state["step"] + 1
        st = {
            "mines": mines,
            "counts": counts,
            "board": new_board,
            "step": step,
        }
        return EnvOut(
            state=st,
            obs=self._obs(new_board, step),
            reward=reward,
            terminated=terminated,
        )


# ---------------------------------------------------------------------------
# SlidingTilePuzzle
# ---------------------------------------------------------------------------

_MOVES = ((-1, 0), (0, 1), (1, 0), (0, -1))  # up, right, down, left


class SlidingTilePuzzleEnv(TpuEnv):
    """5×5 fifteen-puzzle; action moves the empty slot; dense reward."""

    DEFAULT_CONFIG = {
        "grid_size": 5,
        "scramble_moves": 200,
        "time_limit": 500,
    }

    @property
    def _n(self) -> int:
        return int(self.config["grid_size"])

    def _solved(self):
        n = self._n
        return (
            (jnp.arange(n * n, dtype=jnp.int32) + 1) % (n * n)
        ).reshape(n, n)

    def state_spec(self):
        n = self._n
        return {
            "obs:puzzle": ArraySpec(jnp.int32, (n, n), 0, n * n - 1),
            "obs:empty_tile_position": ArraySpec(jnp.int32, (2,), 0, n - 1),
            "obs:action_mask": ArraySpec(jnp.bool_, (4,)),
            "obs:step_count": ArraySpec(jnp.int32, ()),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.int32, (), 0, 3, is_discrete=True)}

    def _mask(self, pos):
        n = self._n
        masks = []
        for dr, dc in _MOVES:
            r, c = pos[0] + dr, pos[1] + dc
            masks.append((r >= 0) & (r < n) & (c >= 0) & (c < n))
        return jnp.stack(masks)

    def _obs(self, puzzle, pos, step):
        return {
            "obs:puzzle": puzzle,
            "obs:empty_tile_position": pos,
            "obs:action_mask": self._mask(pos),
            "obs:step_count": step,
        }

    def _apply(self, puzzle, pos, action):
        n = self._n
        dr = jnp.asarray([m[0] for m in _MOVES], jnp.int32)[action]
        dc = jnp.asarray([m[1] for m in _MOVES], jnp.int32)[action]
        r, c = pos[0] + dr, pos[1] + dc
        ok = (r >= 0) & (r < n) & (c >= 0) & (c < n)
        rr = jnp.clip(r, 0, n - 1)
        cc = jnp.clip(c, 0, n - 1)
        tile = puzzle[rr, cc]
        moved = puzzle.at[pos[0], pos[1]].set(tile).at[rr, cc].set(0)
        puzzle = jnp.where(ok, moved, puzzle)
        pos = jnp.where(ok, jnp.stack([rr, cc]), pos)
        return puzzle, pos

    def reset_env(self, key):
        n = self._n
        puzzle = self._solved()
        pos = jnp.asarray([n - 1, n - 1], jnp.int32)

        def walk(carry, k):
            puzzle, pos = carry
            valid = self._mask(pos)
            pick = jax.random.randint(k, (), 0, valid.sum())
            order = jnp.where(valid, jnp.cumsum(valid) - 1, 99)
            action = jnp.argmax(order == pick).astype(jnp.int32)
            return self._apply(puzzle, pos, action), None

        keys = jax.random.split(key, int(self.config["scramble_moves"]))
        (puzzle, pos), _ = jax.lax.scan(walk, (puzzle, pos), keys)
        st = {"puzzle": puzzle, "pos": pos, "step": jnp.int32(0)}
        return st, self._obs(puzzle, pos, st["step"])

    def step_env(self, state, action, key):
        puzzle, pos = state["puzzle"], state["pos"]
        action = jnp.clip(action, 0, 3)
        solved_ref = self._solved()
        before_ok = puzzle == solved_ref
        new_puzzle, new_pos = self._apply(puzzle, pos, action)
        after_ok = new_puzzle == solved_ref
        reward = (
            (after_ok & ~before_ok).sum() - (~after_ok & before_ok).sum()
        ).astype(jnp.float32)
        step = state["step"] + 1
        terminated = after_ok.all() | (
            step >= int(self.config["time_limit"])
        )
        st = {"puzzle": new_puzzle, "pos": new_pos, "step": step}
        return EnvOut(
            state=st,
            obs=self._obs(new_puzzle, new_pos, step),
            reward=reward,
            terminated=terminated,
        )


# ---------------------------------------------------------------------------
# RubiksCube
# ---------------------------------------------------------------------------

# Adjacent sticker ring per face: (faces, rows, cols) of the 12 stickers
# cycled by a quarter turn, in jumanji v1.1.1's face layout
# (rubiks_cube_env.h:96-133).  This is layout *data*, required for
# behavioral parity.
_RING = {
    0: ([1, 4, 3, 2], [0] * 12, [0, 1, 2] * 4),
    1: (
        [0, 2, 5, 4],
        [2, 2, 2, 0, 1, 2, 0, 0, 0, 2, 1, 0],
        [0, 1, 2, 0, 0, 0, 2, 1, 0, 2, 2, 2],
    ),
    2: (
        [0, 3, 5, 1],
        [2, 1, 0, 0, 1, 2, 2, 1, 0, 2, 1, 0],
        [2, 2, 2, 0, 0, 0, 2, 2, 2, 2, 2, 2],
    ),
    3: (
        [0, 4, 5, 2],
        [0, 0, 0, 0, 1, 2, 2, 2, 2, 2, 1, 0],
        [2, 1, 0, 0, 0, 0, 0, 1, 2, 2, 2, 2],
    ),
    4: (
        [0, 1, 5, 3],
        [0, 1, 2, 0, 1, 2, 0, 1, 2, 2, 1, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 2, 2],
    ),
    5: ([1, 2, 3, 4], [2] * 12, [0, 1, 2] * 4),
}


def _build_perms() -> np.ndarray:
    """All 18 (face, amount) sticker permutations as gather index maps.

    perm[f, a] satisfies new_cube_flat = old_cube_flat[perm[f, a]].
    """
    perms = np.zeros((6, 3, 54), np.int32)
    for face in range(6):
        adj, rr, cc = _RING[face]
        ring = np.array(
            [adj[i // 3] * 9 + rr[i] * 3 + cc[i] for i in range(12)],
            np.int32,
        )
        for amount_idx, amount in enumerate((1, -1, 2)):
            src = np.arange(54, dtype=np.int32).reshape(6, 3, 3)
            for _ in range(amount % 4):
                src[face] = np.rot90(src[face], k=-1)
            src = src.reshape(54)
            ring_vals = src[ring].copy()
            shift = (3 * amount) % 12
            for i in range(12):
                src[ring[i]] = ring_vals[(i - shift) % 12]
            perms[face, amount_idx] = src
    return perms


_PERMS = jnp.asarray(_build_perms())


class RubiksCubeEnv(TpuEnv):
    """3×3×3 cube of face-colored stickers; action = (face, depth, amount)."""

    DEFAULT_CONFIG = {
        "num_scrambles": 100,
        "time_limit": 200,
        # Fixed initial cube (54 sticker values) for deterministic tests;
        # empty = scramble from solved (rubiks_cube_env.h:266-277).
        "initial_cube": (),
    }

    def state_spec(self):
        return {
            "obs:cube": ArraySpec(jnp.int8, (6, 3, 3), 0, 5),
            "obs:step_count": ArraySpec(
                jnp.int32, (), 0, int(self.config["time_limit"])
            ),
        }

    def action_spec(self):
        # (face 0-5, depth 0 for the 3-cube, amount 0-2) as in the
        # reference spec ({0,0,0}..{5,0,2}).
        return {
            "action": ArraySpec(jnp.int32, (3,), 0, 5, is_discrete=True)
        }

    def _obs(self, cube, step):
        return {
            "obs:cube": cube.reshape(6, 3, 3).astype(jnp.int8),
            "obs:step_count": step,
        }

    @staticmethod
    def _rotate(cube_flat, face, amount_idx):
        return cube_flat[_PERMS[face, amount_idx]]

    @staticmethod
    def _is_solved(cube_flat):
        faces = cube_flat.reshape(6, 9)
        return (faces == faces[:, :1]).all()

    def reset_env(self, key):
        init = self.config["initial_cube"]
        if len(init):
            cube = jnp.asarray(init, jnp.int32)
        else:
            cube = jnp.repeat(jnp.arange(6, dtype=jnp.int32), 9)
            n_scrambles = int(self.config["num_scrambles"])
            kf, ka = jax.random.split(key)
            faces = jax.random.randint(kf, (n_scrambles,), 0, 6)
            amounts = jax.random.randint(ka, (n_scrambles,), 0, 3)

            def turn(c, fa):
                return self._rotate(c, fa[0], fa[1]), None

            cube, _ = jax.lax.scan(
                turn, cube, jnp.stack([faces, amounts], axis=1)
            )
        st = {"cube": cube, "step": jnp.int32(0)}
        return st, self._obs(cube, st["step"])

    def step_env(self, state, action, key):
        face = jnp.clip(action[0], 0, 5)
        amount = jnp.clip(action[2], 0, 2)
        cube = self._rotate(state["cube"], face, amount)
        step = state["step"] + 1
        solved = self._is_solved(cube)
        terminated = solved | (step >= int(self.config["time_limit"]))
        st = {"cube": cube, "step": step}
        return EnvOut(
            state=st,
            obs=self._obs(cube, step),
            reward=solved.astype(jnp.float32),
            terminated=terminated,
        )


# ---------------------------------------------------------------------------
# Sudoku
# ---------------------------------------------------------------------------


class SudokuEnv(TpuEnv):
    """9×9 Sudoku (jumanji Sudoku-v0); action = (row, col, digit 0-8).

    Behavioral reference: ``envpool/jumanji/sudoku_env.h`` — board cells
    −1 = empty else digit 0..8; an invalid placement (filled cell or
    row/column/box conflict) still writes the digit but ends the episode;
    otherwise the episode ends when no valid placement remains or the
    board is solved (reward 1, else 0).

    The reference samples puzzles from bundled .npy databases
    ("mixed" / "very-easy"); this build generates puzzles **procedurally
    on device**: the canonical valid grid is shuffled by digit relabeling,
    in-band row and in-stack column permutations and band/stack swaps (all
    symmetries of the solution grid), then ``num_holes`` cells are blanked
    (always solvable — the generating grid remains a solution).  The
    ``sudoku_database`` config maps to hole counts; ``initial_board``
    injects fixed puzzles for deterministic tests.
    """

    DEFAULT_CONFIG = {
        "sudoku_database": "mixed",  # "mixed" -> 50 holes, "very-easy" -> 30
        "num_holes": 0,              # explicit override (0 = by database)
        "initial_board": (),
    }

    def _holes(self) -> int:
        if int(self.config["num_holes"]):
            return int(self.config["num_holes"])
        return {"mixed": 50, "very-easy": 30}[
            str(self.config["sudoku_database"])
        ]

    def state_spec(self):
        return {
            "obs:board": ArraySpec(jnp.int32, (9, 9), -1, 8),
            "obs:action_mask": ArraySpec(jnp.bool_, (9, 9, 9)),
        }

    def action_spec(self):
        return {
            "action": ArraySpec(jnp.int32, (3,), 0, 8, is_discrete=True)
        }

    @staticmethod
    def _box(r, c):
        return (r // 3) * 3 + c // 3

    def _mask(self, board):
        rows = jnp.arange(9)
        filled = board >= 0
        val = jnp.where(filled, board, 9)  # 9 = sentinel slot
        row_used = jnp.zeros((9, 10), jnp.bool_).at[
            jnp.repeat(rows, 9), val.reshape(-1)
        ].set(True)[:, :9]
        col_used = jnp.zeros((9, 10), jnp.bool_).at[
            jnp.tile(rows, 9), val.reshape(-1)
        ].set(True)[:, :9]
        box_ids = self._box(*jnp.meshgrid(rows, rows, indexing="ij"))
        box_used = jnp.zeros((9, 10), jnp.bool_).at[
            box_ids.reshape(-1), val.reshape(-1)
        ].set(True)[:, :9]
        ok = (
            ~row_used[:, None, :]
            & ~col_used[None, :, :]
            & ~box_used[box_ids][:, :, :]
        )
        return ok & ~filled[:, :, None]

    @staticmethod
    def _is_solved(board):
        if board.dtype != jnp.int32:
            board = board.astype(jnp.int32)
        filled = (board >= 0).all()
        onehot = jax.nn.one_hot(jnp.clip(board, 0, 8), 9, dtype=jnp.int32)
        rows_ok = (onehot.sum(1) == 1).all()
        cols_ok = (onehot.sum(0) == 1).all()
        boxes = onehot.reshape(3, 3, 3, 3, 9).sum((1, 3))
        boxes_ok = (boxes == 1).all()
        return filled & rows_ok & cols_ok & boxes_ok

    def _obs(self, board):
        return {"obs:board": board, "obs:action_mask": self._mask(board)}

    def reset_env(self, key):
        init = self.config["initial_board"]
        if len(init):
            board = jnp.asarray(init, jnp.int32).reshape(9, 9)
            st = {"board": board}
            return st, self._obs(board)
        # Canonical solution grid: base[r, c] = (3*(r%3) + r//3 + c) % 9.
        r = jnp.arange(9)
        base = (3 * (r[:, None] % 3) + r[:, None] // 3 + r[None, :]) % 9
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        digits = jax.random.permutation(k1, 9)
        grid = digits[base]
        # Permute rows within bands + bands themselves (same for columns).
        def line_perm(ka, kb):
            within = jax.random.permutation(
                ka, jnp.arange(3)[None, :].repeat(3, 0), axis=1,
                independent=True,
            )
            bands = jax.random.permutation(kb, 3)
            return (bands[:, None] * 3 + within[bands]).reshape(-1)

        grid = grid[line_perm(k2, k3)][:, line_perm(k4, k5)]
        holes = jax.random.permutation(k6, 81)[: self._holes()]
        board = grid.reshape(-1).at[holes].set(-1).reshape(9, 9)
        st = {"board": board.astype(jnp.int32)}
        return st, self._obs(st["board"])

    def step_env(self, state, action, key):
        board = state["board"]
        rr = jnp.clip(action[0], 0, 8)
        cc = jnp.clip(action[1], 0, 8)
        vv = jnp.clip(action[2], 0, 8)
        valid = self._mask(board)[rr, cc, vv]
        new_board = board.at[rr, cc].set(vv)
        solved = self._is_solved(new_board)
        any_left = self._mask(new_board).any()
        terminated = ~valid | ~any_left | solved
        st = {"board": new_board}
        return EnvOut(
            state=st,
            obs=self._obs(new_board),
            reward=solved.astype(jnp.float32),
            terminated=terminated,
        )


# ---------------------------------------------------------------------------
# Game2048 (jumanji flavor)
# ---------------------------------------------------------------------------


class JumanjiGame2048Env(TpuEnv):
    """Jumanji Game2048-v1: 2048 with action mask + highest-tile info.

    Behavioral reference: ``envpool/jumanji/game2048_env.h`` — same core
    rules as the pgx-family ``Play2048-v1`` (exponent board, merge reward
    2^k, spawn after moving moves, done when stuck) but with the jumanji
    action order (0 = up, 1 = right, 2 = down, 3 = left), an
    ``obs:action_mask`` of moves that change the board, and
    ``info:highest_tile`` (the tile *value*, 1 if empty board).
    """

    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs:board": ArraySpec(jnp.int32, (4, 4), 0, 30),
            "obs:action_mask": ArraySpec(jnp.bool_, (4,)),
            "info:highest_tile": ArraySpec(jnp.int32, (), 1, 1 << 30),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.int32, (), 0, 3, is_discrete=True)}

    @staticmethod
    def _movable(board):
        from ..board.game_2048 import _move

        flags = []
        for jumanji_a in range(4):
            nb, _ = _move(board, jnp.int32((jumanji_a + 1) % 4))
            flags.append((nb != board).any())
        return jnp.stack(flags)

    def _obs(self, board):
        exp = board.max()
        return {
            "obs:board": board,
            "obs:action_mask": self._movable(board),
            "info:highest_tile": jnp.where(exp == 0, 1, 1 << exp).astype(
                jnp.int32
            ),
        }

    def reset_env(self, key):
        from ..board.game_2048 import Game2048Env

        spawn = Game2048Env._spawn
        k1, k2 = jax.random.split(key)
        board = jnp.zeros((4, 4), jnp.int32)
        board = spawn(self, k1, board)
        board = spawn(self, k2, board)
        return board, self._obs(board)

    def step_env(self, state, action, key):
        from ..board.game_2048 import Game2048Env, _move

        new_board, reward = _move(state, (jnp.clip(action, 0, 3) + 1) % 4)
        changed = (new_board != state).any()
        new_board = jnp.where(
            changed, Game2048Env._spawn(self, key, new_board), state
        )
        terminated = ~self._movable(new_board).any()
        return EnvOut(
            state=new_board,
            obs=self._obs(new_board),
            reward=jnp.where(changed, reward, 0.0).astype(jnp.float32),
            terminated=terminated,
        )
