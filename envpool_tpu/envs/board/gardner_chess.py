"""Gardner minichess (5x5) — TPU-native masked-array implementation.

Behavioral reference: ``envpool/pgx/chess_games.h:230-290`` (pgx
GardnerChess).  Surface: obs (5, 5, 115), action space 1225 = 25
from-squares x 49 planes (32 queen rides of distance <= 4, 8 knight
jumps, 9 underpromotions).  Rules: standard chess movement on 5x5 with
no castling, no double pawn push, no en passant; promotion on the last
rank; draws by stalemate, 50-move rule, threefold repetition,
insufficient material, move cap.

Same analytic-legality architecture as ``chess.py`` (attack flood
fills, pins/checkers/evasions) specialised to the 5x5 grid.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec
from .chess import P, N, B, R, Q, K

_N = 5
_NSQ = 25
_NPLANE = 49
NUM_ACTIONS = _NSQ * _NPLANE  # 1225

_QUEEN_DIRS = np.asarray(
    [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1)]
)
_KNIGHT_D = np.asarray(
    [(2, 1), (1, 2), (-1, 2), (-2, 1), (-2, -1), (-1, -2), (1, -2), (2, -1)]
)
_UNDER_DIRS = np.asarray([(1, 0), (1, -1), (1, 1)])
_UNDER_PIECES = np.asarray([N, B, R])


def _build_tables():
    to_sq = np.full((_NSQ, _NPLANE), -1, np.int32)
    path = np.zeros((_NSQ, _NPLANE, _NSQ), bool)
    for sq in range(_NSQ):
        r, c = divmod(sq, _N)
        for d in range(8):
            dr, dc = _QUEEN_DIRS[d]
            for dist in range(1, _N):
                rr, cc = r + dr * dist, c + dc * dist
                if not (0 <= rr < _N and 0 <= cc < _N):
                    break
                plane = d * (_N - 1) + (dist - 1)
                to_sq[sq, plane] = rr * _N + cc
                for mid in range(1, dist):
                    path[sq, plane, (r + dr * mid) * _N + c + dc * mid] = True
        for kd in range(8):
            dr, dc = _KNIGHT_D[kd]
            rr, cc = r + dr, c + dc
            if 0 <= rr < _N and 0 <= cc < _N:
                to_sq[sq, 32 + kd] = rr * _N + cc
        if r == _N - 2:
            for ui in range(3):
                dr, dc = _UNDER_DIRS[ui]
                for pi in range(3):
                    rr, cc = r + dr, c + dc
                    if 0 <= cc < _N:
                        to_sq[sq, 40 + ui * 3 + pi] = rr * _N + cc
    return to_sq, path


_TO_SQ, _PATH = _build_tables()
_PLANE_DIR = np.full(_NPLANE, -1, np.int32)
_PLANE_DIST = np.zeros(_NPLANE, np.int32)
for _d in range(8):
    for _dist in range(1, _N):
        _PLANE_DIR[_d * (_N - 1) + _dist - 1] = _d
        _PLANE_DIST[_d * (_N - 1) + _dist - 1] = _dist
_IS_KNIGHT_PLANE = np.zeros(_NPLANE, bool)
_IS_KNIGHT_PLANE[32:40] = True
_IS_UNDER_PLANE = np.zeros(_NPLANE, bool)
_IS_UNDER_PLANE[40:] = True
_UNDER_PIECE = np.zeros(_NPLANE, np.int32)
_UNDER_DIR = np.zeros(_NPLANE, np.int32)
for _ui in range(3):
    for _pi in range(3):
        _UNDER_PIECE[40 + _ui * 3 + _pi] = _UNDER_PIECES[_pi]
        _UNDER_DIR[40 + _ui * 3 + _pi] = _ui

_INIT_BOARD = np.zeros(_NSQ, np.int8)
_INIT_BOARD[:5] = [R, N, B, Q, K]
_INIT_BOARD[5:10] = P
_INIT_BOARD[15:20] = -P
_INIT_BOARD[20:25] = [-R, -N, -B, -Q, -K]

_HIST = 8
_REP_HIST = 101
_rng = np.random.default_rng(5050)
_HASH_PIECE = _rng.integers(1, 2**32, size=(13, _NSQ), dtype=np.uint32)


def _shift(mask, dr, dc):
    m = mask.reshape(_N, _N)
    m = jnp.roll(m, (dr, dc), axis=(0, 1))
    if dr > 0:
        m = m.at[:dr, :].set(False)
    elif dr < 0:
        m = m.at[dr:, :].set(False)
    if dc > 0:
        m = m.at[:, :dc].set(False)
    elif dc < 0:
        m = m.at[:, dc:].set(False)
    return m.reshape(_NSQ)


def _slide_attacks(source, empty, dr, dc):
    att = jnp.zeros(_NSQ, bool)
    frontier = source
    for _ in range(_N - 1):
        frontier = _shift(frontier, dr, dc)
        att = att | frontier
        frontier = frontier & empty
    return att


def _attacked_by_them(board):
    empty = board == 0
    att = jnp.zeros(_NSQ, bool)
    rooks = (board == -R) | (board == -Q)
    bishops = (board == -B) | (board == -Q)
    for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        att = att | _slide_attacks(rooks, empty, dr, dc)
    for dr, dc in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
        att = att | _slide_attacks(bishops, empty, dr, dc)
    kn = board == -N
    for dr, dc in _KNIGHT_D:
        att = att | _shift(kn, int(dr), int(dc))
    kg = board == -K
    for dr, dc in _QUEEN_DIRS:
        att = att | _shift(kg, int(dr), int(dc))
    pw = board == -P
    att = att | _shift(pw, -1, -1) | _shift(pw, -1, 1)
    return att


def _checkers_and_pins(board, king_sq):
    empty = board == 0
    king = jnp.zeros(_NSQ, bool).at[king_sq].set(True)
    checkers = jnp.zeros(_NSQ, bool)
    check_line = jnp.zeros(_NSQ, bool)
    pinned = jnp.zeros(_NSQ, bool)
    pin_line = jnp.zeros((_NSQ, _NSQ), bool)
    for dr, dc in _KNIGHT_D:
        checkers = checkers | (
            _shift(king, int(dr), int(dc)) & (board == -N)
        )
    for dc in (-1, 1):
        checkers = checkers | (_shift(king, 1, dc) & (board == -P))
    for dr, dc in _QUEEN_DIRS:
        is_diag = dr != 0 and dc != 0
        slider = (board == -Q) | (board == (-B if is_diag else -R))
        frontier = king
        own_seen = jnp.zeros(_NSQ, bool)
        own_count = jnp.int32(0)
        line = jnp.zeros(_NSQ, bool)
        done = jnp.bool_(False)
        checker_here = jnp.zeros(_NSQ, bool)
        pin_here = jnp.zeros(_NSQ, bool)
        for _ in range(_N - 1):
            frontier = _shift(frontier, int(dr), int(dc))
            occ_own = frontier & (board > 0)
            occ_opp = frontier & (board < 0)
            hit_slider = occ_opp & slider
            any_own = occ_own.any()
            any_opp = occ_opp.any()
            any_slider = hit_slider.any()
            is_check = any_slider & (own_count == 0) & ~done
            checker_here = checker_here | jnp.where(
                is_check, hit_slider, False
            )
            check_line = check_line | jnp.where(is_check, line, False)
            is_pin = any_slider & (own_count == 1) & ~done
            pin_here = pin_here | jnp.where(is_pin, own_seen, False)
            pin_line_d = jnp.where(
                is_pin, line | hit_slider, jnp.zeros(_NSQ, bool)
            )
            pin_line = jnp.where(
                is_pin,
                pin_line | (own_seen[:, None] & pin_line_d[None, :]),
                pin_line,
            )
            own_count = own_count + jnp.where(any_own & ~done, 1, 0)
            own_seen = jnp.where(
                any_own & ~done & (own_count == 1), occ_own, own_seen
            )
            line = line | jnp.where(~done, frontier & empty, False)
            stop = (any_opp & ~any_slider) | any_slider | (own_count >= 2)
            done = done | stop
            frontier = frontier & (empty | occ_own)
        checkers = checkers | checker_here
        pinned = pinned | pin_here
    check_line = check_line | checkers
    return checkers, pinned, pin_line, check_line


def legal_action_mask(board):
    to_sq = jnp.asarray(_TO_SQ)
    path = jnp.asarray(_PATH)
    occ_own = board > 0
    occ_opp = board < 0

    king_sq = jnp.argmax(board == K)
    board_no_king = board.at[king_sq].set(0)
    attacked_xray = _attacked_by_them(board_no_king)
    checkers, pinned, pin_line, check_line = _checkers_and_pins(
        board, king_sq
    )
    n_checkers = checkers.sum()
    in_check = n_checkers > 0
    double_check = n_checkers > 1

    frm = jnp.arange(_NSQ)[:, None]
    to = to_sq
    valid_to = to >= 0
    to_c = jnp.clip(to, 0, _NSQ - 1)
    pc = board[frm]
    dest = board[to_c]
    dest_own = dest > 0
    dest_opp = dest < 0
    path_clear = ~jnp.any(
        path & (occ_own | occ_opp)[None, None, :], axis=-1
    )

    plane_dir = jnp.asarray(_PLANE_DIR)[None, :]
    plane_dist = jnp.asarray(_PLANE_DIST)[None, :]
    is_knightp = jnp.asarray(_IS_KNIGHT_PLANE)[None, :]
    is_underp = jnp.asarray(_IS_UNDER_PLANE)[None, :]
    under_dir = jnp.asarray(_UNDER_DIR)[None, :]
    row = frm // _N

    diag = (plane_dir % 2) == 1
    ortho = (plane_dir % 2) == 0
    qmove = (
        ((pc == Q) & (plane_dir >= 0))
        | ((pc == R) & ortho & (plane_dir >= 0))
        | ((pc == B) & diag & (plane_dir >= 0))
        | ((pc == K) & (plane_dir >= 0) & (plane_dist == 1))
    )
    fwd1 = (pc == P) & (plane_dir == 0) & (plane_dist == 1)
    cap = (
        (pc == P)
        & ((plane_dir == 1) | (plane_dir == 7))
        & (plane_dist == 1)
    )
    pawn_ok = (fwd1 & (dest == 0)) | (cap & dest_opp)
    under_ok = (
        is_underp
        & (pc == P)
        & (row == _N - 2)
        & jnp.where(under_dir == 0, dest == 0, dest_opp)
    )
    knight_ok = is_knightp & (pc == N)

    pseudo = (
        valid_to
        & ~dest_own
        & (
            (qmove & path_clear & ~(pc == P))
            | pawn_ok
            | knight_ok
            | under_ok
        )
    )
    pseudo = pseudo & (pc > 0)
    king_move = pc == K
    pseudo = pseudo & jnp.where(king_move, ~attacked_xray[to_c], True)
    on_line = check_line[to_c] | checkers[to_c]
    pseudo = pseudo & jnp.where(in_check & ~king_move, on_line, True)
    pseudo = pseudo & jnp.where(double_check, king_move, True)
    from_pinned = pinned[frm]
    pin_dest_ok = pin_line[frm, to_c]
    pseudo = pseudo & jnp.where(from_pinned, pin_dest_ok, True)
    return pseudo.reshape(-1)


def apply_action(board, action):
    from_sq = action // _NPLANE
    plane = action % _NPLANE
    to = jnp.asarray(_TO_SQ)[from_sq, plane]
    to = jnp.clip(to, 0, _NSQ - 1)
    pc = board[from_sq]
    is_under = jnp.asarray(_IS_UNDER_PLANE)[plane]
    under_piece = jnp.asarray(_UNDER_PIECE)[plane]
    to_row = to // _N
    promo_q = (pc == P) & (to_row == _N - 1) & ~is_under
    new_piece = jnp.where(is_under, under_piece, jnp.where(promo_q, Q, pc))
    captured = board[to]
    b = board.at[from_sq].set(0)
    b = b.at[to].set(new_piece.astype(board.dtype))
    was_cap_or_pawn = (captured != 0) | (pc == P)
    return b, was_cap_or_pawn


def flip(board):
    """Mirror ranks into the opponent's frame (files preserved)."""
    b = board.reshape(_N, _N)[::-1].reshape(_NSQ)
    return (-b).astype(board.dtype)


def board_hash(board):
    hp = jnp.asarray(_HASH_PIECE)
    idx = (board.astype(jnp.int32) + 6).astype(jnp.int32)
    vals = hp[idx, jnp.arange(_NSQ)]
    return jax.lax.reduce(
        vals, np.uint32(0), jax.lax.bitwise_xor, (0,)
    )


class GardnerChessEnv(TpuEnv):
    """GardnerChess-v1 (pgx surface)."""

    DEFAULT_CONFIG = {"max_termination_steps": 256}

    def state_spec(self):
        return {
            "obs": ArraySpec(jnp.float32, (-1, _N, _N, 115)),
            "info:board": ArraySpec(jnp.int32, (_N, _N)),
            "info:current_player": ArraySpec(jnp.int32, (), 0, 1),
            "info:fullmove_count": ArraySpec(jnp.int32, ()),
            "info:halfmove_count": ArraySpec(jnp.int32, ()),
            "info:legal_action_mask": ArraySpec(jnp.bool_, (NUM_ACTIONS,)),
            "info:turn": ArraySpec(jnp.int32, (), 0, 1),
        }

    def action_spec(self):
        shape = (-1,) if self.max_num_players > 1 else ()
        return {
            "action": ArraySpec(
                jnp.int32, shape, 0, NUM_ACTIONS - 1, is_discrete=True
            )
        }

    def _initial_state(self, key):
        shuffled = jax.random.permutation(key, 2).astype(jnp.int32)
        board = jnp.asarray(_INIT_BOARD)
        return {
            "board": board,
            "turn": jnp.int32(0),
            "halfmove": jnp.int32(0),
            "fullmove": jnp.int32(1),
            "ply": jnp.int32(0),
            "shuffled": shuffled,
            "hist": jnp.tile(board[None], (_HIST, 1)),
            "rep_hash": jnp.zeros(_REP_HIST, jnp.uint32).at[0].set(
                board_hash(board)
            ),
            "rep_len": jnp.int32(1),
        }

    def _repetitions(self, st, h):
        valid = jnp.arange(_REP_HIST) < st["rep_len"]
        return jnp.sum((st["rep_hash"] == h) & valid)

    def _obs(self, st):
        planes = []
        for t in range(_HIST):
            b = st["hist"][t]
            for p in range(1, 7):
                planes.append((b == p).astype(jnp.float32))
            for p in range(1, 7):
                planes.append((b == -p).astype(jnp.float32))
            h = board_hash(b)
            reps = self._repetitions(st, h)
            planes.append(jnp.full(_NSQ, (reps >= 2).astype(jnp.float32)))
            planes.append(jnp.full(_NSQ, (reps >= 3).astype(jnp.float32)))
        planes.append(jnp.full(_NSQ, st["turn"].astype(jnp.float32) % 2))
        planes.append(jnp.full(_NSQ, st["fullmove"].astype(jnp.float32)))
        planes.append(jnp.full(_NSQ, st["halfmove"].astype(jnp.float32)))
        obs = jnp.stack(planes, axis=-1).reshape(_N, _N, 115)
        if self.max_num_players > 1:
            obs = jnp.stack([obs, obs])
        return obs

    def _obs_dict(self, st, mask):
        player = st["shuffled"][st["turn"] % 2]
        return {
            "obs": self._obs(st),
            "info:board": st["board"].astype(jnp.int32).reshape(_N, _N),
            "info:current_player": player,
            "info:fullmove_count": st["fullmove"],
            "info:halfmove_count": st["halfmove"],
            "info:legal_action_mask": mask,
            "info:turn": st["turn"] % 2,
        }

    def reset_env(self, key):
        st = self._initial_state(key)
        return st, self._obs_dict(st, legal_action_mask(st["board"]))

    def _insufficient_material(self, board):
        n_my = jnp.sum((board > 0) & (board != K))
        n_opp = jnp.sum((board < 0) & (board != -K))
        minor_my = (n_my == 1) & (
            jnp.sum((board == N) | (board == B)) == 1
        )
        minor_opp = (n_opp == 1) & (
            jnp.sum((board == -N) | (board == -B)) == 1
        )
        bare = (n_my == 0) & (n_opp == 0)
        one_minor = ((n_my == 0) & minor_opp) | ((n_opp == 0) & minor_my)
        return bare | one_minor

    def step_env(self, state, action, key):
        if self.max_num_players > 1:
            action = jnp.reshape(action, (-1,))[0]
        action = jnp.clip(
            jnp.reshape(action, ()).astype(jnp.int32), 0, NUM_ACTIONS - 1
        )
        st = dict(state)
        mover = st["shuffled"][st["turn"] % 2]
        mask = legal_action_mask(st["board"])
        illegal = ~mask[action]

        board, zero_clock = apply_action(st["board"], action)
        next_board = flip(board)
        halfmove = jnp.where(zero_clock, 0, st["halfmove"] + 1)
        fullmove = st["fullmove"] + (st["turn"] % 2)
        turn = st["turn"] + 1
        h = board_hash(next_board)
        rep_len = jnp.where(
            zero_clock, 0, jnp.minimum(st["rep_len"], _REP_HIST - 1)
        )
        rep_hash = jnp.where(
            zero_clock, jnp.zeros(_REP_HIST, jnp.uint32), st["rep_hash"]
        )
        rep_hash = jnp.roll(rep_hash, 1).at[0].set(h)
        rep_len = rep_len + 1
        hist = jnp.concatenate([next_board[None], st["hist"][:-1]], axis=0)
        st2 = {
            "board": next_board,
            "turn": turn,
            "halfmove": halfmove,
            "fullmove": fullmove,
            "ply": st["ply"] + 1,
            "shuffled": st["shuffled"],
            "hist": hist,
            "rep_hash": rep_hash,
            "rep_len": rep_len,
        }
        next_mask = legal_action_mask(st2["board"])
        no_moves = ~next_mask.any()
        king_sq = jnp.argmax(st2["board"] == K)
        in_check = _attacked_by_them(st2["board"])[king_sq]
        checkmate = no_moves & in_check
        stalemate = no_moves & ~in_check
        reps = self._repetitions(st2, h)
        draw = (
            stalemate
            | (halfmove >= 100)
            | (reps >= 3)
            | self._insufficient_material(st2["board"])
            | (st2["ply"] >= int(self.config["max_termination_steps"]))
        )
        done = checkmate | draw | illegal
        winner = mover
        loser = st2["shuffled"][st2["turn"] % 2]
        rewards = jnp.zeros(2, jnp.float32)
        rewards = jnp.where(
            checkmate,
            rewards.at[winner].set(1.0).at[loser].set(-1.0),
            rewards,
        )
        rewards = jnp.where(
            illegal,
            jnp.full(2, 1.0, jnp.float32).at[mover].set(-1.0),
            rewards,
        )
        next_mask = jnp.where(done, jnp.ones_like(next_mask), next_mask)
        reward = rewards if self.max_num_players > 1 else rewards[mover]
        return EnvOut(
            state=st2,
            obs=self._obs_dict(st2, next_mask),
            reward=reward,
            terminated=done,
        )
