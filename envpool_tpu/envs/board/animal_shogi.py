"""Animal Shogi (Dobutsu shogi) — TPU-native functional implementation.

Behavioral reference: ``envpool/pgx/animal_shogi.h`` (EnvPool's C++ port
of PGX animal shogi).  3x4 board flattened as ``sq = x * 4 + y`` with
x in [0,3) columns and y in [0,4) ranks (y=0 is the far rank from the
mover); pieces 0..4 = own pawn/bishop/rook/king/gold, 5..9 = opponent,
-1 empty.  Actions: 132 = 11 x 12; ``label // 12`` < 8 selects one of 8
move directions from square ``label % 12``, >= 8 drops hand piece
``label//12 - 8`` (pawn/bishop/rook) onto the square.  The board flips
every ply; captured gold demotes to pawn in hand; a pawn moving from
y==1 promotes to gold.  Wins: checkmate/stalemate (no legal action),
the "try" rule (king reaches y==0), illegal move; draws: 3-fold
repetition and 256 plies.

Parity notes: the reference rolls its flat 8x12 board history and 8x6
hand history by EIGHT elements per ply (``FlatRoll(..., 8)``,
animal_shogi.h:247-251) — not by one row — before writing the new
row 0; the observation planes and repetition counting are built from
that exact layout, so we replicate it verbatim.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_EMPTY, _PAWN, _BISHOP, _ROOK, _KING, _GOLD = -1, 0, 1, 2, 3, 4
_MAX_STEPS = 256
_INIT_BOARD = np.asarray(
    [6, -1, -1, 2, 8, 5, 0, 3, 7, -1, -1, 1], np.int32)
_DX = np.asarray([-1, -1, -1, 0, 0, 1, 1, 1])
_DY = np.asarray([-1, 0, 1, -1, 1, -1, 0, 1])


def _can_move_table():
    """can[piece, from, to] (animal_shogi.h:81-103)."""
    can = np.zeros((5, 12, 12), bool)
    for frm in range(12):
        x0, y0 = frm // 4, frm % 4
        for to in range(12):
            x1, y1 = to // 4, to % 4
            dx, dy = x1 - x0, y1 - y0
            neigh = (dx or dy) and abs(dx) <= 1 and abs(dy) <= 1
            can[_PAWN, frm, to] = dx == 0 and dy == -1
            can[_BISHOP, frm, to] = neigh and (dx == dy or dx == -dy)
            can[_ROOK, frm, to] = neigh and (dx == 0 or dy == 0)
            can[_KING, frm, to] = bool(neigh)
            can[_GOLD, frm, to] = neigh and (dx == 0 or dy != 1)
    return can


_CAN = _can_move_table()

# Static decode of all 132 labels (animal_shogi.h:72-79).
_LBL = np.arange(132)
_X = _LBL // 12
_SQ = _LBL % 12
_IS_DROP = _X >= 8
_DROP_PIECE = np.where(_IS_DROP, _X - 8, -1)
_FROM = np.where(_IS_DROP, -1, _SQ)
_nx = _SQ // 4 + _DX[np.minimum(_X, 7)]
_ny = _SQ % 4 + _DY[np.minimum(_X, 7)]
_TO_MOVE = np.where((_nx >= 0) & (_nx < 3) & (_ny >= 0) & (_ny < 4),
                    _nx * 4 + _ny, -1)
_TO = np.where(_IS_DROP, _SQ, _TO_MOVE)
# render/info coordinate map: sq -> (row=y, col=2-x)
_ROW = _SQ[:12] % 4
_COL = 2 - _SQ[:12] // 4
_SQ_OF_RC = np.zeros((4, 3), np.int32)
for _s in range(12):
    _SQ_OF_RC[_s % 4, 2 - _s // 4] = _s


def _is_checked(boards):
    """[...,12] boards -> checked flags (animal_shogi.h:352-369)."""
    dist = jnp.abs(boards - _KING)
    king_pos = jnp.argmin(dist, axis=-1)
    can = jnp.asarray(_CAN)  # [5,12,12]
    piece = boards  # [...,12]
    opp = piece >= 5
    # CanMove(piece % 5, king_pos, from): reversed args implement the
    # opponent's mirrored movement.
    pm = jnp.clip(piece % 5, 0, 4)
    frm = jnp.arange(12)
    reach = can[pm, king_pos[..., None], frm]  # [...,12]
    return (opp & reach).any(-1)


def _apply_moves(board, hand):
    """Board/hand after every one of the 132 labels: [132,12], [132,2,3].

    Mirrors ApplyMove/ApplyDrop (animal_shogi.h:272-293); illegal
    labels produce garbage rows that the legality mask never selects.
    """
    frm = jnp.asarray(np.where(_IS_DROP, 0, np.maximum(_FROM, 0)))
    to = jnp.asarray(np.clip(_TO, 0, 11))
    is_drop = jnp.asarray(_IS_DROP)
    drop_piece = jnp.asarray(np.maximum(_DROP_PIECE, 0))

    piece = board[frm]  # [132]
    promoted = jnp.where(
        (frm % 4 == 1) & (piece == _PAWN), _GOLD, piece)
    captured = board[to]
    hand_idx = jnp.clip((captured % 5) % 4, 0, 2)
    gain = jnp.where(
        (captured != _EMPTY) & (((captured % 5) % 4) < 3), 1, 0)

    b = jnp.broadcast_to(board, (132, 12))
    rows = jnp.arange(132)
    b = b.at[rows, frm].set(jnp.where(is_drop, b[rows, frm], _EMPTY))
    val = jnp.where(is_drop, drop_piece, promoted)
    b = b.at[rows, to].set(val)

    h = jnp.broadcast_to(hand, (132, 2, 3))
    h = h.at[rows, 0, hand_idx].add(jnp.where(is_drop, 0, gain))
    h = h.at[rows, 0, drop_piece].add(jnp.where(is_drop, -1, 0))
    return b, h


def _legal_mask(board, hand):
    """All-action legality [132] (animal_shogi.h:371-398)."""
    boards_after, _ = _apply_moves(board, hand)
    checked_after = _is_checked(boards_after)
    frm = jnp.asarray(np.maximum(_FROM, 0))
    to_ok = jnp.asarray(_TO >= 0)
    to = jnp.asarray(np.clip(_TO, 0, 11))
    piece = board[frm]
    move_ok = (~jnp.asarray(_IS_DROP) & to_ok
               & (piece >= _PAWN) & (piece <= _GOLD)
               & ((board[to] == _EMPTY) | (board[to] > _GOLD))
               & jnp.asarray(_CAN)[jnp.clip(piece, 0, 4), frm, to])
    drop_ok = (jnp.asarray(_IS_DROP)
               & (board[to] == _EMPTY)
               & (hand[0, jnp.asarray(np.maximum(_DROP_PIECE, 0))] > 0))
    return (move_ok | drop_ok) & ~checked_after


def _flip_pieces(arr):
    return jnp.where(arr != _EMPTY, (arr + 5) % 10, arr)


class AnimalShogiEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs": ArraySpec(jnp.float32, (-1, 4, 3, 194)),
            "info:board": ArraySpec(jnp.int32, (4, 3), -1, 9),
            "info:current_player": ArraySpec(jnp.int32, (), 0, 1),
            "info:hand": ArraySpec(jnp.int32, (2, 3)),
            "info:legal_action_mask": ArraySpec(jnp.bool_, (132,)),
            "info:turn": ArraySpec(jnp.int32, (), 0, 1),
        }

    def action_spec(self):
        if self.max_num_players > 1:
            return {"action": ArraySpec(jnp.int32, (-1,), 0, 131,
                                        is_discrete=True)}
        return {"action": ArraySpec(jnp.int32, (), 0, 131,
                                    is_discrete=True)}

    # -- observation (animal_shogi.h:409-483) --

    def _obs_player(self, st, player):
        bh = st["board_hist"]      # [96]
        hh = st["hand_hist"]       # [48]
        mine = player == st["player"]
        color = jnp.where(mine, st["turn"], 1 - st["turn"])
        bh_flip = _flip_pieces(bh).reshape(8, 12)[:, ::-1].reshape(96)
        hh_flip = jnp.roll(hh.reshape(8, 6), 3, axis=1).reshape(48)
        bh = jnp.where(mine, bh, bh_flip)
        hh = jnp.where(mine, hh, hh_flip)

        bh = bh.reshape(8, 12)
        planes = (bh[:, :, None] == jnp.arange(10)[None, None, :])
        # -> [8 hist, 12 sq, 10 piece] -> channel-major [8,10,12]
        piece_planes = planes.transpose(0, 2, 1).astype(jnp.float32)
        board_grid = jnp.zeros((8, 10, 4, 3), jnp.float32)
        board_grid = board_grid.at[
            :, :, jnp.asarray(_ROW), jnp.asarray(_COL)].set(piece_planes)

        hh = hh.reshape(8, 6)
        hand_planes = jnp.stack(
            [(hh >= 1), (hh >= 2)], -1).astype(jnp.float32)  # [8,6,2]
        hand_grid = jnp.broadcast_to(
            hand_planes.reshape(8, 12, 1, 1), (8, 12, 4, 3))

        rep = st["rep_hist"][:, None] == jnp.arange(2)[None, :]  # [8,2]
        rep_grid = jnp.broadcast_to(
            rep.astype(jnp.float32)[:, :, None, None], (8, 2, 4, 3))

        per_hist = jnp.concatenate(
            [board_grid, hand_grid, rep_grid], 1)  # [8,24,4,3]
        tail = jnp.stack([
            jnp.full((4, 3), color, jnp.float32),
            jnp.full((4, 3), st["steps"] / _MAX_STEPS, jnp.float32),
        ])  # [2,4,3]
        full = jnp.concatenate([per_hist.reshape(192, 4, 3), tail], 0)
        return full.transpose(1, 2, 0)  # [4,3,194] -> spec is (4,3,194)

    def _obs(self, st):
        board_rc = st["board"][jnp.asarray(_SQ_OF_RC)]
        obs = jnp.stack([self._obs_player(st, p) for p in range(2)])
        if self.max_num_players <= 1:
            obs = obs[0]
        return {
            "obs": obs,
            "info:board": board_rc,
            "info:current_player": st["player"],
            "info:hand": st["hand"],
            "info:legal_action_mask": st["legal"],
            "info:turn": st["turn"],
        }

    def reset_env(self, key):
        board = jnp.asarray(_INIT_BOARD)
        hand = jnp.zeros((2, 3), jnp.int32)
        bh = jnp.full(96, _EMPTY, jnp.int32).at[:12].set(board)
        st = {
            "board": board,
            "hand": hand,
            "board_hist": bh,
            "hand_hist": jnp.zeros(48, jnp.int32),
            "rep_hist": jnp.zeros(8, jnp.int32),
            "player": jax.random.randint(key, (), 0, 2, jnp.int32),
            "turn": jnp.int32(0),
            "steps": jnp.int32(0),
            "legal": _legal_mask(board, hand),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        if self.max_num_players > 1:
            action = jnp.reshape(action, (-1,))[0]
        action = jnp.clip(jnp.reshape(action, ()).astype(jnp.int32),
                          0, 131)
        st = dict(state)
        loser = st["player"]
        illegal = ~st["legal"][action]

        boards_after, hands_after = _apply_moves(st["board"], st["hand"])
        board = boards_after[action]
        hand = hands_after[action]
        steps = st["steps"] + 1
        is_try = ((board[0] == _KING) | (board[4] == _KING)
                  | (board[8] == _KING))

        # History rolls (the verbatim flat-by-8 quirk; see module doc).
        bh = jnp.roll(st["board_hist"], 8).at[:12].set(board)
        hh = jnp.roll(st["hand_hist"], 8)
        hh = hh.at[:3].set(hand[0]).at[3:6].set(hand[1])

        # Flip.
        board = _flip_pieces(board)[::-1]
        hand = hand[::-1]
        bh = _flip_pieces(bh).reshape(8, 12)[:, ::-1].reshape(96)
        hh = jnp.roll(hh.reshape(8, 6), 3, axis=1).reshape(48)
        player = 1 - st["player"]
        turn = 1 - st["turn"]

        # Repetition: rows matching (board, hands) after the flip.
        same_board = (bh.reshape(8, 12) == board[None, :]).all(-1)
        hand_flat = jnp.concatenate([hand[0], hand[1]])
        same_hand = (hh.reshape(8, 6) == hand_flat[None, :]).all(-1)
        rep = jnp.sum(same_board & same_hand).astype(jnp.int32) - 1
        is_rep_draw = rep >= 2

        legal = _legal_mask(board, hand)
        any_legal = legal.any()
        done = (~any_legal | is_try | is_rep_draw
                | (steps >= _MAX_STEPS))
        win = done & ~is_rep_draw & (steps < _MAX_STEPS)
        # Post-flip current player (= `player`) is the loser on win/try.
        win_rewards = jnp.full(2, 1.0).at[player].set(-1.0)
        ill_rewards = jnp.full(2, 1.0).at[loser].set(-1.0)
        rewards = jnp.where(
            illegal, ill_rewards,
            jnp.where(win, win_rewards, jnp.zeros(2))).astype(jnp.float32)
        terminated = done | illegal

        rep_hist = jnp.roll(st["rep_hist"], 1).at[0].set(rep)
        legal = jnp.where(terminated, jnp.ones(132, bool), legal)

        st = {
            "board": board, "hand": hand, "board_hist": bh,
            "hand_hist": hh, "rep_hist": rep_hist, "player": player,
            "turn": turn, "steps": steps, "legal": legal,
        }
        reward = rewards if self.max_num_players > 1 else rewards[loser]
        return EnvOut(state=st, obs=self._obs(st), reward=reward,
                      terminated=terminated)
