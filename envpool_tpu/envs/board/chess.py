"""Chess — TPU-native masked-array implementation (pgx surface).

Behavioral reference: ``envpool/pgx/chess_games.h`` (EnvPool's C++ port
of pgx chess).  Surface parity: obs (8, 8, 119) AlphaZero planes, action
space 4672 = 64 from-squares x 73 move planes (56 queen rides, 8 knight
jumps, 9 underpromotions), infos board/castling_rights/en_passant/
fullmove/halfmove/legal_action_mask/turn; rewards +-1 at checkmate, 0 on
draws (stalemate, insufficient material, 50-move, threefold repetition).

Design (original, not a translation): the board always sits in the
*current player's* frame (flipped each ply, pawns move "up").  Legality
is computed analytically — attack maps by shift-based flood fills over
the 8x8 grid, then pins/checkers/evasion masks — instead of per-move
make/unmake; the result is a fixed-shape boolean program over the
[64, 73] move-table constants, which XLA fuses into a handful of
vectorized ops.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

# Piece codes (current-player-positive): 1 P, 2 N, 3 B, 4 R, 5 Q, 6 K.
P, N, B, R, Q, K = 1, 2, 3, 4, 5, 6

# Square index: sq = row * 8 + col, row 0 = current player's back rank.
# (dr, dc) for the 8 queen directions, plane-major: N, NE, E, SE, S, SW,
# W, NW (N = toward the opponent).
_QUEEN_DIRS = np.asarray(
    [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1)]
)
_KNIGHT_D = np.asarray(
    [(2, 1), (1, 2), (-1, 2), (-2, 1), (-2, -1), (-1, -2), (1, -2), (2, -1)]
)
# Underpromotion planes: 3 directions (forward, capture-left,
# capture-right) x 3 pieces (N, B, R).
_UNDER_DIRS = np.asarray([(1, 0), (1, -1), (1, 1)])
_UNDER_PIECES = np.asarray([N, B, R])

NUM_ACTIONS = 4672  # 64 * 73


def _build_tables():
    """Static [64, 73] to-square table and between-path masks."""
    to_sq = np.full((64, 73), -1, np.int32)
    path = np.zeros((64, 73, 64), bool)  # squares strictly between
    for sq in range(64):
        r, c = divmod(sq, 8)
        # 56 queen-ride planes: dir * 7 + (dist - 1).
        for d in range(8):
            dr, dc = _QUEEN_DIRS[d]
            for dist in range(1, 8):
                rr, cc = r + dr * dist, c + dc * dist
                if not (0 <= rr < 8 and 0 <= cc < 8):
                    break
                plane = d * 7 + (dist - 1)
                to_sq[sq, plane] = rr * 8 + cc
                for mid in range(1, dist):
                    path[sq, plane, (r + dr * mid) * 8 + (c + dc * mid)] = True
        # 8 knight planes.
        for kd in range(8):
            dr, dc = _KNIGHT_D[kd]
            rr, cc = r + dr, c + dc
            if 0 <= rr < 8 and 0 <= cc < 8:
                to_sq[sq, 56 + kd] = rr * 8 + cc
        # 9 underpromotion planes (from rank 6 only).
        if r == 6:
            for ui in range(3):
                dr, dc = _UNDER_DIRS[ui]
                for pi in range(3):
                    rr, cc = r + dr, c + dc
                    if 0 <= cc < 8:
                        to_sq[sq, 64 + ui * 3 + pi] = rr * 8 + cc
    return to_sq, path


_TO_SQ, _PATH = _build_tables()

# Per-(plane) metadata.
_PLANE_DIR = np.full(73, -1, np.int32)
_PLANE_DIST = np.zeros(73, np.int32)
for _d in range(8):
    for _dist in range(1, 8):
        _PLANE_DIR[_d * 7 + _dist - 1] = _d
        _PLANE_DIST[_d * 7 + _dist - 1] = _dist
_IS_KNIGHT_PLANE = np.zeros(73, bool)
_IS_KNIGHT_PLANE[56:64] = True
_IS_UNDER_PLANE = np.zeros(73, bool)
_IS_UNDER_PLANE[64:] = True
_UNDER_PIECE = np.zeros(73, np.int32)
_UNDER_DIR = np.zeros(73, np.int32)
for _ui in range(3):
    for _pi in range(3):
        _UNDER_PIECE[64 + _ui * 3 + _pi] = _UNDER_PIECES[_pi]
        _UNDER_DIR[64 + _ui * 3 + _pi] = _ui

_INIT_BOARD = np.zeros(64, np.int8)
_INIT_BOARD[:8] = [R, N, B, Q, K, B, N, R]
_INIT_BOARD[8:16] = P
_INIT_BOARD[48:56] = -P
_INIT_BOARD[56:64] = [-R, -N, -B, -Q, -K, -B, -N, -R]

_HIST = 8          # obs history steps
_REP_HIST = 101    # position-hash window for threefold detection

# Zobrist-style hash basis (static).
_rng = np.random.default_rng(20260821)
_HASH_PIECE = _rng.integers(1, 2**32, size=(13, 64), dtype=np.uint32)
_HASH_CASTLE = _rng.integers(1, 2**32, size=(4,), dtype=np.uint32)
_HASH_EP = _rng.integers(1, 2**32, size=(65,), dtype=np.uint32)


def _shift(mask, dr, dc):
    """Shift a [64] board mask by (dr, dc), zero-filling the edges."""
    m = mask.reshape(8, 8)
    m = jnp.roll(m, (dr, dc), axis=(0, 1))
    if dr > 0:
        m = m.at[:dr, :].set(False)
    elif dr < 0:
        m = m.at[dr:, :].set(False)
    if dc > 0:
        m = m.at[:, :dc].set(False)
    elif dc < 0:
        m = m.at[:, dc:].set(False)
    return m.reshape(64)


def _slide_attacks(source, empty, dr, dc):
    """Squares attacked by sliding from `source` along (dr, dc)."""
    att = jnp.zeros(64, bool)
    frontier = source
    for _ in range(7):
        frontier = _shift(frontier, dr, dc)
        att = att | frontier
        frontier = frontier & empty
    return att


def _attacked_by_them(board):
    """[64] mask of squares attacked by the opponent (negative pieces)."""
    empty = board == 0
    att = jnp.zeros(64, bool)
    # Sliders.
    rooks = (board == -R) | (board == -Q)
    bishops = (board == -B) | (board == -Q)
    for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        att = att | _slide_attacks(rooks, empty, dr, dc)
    for dr, dc in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
        att = att | _slide_attacks(bishops, empty, dr, dc)
    # Knights.
    kn = board == -N
    for dr, dc in _KNIGHT_D:
        att = att | _shift(kn, int(dr), int(dc))
    # King.
    kg = board == -K
    for dr, dc in _QUEEN_DIRS:
        att = att | _shift(kg, int(dr), int(dc))
    # Pawns (they move toward row 0: attack down-left / down-right).
    pw = board == -P
    att = att | _shift(pw, -1, -1) | _shift(pw, -1, 1)
    return att


def _checkers_and_pins(board, king_sq):
    """(checkers [64], pinned [64], pin_line [64,64], check_line [64]).

    check_line: squares that block/capture a single slider check.
    pin_line[p]: allowed destination squares for a piece pinned at p.
    """
    empty = board == 0
    king = jnp.zeros(64, bool).at[king_sq].set(True)
    checkers = jnp.zeros(64, bool)
    check_line = jnp.zeros(64, bool)
    pinned = jnp.zeros(64, bool)
    pin_line = jnp.zeros((64, 64), bool)

    # Knight checks.
    for dr, dc in _KNIGHT_D:
        sqm = _shift(king, int(dr), int(dc)) & (board == -N)
        checkers = checkers | sqm
    # Pawn checks (enemy pawns attack toward row 0; from the king they
    # sit up-left / up-right).
    for dc in (-1, 1):
        sqm = _shift(king, 1, dc) & (board == -P)
        checkers = checkers | sqm
    # Slider checks + pins, direction by direction.
    for di, (dr, dc) in enumerate(_QUEEN_DIRS):
        is_diag = dr != 0 and dc != 0
        slider = (board == -Q) | (board == (-B if is_diag else -R))
        # Walk from the king: first own piece may be pinned; first enemy
        # slider beyond gives check or pin.
        ray = jnp.zeros(64, bool)
        frontier = king
        own_seen = jnp.zeros(64, bool)   # candidate pinned piece
        own_count = jnp.int32(0)
        line = jnp.zeros(64, bool)
        done = jnp.bool_(False)
        checker_here = jnp.zeros(64, bool)
        pin_here = jnp.zeros(64, bool)
        for step in range(7):
            frontier = _shift(frontier, int(dr), int(dc))
            occ_own = frontier & (board > 0)
            occ_opp = frontier & (board < 0)
            hit_slider = occ_opp & slider
            # Case analysis below uses running scalars.
            any_own = occ_own.any()
            any_opp = occ_opp.any()
            any_slider = hit_slider.any()
            # Check: slider seen with no blockers.
            is_check = any_slider & (own_count == 0) & ~done
            checker_here = checker_here | jnp.where(
                is_check, hit_slider, False
            )
            check_line = check_line | jnp.where(is_check, line, False)
            # Pin: slider seen with exactly one own blocker.
            is_pin = any_slider & (own_count == 1) & ~done
            pin_here = pin_here | jnp.where(is_pin, own_seen, False)
            pin_line_d = jnp.where(
                is_pin, line | hit_slider, jnp.zeros(64, bool)
            )
            pin_line = jnp.where(
                is_pin,
                pin_line | (own_seen[:, None] & pin_line_d[None, :]),
                pin_line,
            )
            # Update walking state.
            own_count = own_count + jnp.where(
                any_own & ~done, 1, 0
            )
            own_seen = jnp.where(
                any_own & ~done & (own_count == 1), occ_own, own_seen
            )
            line = line | jnp.where(~done, frontier & (board == 0), False)
            stop = (any_opp & ~any_slider) | any_slider | (own_count >= 2)
            done = done | stop
            frontier = frontier & (empty | occ_own)
        checkers = checkers | checker_here
        pinned = pinned | pin_here
    # Non-slider checkers can only be captured (not blocked): check_line
    # for them is just the checker square itself; include all checkers.
    check_line = check_line | checkers
    return checkers, pinned, pin_line, check_line


def legal_action_mask(board, castling, ep_sq):
    """[4672] legality under full rules (current-player perspective)."""
    to_sq = jnp.asarray(_TO_SQ)
    path = jnp.asarray(_PATH)
    piece_at = board  # [64]
    occ_own = board > 0
    occ_opp = board < 0
    empty = board == 0

    king_sq = jnp.argmax(board == K)
    attacked = _attacked_by_them(board)
    # Attacked squares for king moves must ignore the king itself
    # (sliders x-ray through the king square).
    board_no_king = board.at[king_sq].set(0)
    attacked_xray = _attacked_by_them(board_no_king)
    checkers, pinned, pin_line, check_line = _checkers_and_pins(
        board, king_sq
    )
    n_checkers = checkers.sum()
    in_check = n_checkers > 0
    double_check = n_checkers > 1

    frm = jnp.arange(64)[:, None]              # [64,1]
    to = to_sq                                  # [64,73]
    valid_to = to >= 0
    to_c = jnp.clip(to, 0, 63)
    pc = piece_at[frm]                          # [64,73] piece on from
    dest = board[to_c]
    dest_own = dest > 0
    dest_opp = dest < 0
    path_clear = ~jnp.any(path & occ_own[None, None, :], axis=-1) & ~jnp.any(
        path & occ_opp[None, None, :], axis=-1
    )

    plane_dir = jnp.asarray(_PLANE_DIR)[None, :]
    plane_dist = jnp.asarray(_PLANE_DIST)[None, :]
    is_knightp = jnp.asarray(_IS_KNIGHT_PLANE)[None, :]
    is_underp = jnp.asarray(_IS_UNDER_PLANE)[None, :]
    under_dir = jnp.asarray(_UNDER_DIR)[None, :]

    row = frm // 8
    col = frm % 8
    # Piece-kind geometric validity on queen planes.
    diag = (plane_dir % 2) == 1
    ortho = (plane_dir % 2) == 0
    qmove = (
        ((pc == Q) & (plane_dir >= 0))
        | ((pc == R) & ortho & (plane_dir >= 0))
        | ((pc == B) & diag & (plane_dir >= 0))
        | ((pc == K) & (plane_dir >= 0) & (plane_dist == 1))
    )
    # Pawn queen-plane moves: forward 1 (dir 0, dist 1), forward 2 from
    # rank 1, captures (dir 1/7, dist 1).
    fwd1 = (pc == P) & (plane_dir == 0) & (plane_dist == 1)
    fwd2 = (pc == P) & (plane_dir == 0) & (plane_dist == 2) & (row == 1)
    cap = (
        (pc == P)
        & ((plane_dir == 1) | (plane_dir == 7))
        & (plane_dist == 1)
    )
    ep_to = jnp.where(ep_sq >= 0, ep_sq, 0)
    is_ep = cap & (to_c == ep_to) & (ep_sq >= 0)
    pawn_ok = (
        (fwd1 & (dest == 0))
        | (fwd2 & (dest == 0) & path_clear)
        | (cap & (dest_opp | is_ep))
    )
    # Underpromotions: pawn on rank 6; forward needs empty, captures
    # need an enemy.
    under_ok = (
        is_underp
        & (pc == P)
        & (row == 6)
        & jnp.where(
            under_dir == 0, dest == 0, dest_opp
        )
    )
    # Knight planes.
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
    # Never move from an empty/enemy square.
    pseudo = pseudo & (pc > 0)
    # A queen-plane move by a pawn beyond the rules is excluded above
    # because pawn_ok covers all pawn queen-plane moves; make sure other
    # pieces don't use pawn-only predicates:
    pseudo = pseudo & ~((pc != P) & is_underp)

    # King safety.
    king_move = pc == K
    safe_to = ~attacked_xray[to_c]
    pseudo = pseudo & jnp.where(king_move, safe_to, True)

    # Check evasion: non-king moves must land on the check line (block
    # or capture the single checker); double check → king only.
    on_line = check_line[to_c] | checkers[to_c]
    # En passant can capture a checking pawn that just double-pushed:
    # the captured pawn sits one row below ep square.
    ep_capture_sq = jnp.clip(ep_to - 8, 0, 63)
    ep_evades = is_ep & checkers[ep_capture_sq]
    pseudo = pseudo & jnp.where(
        in_check & ~king_move, on_line | ep_evades, True
    )
    pseudo = pseudo & jnp.where(double_check, king_move, True)

    # Pins: a pinned piece may only move along its pin line.
    from_pinned = pinned[frm]                       # [64, 1]
    pin_dest_ok = pin_line[frm, to_c]               # [64, 73]
    pseudo = pseudo & jnp.where(from_pinned, pin_dest_ok, True)

    # En passant discovered-check edge case: removing both pawns from
    # the rank may expose the king along that rank.  Exact test: rebuild
    # the board after the ep capture and verify the king is not attacked.
    # (Cheap: at most 2 candidate from-squares; use where with a scan
    # over the two diagonal froms.)
    def ep_legal(from_sq):
        b2 = board.at[from_sq].set(0)
        b2 = b2.at[ep_to].set(P)
        b2 = b2.at[ep_capture_sq].set(0)
        att2 = _attacked_by_them(b2)
        return ~att2[jnp.argmax(b2 == K)]

    ep_from_l = jnp.clip(ep_to - 9, 0, 63)
    ep_from_r = jnp.clip(ep_to - 7, 0, 63)
    ep_l_ok = ep_legal(ep_from_l)
    ep_r_ok = ep_legal(ep_from_r)
    ep_legal_from = (
        jnp.zeros(64, bool)
        .at[ep_from_l]
        .set(ep_l_ok)
        .at[ep_from_r]
        .set(ep_r_ok)
    )
    pseudo = pseudo & jnp.where(
        is_ep, ep_legal_from[frm[:, 0]][:, None], True
    )

    mask = pseudo

    # Castling: encoded as king moves e1->g1 (dir E dist 2) and e1->c1
    # (dir W dist 2).
    e1, f1, g1, d1, c1, b1 = 4, 5, 6, 3, 2, 1
    king_home = board[e1] == K
    ks_clear = empty[f1] & empty[g1]
    qs_clear = empty[d1] & empty[c1] & empty[b1]
    ks_safe = ~attacked[e1] & ~attacked[f1] & ~attacked[g1]
    qs_safe = ~attacked[e1] & ~attacked[d1] & ~attacked[c1]
    ks_ok = castling[0] & king_home & (board[7] == R) & ks_clear & ks_safe
    qs_ok = castling[1] & king_home & (board[0] == R) & qs_clear & qs_safe
    # Plane for E dist 2: dir 2 (E) * 7 + 1 = 15; W dist 2: dir 6*7+1=43.
    mask = mask.at[e1, 15].set(mask[e1, 15] | (ks_ok & ~in_check))
    mask = mask.at[e1, 43].set(mask[e1, 43] | (qs_ok & ~in_check))

    return mask.reshape(-1)


def apply_action(board, castling, opp_castling, ep_sq, action):
    """Apply `action` in the current frame → (board', my castling',
    opp castling', new ep square, was_capture_or_pawn)."""
    from_sq = action // 73
    plane = action % 73
    to = jnp.asarray(_TO_SQ)[from_sq, plane]
    to = jnp.clip(to, 0, 63)
    pc = board[from_sq]
    is_under = jnp.asarray(_IS_UNDER_PLANE)[plane]
    under_piece = jnp.asarray(_UNDER_PIECE)[plane]
    # Promotion: pawn reaching rank 7 via queen plane → Q.
    to_row = to // 8
    promo_q = (pc == P) & (to_row == 7) & ~is_under
    new_piece = jnp.where(
        is_under, under_piece, jnp.where(promo_q, Q, pc)
    )
    captured = board[to]
    # En passant capture.
    ep_to = jnp.where(ep_sq >= 0, ep_sq, -2)
    is_ep = (pc == P) & (to == ep_to)
    ep_victim = jnp.clip(to - 8, 0, 63)
    b = board.at[from_sq].set(0)
    b = jnp.where(is_ep, b.at[ep_victim].set(0), b)
    b = b.at[to].set(new_piece.astype(board.dtype))
    # Castling rook hop.
    e1, g1, c1 = 4, 6, 2
    is_ks = (pc == K) & (from_sq == e1) & (to == g1)
    is_qs = (pc == K) & (from_sq == e1) & (to == c1)
    b = jnp.where(is_ks, b.at[7].set(0).at[5].set(R), b)
    b = jnp.where(is_qs, b.at[0].set(0).at[3].set(R), b)
    # Rights updates.
    my_castle = jnp.stack(
        [
            castling[0] & ~(pc == K) & ~(from_sq == 7),
            castling[1] & ~(pc == K) & ~(from_sq == 0),
        ]
    )
    # Opponent rook captured on its home squares (63/56 in my frame).
    opp_castle = jnp.stack(
        [
            opp_castling[0] & ~(to == 63),
            opp_castling[1] & ~(to == 56),
        ]
    )
    # New en passant square (after double push) — in MY frame; the
    # flip converts it for the opponent.
    dbl = (pc == P) & (to - from_sq == 16)
    new_ep = jnp.where(dbl, from_sq + 8, -1)
    was_cap_or_pawn = (captured != 0) | (pc == P) | is_ep
    return b, my_castle, opp_castle, new_ep, was_cap_or_pawn


def flip(board):
    """Mirror ranks into the opponent's frame (files preserved, negate).

    Rank-only mirroring keeps castling geometry intact (king stays on
    the e-file); this matches pgx's board flip.
    """
    b = board.reshape(8, 8)[::-1].reshape(64)
    return (-b).astype(board.dtype)


def flip_sq(sq):
    """Rank-mirror a square index (-1 passes through)."""
    return jnp.where(sq >= 0, sq ^ 56, -1)


def board_hash(board, castling, opp_castling, ep_sq):
    hp = jnp.asarray(_HASH_PIECE)
    idx = (board.astype(jnp.int32) + 6).astype(jnp.int32)
    vals = hp[idx, jnp.arange(64)]
    h = jax.lax.reduce(
        vals, np.uint32(0), jax.lax.bitwise_xor, (0,)
    )
    hc = jnp.asarray(_HASH_CASTLE)
    z = np.uint32(0)
    h = h ^ jnp.where(castling[0], hc[0], z)
    h = h ^ jnp.where(castling[1], hc[1], z)
    h = h ^ jnp.where(opp_castling[0], hc[2], z)
    h = h ^ jnp.where(opp_castling[1], hc[3], z)
    h = h ^ jnp.asarray(_HASH_EP)[jnp.clip(ep_sq, -1, 63) + 1]
    return h


class ChessEnv(TpuEnv):
    """Chess-v1 (pgx surface)."""

    DEFAULT_CONFIG = {"max_termination_steps": 512}

    def state_spec(self):
        return {
            "obs": ArraySpec(jnp.float32, (-1, 8, 8, 119)),
            "info:board": ArraySpec(jnp.int32, (8, 8)),
            "info:castling_rights": ArraySpec(jnp.bool_, (2, 2)),
            "info:current_player": ArraySpec(jnp.int32, (), 0, 1),
            "info:en_passant": ArraySpec(jnp.int32, (), -1, 63),
            "info:fullmove_count": ArraySpec(jnp.int32, ()),
            "info:halfmove_count": ArraySpec(jnp.int32, ()),
            "info:legal_action_mask": ArraySpec(jnp.bool_, (NUM_ACTIONS,)),
            "info:turn": ArraySpec(jnp.int32, (), 0, 1),
        }

    def action_spec(self):
        if self.max_num_players > 1:
            return {
                "action": ArraySpec(
                    jnp.int32, (-1,), 0, NUM_ACTIONS - 1, is_discrete=True
                )
            }
        return {
            "action": ArraySpec(
                jnp.int32, (), 0, NUM_ACTIONS - 1, is_discrete=True
            )
        }

    # -- state -------------------------------------------------------------

    def _initial_state(self, key):
        shuffled = jax.random.permutation(key, 2).astype(jnp.int32)
        board = jnp.asarray(_INIT_BOARD)
        return {
            "board": board,
            "castling": jnp.ones(2, bool),       # current player's (KS, QS)
            "opp_castling": jnp.ones(2, bool),
            "ep": jnp.int32(-1),
            "turn": jnp.int32(0),
            "halfmove": jnp.int32(0),
            "fullmove": jnp.int32(1),
            "ply": jnp.int32(0),
            "shuffled": shuffled,                # player id per turn parity
            "hist": jnp.tile(board[None], (_HIST, 1)),
            "rep_hash": jnp.zeros(_REP_HIST, jnp.uint32).at[0].set(
                board_hash(board, jnp.ones(2, bool), jnp.ones(2, bool),
                           jnp.int32(-1))
            ),
            "rep_len": jnp.int32(1),
            "terminated": jnp.bool_(False),
        }

    def _repetitions(self, st, h):
        valid = jnp.arange(_REP_HIST) < st["rep_len"]
        return jnp.sum((st["rep_hash"] == h) & valid)

    def _obs(self, st):
        """AlphaZero planes [8, 8, 119], always current-player frame."""
        planes = []
        for t in range(_HIST):
            b = st["hist"][t]
            for p in range(1, 7):
                planes.append((b == p).astype(jnp.float32))
            for p in range(1, 7):
                planes.append((b == -p).astype(jnp.float32))
            h = board_hash(
                b, st["castling"], st["opp_castling"],
                jnp.where(t == 0, st["ep"], -1),
            )
            reps = self._repetitions(st, h)
            planes.append(
                jnp.full(64, (reps >= 2).astype(jnp.float32))
            )
            planes.append(
                jnp.full(64, (reps >= 3).astype(jnp.float32))
            )
        planes.append(jnp.full(64, st["turn"].astype(jnp.float32)))
        planes.append(jnp.full(64, st["fullmove"].astype(jnp.float32)))
        planes.append(jnp.full(64, st["castling"][0].astype(jnp.float32)))
        planes.append(jnp.full(64, st["castling"][1].astype(jnp.float32)))
        planes.append(
            jnp.full(64, st["opp_castling"][0].astype(jnp.float32))
        )
        planes.append(
            jnp.full(64, st["opp_castling"][1].astype(jnp.float32))
        )
        planes.append(jnp.full(64, st["halfmove"].astype(jnp.float32)))
        obs = jnp.stack(planes, axis=-1).reshape(8, 8, 119)
        if self.max_num_players > 1:
            obs = jnp.stack([obs, obs])
        return obs

    def _obs_dict(self, st, mask):
        player = st["shuffled"][st["turn"] % 2]
        return {
            "obs": self._obs(st),
            "info:board": st["board"].astype(jnp.int32).reshape(8, 8),
            "info:castling_rights": jnp.stack(
                [st["castling"], st["opp_castling"]]
            ),
            "info:current_player": player,
            "info:en_passant": st["ep"],
            "info:fullmove_count": st["fullmove"],
            "info:halfmove_count": st["halfmove"],
            "info:legal_action_mask": mask,
            "info:turn": st["turn"] % 2,
        }

    def reset_env(self, key):
        st = self._initial_state(key)
        mask = legal_action_mask(st["board"], st["castling"], st["ep"])
        return st, self._obs_dict(st, mask)

    def _insufficient_material(self, board):
        """K vs K, K+N vs K, K+B vs K (piece-count test)."""
        n_my = jnp.sum((board > 0) & (board != K))
        n_opp = jnp.sum((board < 0) & (board != -K))
        only_minor_my = (n_my == 1) & (
            jnp.sum((board == N) | (board == B)) == 1
        )
        only_minor_opp = (n_opp == 1) & (
            jnp.sum((board == -N) | (board == -B)) == 1
        )
        bare = (n_my == 0) & (n_opp == 0)
        one_minor = ((n_my == 0) & only_minor_opp) | (
            (n_opp == 0) & only_minor_my
        )
        return bare | one_minor

    def step_env(self, state, action, key):
        if self.max_num_players > 1:
            action = jnp.reshape(action, (-1,))[0]
        action = jnp.clip(
            jnp.reshape(action, ()).astype(jnp.int32), 0, NUM_ACTIONS - 1
        )
        st = dict(state)
        mover = st["shuffled"][st["turn"] % 2]
        mask = legal_action_mask(st["board"], st["castling"], st["ep"])
        illegal = ~mask[action]

        board, my_c, opp_c, new_ep, zero_clock = apply_action(
            st["board"], st["castling"], st["opp_castling"], st["ep"],
            action,
        )
        # Flip into the opponent's frame.
        next_board = flip(board)
        next_castling = opp_c
        next_opp_castling = my_c
        next_ep = flip_sq(new_ep)
        halfmove = jnp.where(zero_clock, 0, st["halfmove"] + 1)
        fullmove = st["fullmove"] + (st["turn"] % 2)
        turn = st["turn"] + 1

        h = board_hash(next_board, next_castling, next_opp_castling, next_ep)
        rep_len = jnp.where(
            zero_clock, 0, jnp.minimum(st["rep_len"], _REP_HIST - 1)
        )
        rep_hash = jnp.where(
            zero_clock,
            jnp.zeros(_REP_HIST, jnp.uint32),
            st["rep_hash"],
        )
        rep_hash = jnp.roll(rep_hash, 1).at[0].set(h)
        rep_len = rep_len + 1

        hist = jnp.concatenate(
            [next_board[None], st["hist"][:-1]], axis=0
        )
        st2 = {
            "board": next_board,
            "castling": next_castling,
            "opp_castling": next_opp_castling,
            "ep": next_ep,
            "turn": turn,
            "halfmove": halfmove,
            "fullmove": fullmove,
            "ply": st["ply"] + 1,
            "shuffled": st["shuffled"],
            "hist": hist,
            "rep_hash": rep_hash,
            "rep_len": rep_len,
            "terminated": st["terminated"],
        }

        next_mask = legal_action_mask(
            st2["board"], st2["castling"], st2["ep"]
        )
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

        # Rewards in player-id order.
        winner = mover  # the player who just moved wins on checkmate
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
        # Open the mask at terminal states (pgx convention: all ones).
        next_mask = jnp.where(done, jnp.ones_like(next_mask), next_mask)
        reward = rewards if self.max_num_players > 1 else rewards[mover]
        return EnvOut(
            state=st2,
            obs=self._obs_dict(st2, next_mask),
            reward=reward,
            terminated=done,
        )
