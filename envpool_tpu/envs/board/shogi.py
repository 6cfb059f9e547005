"""Shogi — TPU-native masked-array implementation (pgx surface).

Behavioral reference: ``envpool/pgx/shogi.h`` (EnvPool's C++ port of pgx
shogi).  Surface parity: obs (9, 9, 119) bool, action space
2187 = 27 planes x 81 destinations — planes 0-9 board moves identified
by the *direction from the destination* to the mover (8 rays + 2 knight
offsets), planes 10-19 the same with promotion, planes 20-26 drops of
P/L/N/S/G/B/R; info board (piece ids)/hand (2, 7)/legal mask/turn;
rewards +-1 on checkmate (or illegal move), draw 0 on sennichite
(fourfold repetition) and the move cap.

Rules implemented in closed masked form: full piece movement incl.
promoted pieces, mandatory promotions, drops with nifu (two-pawn file),
last-rank drop restrictions, drop-pawn-mate (uchifuzume, via the
bounded escape/capture analysis — a pawn check can never be blocked),
analytic check/pin legality as in chess.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_N = 9
_NSQ = 81
NUM_ACTIONS = 27 * 81  # 2187

# Piece codes: base 1..8 = P L N S G B R K; promoted 9..14 = +P +L +N +S
# +B +R.  Opponent negative.
P, L, NK, S, G, B, R, K = 1, 2, 3, 4, 5, 6, 7, 8
PP, PL, PN, PS, PB, PR = 9, 10, 11, 12, 13, 14
_GOLD_LIKE = (G, PP, PL, PN, PS)
_PROMOTABLE = (P, L, NK, S, B, R)
_PROMOTE_TO = {P: PP, L: PL, NK: PN, S: PS, B: PB, R: PR}
_DEMOTE = {PP: P, PL: L, PN: NK, PS: S, PB: B, PR: R}
_HAND_ORDER = (P, L, NK, S, G, B, R)  # drop planes 20..26

# Ray directions 0-7 (dr, dc); 8, 9 = knight sources relative to the
# destination: the mover sits at to + offset, moving in the opposite
# direction.  dir d means "the mover is found from `to` along (dr, dc)".
_RAY = np.asarray(
    [(-1, 0), (-1, -1), (0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1)]
)
# Knight planes: mover at to + (-2, ±1) (it jumped forward 2, sideways 1).
_KNIGHT_SRC = np.asarray([(-2, -1), (-2, 1)])

# Movement capability: CAN[piece, plane_dir(0..9), dist(1..8)].
# plane_dir is the direction FROM the destination TO the source; the
# piece's motion is the opposite.  Steppers only at dist 1.
def _build_can():
    can = np.zeros((15, 10, 9), bool)

    def allow(piece, move_dr, move_dc, max_dist):
        # motion (move_dr, move_dc) ⇒ source sits along (-move_dr, -move_dc).
        for d in range(8):
            if (_RAY[d][0], _RAY[d][1]) == (-move_dr, -move_dc):
                for dist in range(1, max_dist + 1):
                    can[piece, d, dist] = True

    for piece, moves, slides in (
        (P, [(1, 0)], []),
        (L, [], [(1, 0)]),
        (S, [(1, 0), (1, 1), (1, -1), (-1, 1), (-1, -1)], []),
        (B, [], [(1, 1), (1, -1), (-1, 1), (-1, -1)]),
        (R, [], [(1, 0), (-1, 0), (0, 1), (0, -1)]),
        (K, [(1, 0), (1, 1), (1, -1), (0, 1), (0, -1), (-1, 0), (-1, 1),
             (-1, -1)], []),
        (PB, [(1, 0), (-1, 0), (0, 1), (0, -1)],
         [(1, 1), (1, -1), (-1, 1), (-1, -1)]),
        (PR, [(1, 1), (1, -1), (-1, 1), (-1, -1)],
         [(1, 0), (-1, 0), (0, 1), (0, -1)]),
    ):
        for mv in moves:
            allow(piece, mv[0], mv[1], 1)
        for sl in slides:
            allow(piece, sl[0], sl[1], 8)
    gold_moves = [(1, 0), (1, 1), (1, -1), (0, 1), (0, -1), (-1, 0)]
    for piece in _GOLD_LIKE:
        for mv in gold_moves:
            allow(piece, mv[0], mv[1], 1)
    # Knight: planes 8, 9 (dist index 1).
    can[NK, 8, 1] = True
    can[NK, 9, 1] = True
    return can


_CAN = _build_can()

_INIT = np.zeros(_NSQ, np.int8)
_INIT[0:9] = [L, NK, S, G, K, G, S, NK, L]
_INIT[10] = B
_INIT[16] = R
_INIT[18:27] = P
_INIT[54:63] = -P
_INIT[64] = -R
_INIT[70] = -B
_INIT[72:81] = [-L, -NK, -S, -G, -K, -G, -S, -NK, -L]

_REP_HIST = 64
_rng = np.random.default_rng(9999)
_HASH_PIECE = _rng.integers(1, 2**32, size=(29, _NSQ), dtype=np.uint32)
_HASH_HAND = _rng.integers(1, 2**32, size=(2, 7, 19), dtype=np.uint32)


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


def _slide(source, empty, dr, dc):
    att = jnp.zeros(_NSQ, bool)
    frontier = source
    for _ in range(_N - 1):
        frontier = _shift(frontier, dr, dc)
        att = att | frontier
        frontier = frontier & empty
    return att


def _attacked_by_them(board):
    """Squares attacked by the opponent (negative pieces, moving down)."""
    empty = board == 0
    att = jnp.zeros(_NSQ, bool)

    def has(*pieces):
        m = jnp.zeros(_NSQ, bool)
        for p in pieces:
            m = m | (board == -p)
        return m

    # Steppers: attack offsets in MY frame (their forward = -row).
    att = att | _shift(has(P), -1, 0)
    att = att | _shift(has(NK), -2, -1) | _shift(has(NK), -2, 1)
    sil = has(S)
    for dr, dc in ((-1, 0), (-1, -1), (-1, 1), (1, -1), (1, 1)):
        att = att | _shift(sil, dr, dc)
    gold = has(G, PP, PL, PN, PS)
    for dr, dc in ((-1, 0), (-1, -1), (-1, 1), (0, -1), (0, 1), (1, 0)):
        att = att | _shift(gold, dr, dc)
    kng = has(K)
    for dr, dc in (
        (-1, 0), (-1, -1), (-1, 1), (0, -1), (0, 1), (1, 0), (1, -1), (1, 1)
    ):
        att = att | _shift(kng, dr, dc)
    for dr, dc in ((-1, 0), (-1, -1), (-1, 1), (0, -1), (0, 1), (1, 0),
                   (1, -1), (1, 1)):
        pass
    # +B/+R king-step extras.
    for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        att = att | _shift(has(PB), dr, dc)
    for dr, dc in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
        att = att | _shift(has(PR), dr, dc)
    # Sliders.
    att = att | _slide(has(L), empty, -1, 0)
    bish = has(B, PB)
    for dr, dc in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
        att = att | _slide(bish, empty, dr, dc)
    rook = has(R, PR)
    for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        att = att | _slide(rook, empty, dr, dc)
    return att


def _checkers_and_pins(board, king_sq):
    """Analytic single-pass checkers/pins (as chess.py, shogi sliders)."""
    empty = board == 0
    king = jnp.zeros(_NSQ, bool).at[king_sq].set(True)
    checkers = jnp.zeros(_NSQ, bool)
    check_line = jnp.zeros(_NSQ, bool)
    pinned = jnp.zeros(_NSQ, bool)
    pin_line = jnp.zeros((_NSQ, _NSQ), bool)

    # Stepper checkers: reverse their attack offsets from the king.
    def add_step(pieces, offsets):
        nonlocal checkers
        m = jnp.zeros(_NSQ, bool)
        for p in pieces:
            m = m | (board == -p)
        for dr, dc in offsets:
            checkers = checkers | (_shift(king, -dr, -dc) & m)

    add_step((P,), ((-1, 0),))
    add_step((NK,), ((-2, -1), (-2, 1)))
    add_step((S,), ((-1, 0), (-1, -1), (-1, 1), (1, -1), (1, 1)))
    add_step(
        (G, PP, PL, PN, PS),
        ((-1, 0), (-1, -1), (-1, 1), (0, -1), (0, 1), (1, 0)),
    )
    add_step((PB,), ((-1, 0), (1, 0), (0, -1), (0, 1)))
    add_step((PR,), ((-1, -1), (-1, 1), (1, -1), (1, 1)))

    # Slider rays from the king.  Direction (dr, dc) walks AWAY from the
    # king; an enemy slider there checks if it attacks along -(dr, dc).
    ray_sliders = (
        ((1, 0), (L, R, PR)),      # above the king: lance/rook attack down
        ((-1, 0), (R, PR)),
        ((0, 1), (R, PR)),
        ((0, -1), (R, PR)),
        ((1, 1), (B, PB)),
        ((1, -1), (B, PB)),
        ((-1, 1), (B, PB)),
        ((-1, -1), (B, PB)),
    )
    for (dr, dc), pieces in ray_sliders:
        slider = jnp.zeros(_NSQ, bool)
        for p in pieces:
            slider = slider | (board == -p)
        frontier = king
        own_seen = jnp.zeros(_NSQ, bool)
        own_count = jnp.int32(0)
        line = jnp.zeros(_NSQ, bool)
        done = jnp.bool_(False)
        for _ in range(_N - 1):
            frontier = _shift(frontier, dr, dc)
            occ_own = frontier & (board > 0)
            occ_opp = frontier & (board < 0)
            hit = occ_opp & slider
            any_own = occ_own.any()
            any_opp = occ_opp.any()
            any_hit = hit.any()
            is_check = any_hit & (own_count == 0) & ~done
            checkers = checkers | jnp.where(is_check, hit, False)
            check_line = check_line | jnp.where(is_check, line, False)
            is_pin = any_hit & (own_count == 1) & ~done
            pinned = pinned | jnp.where(is_pin, own_seen, False)
            pl_d = jnp.where(is_pin, line | hit, jnp.zeros(_NSQ, bool))
            pin_line = jnp.where(
                is_pin,
                pin_line | (own_seen[:, None] & pl_d[None, :]),
                pin_line,
            )
            own_count = own_count + jnp.where(any_own & ~done, 1, 0)
            own_seen = jnp.where(
                any_own & ~done & (own_count == 1), occ_own, own_seen
            )
            line = line | jnp.where(~done, frontier & empty, False)
            done = done | (any_opp & ~any_hit) | any_hit | (own_count >= 2)
            frontier = frontier & (empty | occ_own)
    # check_line holds BLOCKING squares only; checkers capturable.
    return checkers, pinned, pin_line, check_line


def legal_action_mask(board, hand):
    """[2187] legality: planes [27, 81] flattened as plane * 81 + to."""
    empty = board == 0
    occ_own = board > 0

    king_sq = jnp.argmax(board == K)
    board_no_king = board.at[king_sq].set(0)
    attacked_xray = _attacked_by_them(board_no_king)
    attacked = _attacked_by_them(board)
    checkers, pinned, pin_line, check_line = _checkers_and_pins(
        board, king_sq
    )
    n_check = checkers.sum()
    in_check = n_check > 0
    double_check = n_check > 1

    to_idx = jnp.arange(_NSQ)
    to_row = to_idx // _N

    move_masks = []   # planes 0..9 (no promo)
    promo_masks = []  # planes 10..19
    can = jnp.asarray(_CAN)

    for d in range(10):
        if d < 8:
            dr, dc = int(_RAY[d][0]), int(_RAY[d][1])
            # Find the nearest piece along the ray from each destination.
            src_piece = jnp.zeros(_NSQ, jnp.int8)   # mover piece code
            src_sq = jnp.full(_NSQ, -1, jnp.int32)
            found = jnp.zeros(_NSQ, bool)
            frontier_piece = board
            frontier_sq = jnp.arange(_NSQ, dtype=jnp.int32)
            dist_arr = jnp.zeros(_NSQ, jnp.int32)
            for dist in range(1, _N):
                # board value at to + dist*(dr,dc):
                shifted = jnp.roll(
                    board.reshape(_N, _N), (-dr * dist, -dc * dist), (0, 1)
                ).reshape(_NSQ)
                valid = jnp.ones((_N, _N), bool)
                rsh, csh = -dr * dist, -dc * dist
                v = jnp.ones((_N, _N), bool)
                if rsh > 0:
                    v = v.at[:rsh, :].set(False)
                elif rsh < 0:
                    v = v.at[rsh:, :].set(False)
                if csh > 0:
                    v = v.at[:, :csh].set(False)
                elif csh < 0:
                    v = v.at[:, csh:].set(False)
                v = v.reshape(_NSQ)
                nonzero = (shifted != 0) & v
                newly = nonzero & ~found
                src_piece = jnp.where(newly, shifted, src_piece)
                sq_shift = to_idx + (dr * _N + dc) * dist
                src_sq = jnp.where(newly, sq_shift, src_sq)
                dist_arr = jnp.where(newly, dist, dist_arr)
                found = found | nonzero
            mover_own = src_piece > 0
            pc = jnp.clip(src_piece, 0, 14).astype(jnp.int32)
            can_move = can[pc, d, jnp.clip(dist_arr, 0, 8)]
            ok = mover_own & can_move & ~occ_own[to_idx]
        else:
            dr, dc = int(_KNIGHT_SRC[d - 8][0]), int(_KNIGHT_SRC[d - 8][1])
            shifted = jnp.roll(
                board.reshape(_N, _N), (-dr, -dc), (0, 1)
            ).reshape(_NSQ)
            v = jnp.ones((_N, _N), bool)
            if -dr > 0:
                v = v.at[: -dr, :].set(False)
            elif -dr < 0:
                v = v.at[-dr:, :].set(False)
            if -dc > 0:
                v = v.at[:, : -dc].set(False)
            elif -dc < 0:
                v = v.at[:, -dc:].set(False)
            v = v.reshape(_NSQ)
            valid_src = (shifted == NK) & v
            src_sq = to_idx + dr * _N + dc
            ok = valid_src & ~occ_own[to_idx]
            pc = jnp.full(_NSQ, NK, jnp.int32)
            src_sq = jnp.where(ok, src_sq, -1)
        src_c = jnp.clip(src_sq, 0, _NSQ - 1)

        # King safety.
        is_king = pc == K
        ok = ok & jnp.where(is_king, ~attacked_xray[to_idx], True)
        # Check evasion.
        evade = check_line[to_idx] | checkers[to_idx]
        ok = ok & jnp.where(in_check & ~is_king, evade, True)
        ok = ok & jnp.where(double_check, is_king, True)
        # Pins.
        ok = ok & jnp.where(
            pinned[src_c], pin_line[src_c, to_idx], True
        )

        src_row = src_c // _N
        in_zone = (to_row >= 6) | (src_row >= 6)
        promotable = (
            (pc == P) | (pc == L) | (pc == NK) | (pc == S) | (pc == B)
            | (pc == R)
        )
        promo_ok = ok & promotable & in_zone
        # Mandatory promotion: P/L cannot stay on the last rank, N on the
        # last two.
        dead = (
            ((pc == P) | (pc == L)) & (to_row == 8)
        ) | ((pc == NK) & (to_row >= 7))
        move_ok = ok & ~dead
        move_masks.append(move_ok)
        promo_masks.append(promo_ok)

    # Drops: planes 20..26.
    drop_masks = []
    pawn_files = jnp.zeros(_N, bool)
    my_pawns = (board == P).reshape(_N, _N)
    pawn_files = my_pawns.any(axis=0)  # per column
    # A drop while in check must block a single slider check (drops
    # cannot capture); otherwise never legal in check.
    drop_evade = jnp.where(in_check, check_line[to_idx], True)
    drop_evade = drop_evade & ~double_check
    for hi, piece in enumerate(_HAND_ORDER):
        have = hand[0, hi] > 0
        ok = empty & have & drop_evade
        if piece == P:
            nifu = pawn_files[to_idx % _N]
            ok = ok & ~nifu & (to_row < 8)
            # Uchifuzume: a pawn drop giving immediate checkmate is
            # illegal.  The only checking square is right below the
            # enemy king; test the bounded escape/capture analysis.
            opp_k = jnp.argmax(board == -K)
            check_sq = opp_k - _N  # my pawn attacks upward
            gives_check = (check_sq >= 0) & empty[jnp.clip(check_sq, 0, 80)]
            # After the hypothetical drop, can the opponent respond?
            b2 = board.at[jnp.clip(check_sq, 0, 80)].set(P)
            fb = flip(b2)
            fk = jnp.argmax(fb == K)
            f_att = _attacked_by_them(fb.at[fk].set(0))
            # King escape: any adjacent square not own-occupied and not
            # attacked.
            kingm = jnp.zeros(_NSQ, bool).at[fk].set(True)
            esc = jnp.zeros((), bool)
            for dr, dc in (
                (1, 0), (1, 1), (1, -1), (0, 1), (0, -1), (-1, 0),
                (-1, 1), (-1, -1),
            ):
                sqs = _shift(kingm, dr, dc)
                esc = esc | (sqs & (fb <= 0) & ~f_att).any()
            # Capture the pawn: in the flipped frame the pawn sits just
            # above their king; any of their pieces attacking that square
            # (and not pinned off it) can take; the king takes if the
            # square is undefended.
            pawn_sq_f = fk + _N
            fchk, fpin, fpinline, _ = _checkers_and_pins(fb, fk)
            # Squares of their pieces attacking pawn_sq_f: recompute
            # attacks of THEIR pieces = attacked-by-them on flip(fb)...
            # cheaper: their non-king piece attacks pawn square iff in
            # the original frame my pawn's square is attacked by them
            # ignoring their king.
            fb_no_king = fb.at[fk].set(0)
            their_att_on_pawn = _attacked_by_us_square(
                fb_no_king, jnp.clip(pawn_sq_f, 0, 80), fpin, fpinline
            )
            king_can_take = ~f_att[jnp.clip(pawn_sq_f, 0, 80)]
            mate = gives_check & ~esc & ~their_att_on_pawn & ~king_can_take
            ok = ok & ~(
                (to_idx == jnp.clip(check_sq, 0, 80)) & mate & gives_check
            )
        elif piece == L:
            ok = ok & (to_row < 8)
        elif piece == NK:
            ok = ok & (to_row < 7)
        drop_masks.append(ok)

    mask = jnp.concatenate(
        move_masks + promo_masks + drop_masks
    )  # [27 * 81] plane-major
    return mask


def _attacked_by_us_square(board, sq, pinned, pin_line):
    """Can any positive piece legally capture on `sq` (pins honored)?

    Used only by the uchifuzume test; 'legally' = geometric attack and,
    if pinned, sq on the pin line.
    """
    target = jnp.zeros(_NSQ, bool).at[sq].set(True)
    empty = board == 0
    attackers = jnp.zeros(_NSQ, bool)

    def add(pieces, offsets):
        nonlocal attackers
        m = jnp.zeros(_NSQ, bool)
        for p in pieces:
            m = m | (board == p)
        for dr, dc in offsets:
            # a piece at sq - (dr, dc)... shift target by reverse offset.
            attackers_here = _shift(target, -dr, -dc) & m
            attackers = attackers | attackers_here

    add((P,), ((1, 0),))
    add((NK,), ((2, -1), (2, 1)))
    add((S,), ((1, 0), (1, -1), (1, 1), (-1, -1), (-1, 1)))
    add((G, PP, PL, PN, PS), ((1, 0), (1, -1), (1, 1), (0, -1), (0, 1),
                              (-1, 0)))
    add((PB,), ((1, 0), (-1, 0), (0, -1), (0, 1)))
    add((PR,), ((1, -1), (1, 1), (-1, -1), (-1, 1)))
    # Sliders toward sq.
    for (dr, dc), pieces in (
        ((-1, 0), (L, R, PR)),
        ((1, 0), (R, PR)),
        ((0, 1), (R, PR)),
        ((0, -1), (R, PR)),
        ((1, 1), (B, PB)),
        ((1, -1), (B, PB)),
        ((-1, 1), (B, PB)),
        ((-1, -1), (B, PB)),
    ):
        m = jnp.zeros(_NSQ, bool)
        for p in pieces:
            m = m | (board == p)
        ray = _slide(target, empty, -dr, -dc)
        attackers = attackers | (ray & m)
    legal = attackers & (~pinned | pin_line[:, sq])
    return legal.any()


def apply_action(board, hand, action):
    """→ (board', my hand', was_drop).  hand [2,7] (mine, theirs)."""
    plane = action // _NSQ
    to = action % _NSQ
    is_drop = plane >= 20
    promo = (plane >= 10) & (plane < 20)
    d = jnp.where(is_drop, 0, plane % 10)

    # Resolve the source square for board moves (same nearest-piece scan).
    src = jnp.int32(-1)
    for dd in range(10):
        if dd < 8:
            dr, dc = int(_RAY[dd][0]), int(_RAY[dd][1])
            found = jnp.bool_(False)
            s = jnp.int32(-1)
            r0, c0 = to // _N, to % _N
            for dist in range(1, _N):
                rr = r0 + dr * dist
                cc = c0 + dc * dist
                inb = (rr >= 0) & (rr < _N) & (cc >= 0) & (cc < _N)
                sq = jnp.clip(rr * _N + cc, 0, _NSQ - 1)
                nonzero = inb & (board[sq] != 0)
                s = jnp.where(nonzero & ~found, sq, s)
                found = found | nonzero
        else:
            dr, dc = int(_KNIGHT_SRC[dd - 8][0]), int(_KNIGHT_SRC[dd - 8][1])
            rr = to // _N + dr
            cc = to % _N + dc
            inb = (rr >= 0) & (rr < _N) & (cc >= 0) & (cc < _N)
            s = jnp.where(inb, jnp.clip(rr * _N + cc, 0, _NSQ - 1), -1)
        src = jnp.where(d == dd, s, src)
    src_c = jnp.clip(src, 0, _NSQ - 1)
    pc = board[src_c]

    captured = board[to]
    # Hand gain: demote captured piece to its base type.
    cap_abs = jnp.abs(captured).astype(jnp.int32)
    base = jnp.asarray(
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 1, 2, 3, 4, 6, 7], jnp.int32
    )[jnp.clip(cap_abs, 0, 14)]
    hand_idx = jnp.asarray([0, 0, 1, 2, 3, 4, 5, 6, 0], jnp.int32)[
        jnp.clip(base, 0, 8)
    ]
    gains = (captured != 0) & (base != K)
    new_hand0 = hand[0].at[hand_idx].add(
        jnp.where(gains & ~is_drop, 1, 0)
    )

    promoted = jnp.asarray(
        [0, PP, PL, PN, PS, 0, PB, PR, 0, 0, 0, 0, 0, 0, 0], jnp.int32
    )[jnp.clip(pc, 0, 14).astype(jnp.int32)]
    moved_piece = jnp.where(promo, promoted, pc.astype(jnp.int32))
    b = board.at[src_c].set(jnp.where(is_drop, board[src_c], 0))
    b = jnp.where(
        is_drop,
        board,
        b.at[to].set(moved_piece.astype(board.dtype)),
    )
    # Drop.
    drop_piece = jnp.asarray(_HAND_ORDER, jnp.int32)[
        jnp.clip(plane - 20, 0, 6)
    ]
    b = jnp.where(
        is_drop, board.at[to].set(drop_piece.astype(board.dtype)), b
    )
    new_hand0 = jnp.where(
        is_drop,
        hand[0].at[jnp.clip(plane - 20, 0, 6)].add(-1),
        new_hand0,
    )
    new_hand = jnp.stack([new_hand0, hand[1]])
    return b, new_hand, is_drop


def flip(board):
    """180° rotation + negate (shogi has no file symmetry to preserve:
    both players' camps are mirror-symmetric under full rotation)."""
    return (-board[::-1]).astype(board.dtype)


def board_hash(board, hand):
    hp = jnp.asarray(_HASH_PIECE)
    idx = (board.astype(jnp.int32) + 14).astype(jnp.int32)
    vals = hp[idx, jnp.arange(_NSQ)]
    h = jax.lax.reduce(vals, np.uint32(0), jax.lax.bitwise_xor, (0,))
    hh = jnp.asarray(_HASH_HAND)
    for p in range(2):
        for t in range(7):
            h = h ^ hh[p, t, jnp.clip(hand[p, t], 0, 18)]
    return h


class ShogiEnv(TpuEnv):
    """Shogi-v1 (pgx surface)."""

    DEFAULT_CONFIG = {"max_termination_steps": 512}

    def state_spec(self):
        return {
            "obs": ArraySpec(jnp.bool_, (-1, _N, _N, 119)),
            "info:board": ArraySpec(jnp.int32, (_N, _N), -1, 27),
            "info:current_player": ArraySpec(jnp.int32, (), 0, 1),
            "info:hand": ArraySpec(jnp.int32, (2, 7)),
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

    def _obs(self, st):
        """(9, 9, 119): 28 piece planes + 56 my-hand + 35 opp-hand."""
        planes = []
        b = st["board"]
        for p in range(1, 15):
            planes.append(b == p)
        for p in range(1, 15):
            planes.append(b == -p)
        for t in range(7):
            for level in range(8):
                planes.append(
                    jnp.full(_NSQ, st["hand"][0, t] > level)
                )
        for t in range(7):
            for level in range(5):
                planes.append(
                    jnp.full(_NSQ, st["hand"][1, t] > level)
                )
        obs = jnp.stack(planes, axis=-1).reshape(_N, _N, 119)
        if self.max_num_players > 1:
            obs = jnp.stack([obs, obs])
        return obs

    def _obs_dict(self, st, mask):
        player = st["shuffled"][st["turn"] % 2]
        return {
            "obs": self._obs(st),
            "info:board": st["board"].astype(jnp.int32).reshape(_N, _N),
            "info:current_player": player,
            "info:hand": st["hand"],
            "info:legal_action_mask": mask,
            "info:turn": st["turn"] % 2,
        }

    def _initial_state(self, key):
        shuffled = jax.random.permutation(key, 2).astype(jnp.int32)
        board = jnp.asarray(_INIT)
        hand = jnp.zeros((2, 7), jnp.int32)
        return {
            "board": board,
            "hand": hand,
            "turn": jnp.int32(0),
            "ply": jnp.int32(0),
            "shuffled": shuffled,
            "rep_hash": jnp.zeros(_REP_HIST, jnp.uint32).at[0].set(
                board_hash(board, hand)
            ),
            "rep_len": jnp.int32(1),
        }

    def reset_env(self, key):
        st = self._initial_state(key)
        mask = legal_action_mask(st["board"], st["hand"])
        return st, self._obs_dict(st, mask)

    def step_env(self, state, action, key):
        if self.max_num_players > 1:
            action = jnp.reshape(action, (-1,))[0]
        action = jnp.clip(
            jnp.reshape(action, ()).astype(jnp.int32), 0, NUM_ACTIONS - 1
        )
        st = dict(state)
        mover = st["shuffled"][st["turn"] % 2]
        mask = legal_action_mask(st["board"], st["hand"])
        illegal = ~mask[action]

        board, hand, _ = apply_action(st["board"], st["hand"], action)
        next_board = flip(board)
        next_hand = jnp.stack([hand[1], hand[0]])
        turn = st["turn"] + 1
        h = board_hash(next_board, next_hand)
        rep_hash = jnp.roll(st["rep_hash"], 1).at[0].set(h)
        rep_len = jnp.minimum(st["rep_len"] + 1, _REP_HIST)
        st2 = {
            "board": next_board,
            "hand": next_hand,
            "turn": turn,
            "ply": st["ply"] + 1,
            "shuffled": st["shuffled"],
            "rep_hash": rep_hash,
            "rep_len": rep_len,
        }
        next_mask = legal_action_mask(st2["board"], st2["hand"])
        no_moves = ~next_mask.any()
        # In shogi no legal move = loss (checkmate or stalemate both
        # lose for the side to move).
        mate = no_moves
        valid = jnp.arange(_REP_HIST) < rep_len
        reps = jnp.sum((rep_hash == h) & valid)
        draw = (reps >= 4) | (
            st2["ply"] >= int(self.config["max_termination_steps"])
        )
        done = mate | draw | illegal
        winner = mover
        loser = st2["shuffled"][st2["turn"] % 2]
        rewards = jnp.zeros(2, jnp.float32)
        rewards = jnp.where(
            mate,
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
