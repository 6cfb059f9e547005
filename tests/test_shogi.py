"""Shogi correctness vs an independent brute-force oracle.

The pip ``pgx`` oracle is not installable; as for GardnerChess, the JAX
program is validated against a deliberately independent plain-Python
generator (piece tables + make/check-king-safety simulation) on the
opening position, random playout positions, and rule spot checks
(nifu, mandatory promotion, drop restrictions, hand cycling).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.envs.board import shogi as S

_mask = jax.jit(S.legal_action_mask)
_apply = jax.jit(S.apply_action)

# Independent movement tables: (steps, slides) per piece code.
_STEPS = {
    S.P: [(1, 0)],
    S.NK: [(2, -1), (2, 1)],
    S.S: [(1, 0), (1, -1), (1, 1), (-1, -1), (-1, 1)],
    S.G: [(1, 0), (1, -1), (1, 1), (0, -1), (0, 1), (-1, 0)],
    S.K: [(1, 0), (1, -1), (1, 1), (0, -1), (0, 1), (-1, 0), (-1, -1),
          (-1, 1)],
    S.PB: [(1, 0), (-1, 0), (0, -1), (0, 1)],
    S.PR: [(1, -1), (1, 1), (-1, -1), (-1, 1)],
}
for _g in (S.PP, S.PL, S.PN, S.PS):
    _STEPS[_g] = _STEPS[S.G]
_SLIDES = {
    S.L: [(1, 0)],
    S.B: [(1, 1), (1, -1), (-1, 1), (-1, -1)],
    S.R: [(1, 0), (-1, 0), (0, 1), (0, -1)],
    S.PB: [(1, 1), (1, -1), (-1, 1), (-1, -1)],
    S.PR: [(1, 0), (-1, 0), (0, 1), (0, -1)],
}


def _attacked_brute(bd, r, c):
    """Is (r, c) attacked by any negative piece? (independent logic)"""
    for rr in range(9):
        for cc in range(9):
            v = bd[rr, cc]
            if v >= 0:
                continue
            p = -v
            for dr, dc in _STEPS.get(p, []):
                # Enemy moves downward: negate offsets.
                if (rr - dr, cc - dc) == (r, c):
                    return True
            for dr, dc in _SLIDES.get(p, []):
                tr, tc = rr - dr, cc - dc
                while 0 <= tr < 9 and 0 <= tc < 9:
                    if (tr, tc) == (r, c):
                        return True
                    if bd[tr, tc] != 0:
                        break
                    tr, tc = tr - dr, tc - dc
    return False


def _brute_moves(board, hand):
    """Independent legal move list [(plane, to)] incl. drops."""
    bd = np.asarray(board).reshape(9, 9)
    out = []

    def king_safe(b2):
        kr, kc = np.argwhere(b2 == S.K)[0]
        return not _attacked_brute(b2, kr, kc)

    for r in range(9):
        for c in range(9):
            pc = bd[r, c]
            if pc <= 0:
                continue
            dests = []
            for dr, dc in _STEPS.get(pc, []):
                rr, cc = r + dr, c + dc
                if 0 <= rr < 9 and 0 <= cc < 9 and bd[rr, cc] <= 0:
                    dests.append((rr, cc))
            for dr, dc in _SLIDES.get(pc, []):
                rr, cc = r + dr, c + dc
                while 0 <= rr < 9 and 0 <= cc < 9:
                    if bd[rr, cc] <= 0:
                        dests.append((rr, cc))
                    if bd[rr, cc] != 0:
                        break
                    rr, cc = rr + dr, cc + dc
            for rr, cc in dests:
                promo_opts = []
                can_promo = pc in S._PROMOTE_TO and (rr >= 6 or r >= 6)
                dead = (
                    (pc in (S.P, S.L) and rr == 8)
                    or (pc == S.NK and rr >= 7)
                )
                if not dead:
                    promo_opts.append(False)
                if can_promo:
                    promo_opts.append(True)
                for promo in promo_opts:
                    b2 = bd.copy()
                    b2[r, c] = 0
                    b2[rr, cc] = S._PROMOTE_TO[pc] if promo else pc
                    if not king_safe(b2):
                        continue
                    # Encode: direction from destination to source.
                    ddr, ddc = r - rr, c - cc
                    plane = None
                    if (ddr, ddc) in [tuple(x) for x in S._KNIGHT_SRC]:
                        if pc == S.NK:
                            plane = 8 + [tuple(x) for x in S._KNIGHT_SRC].index(
                                (ddr, ddc)
                            )
                    if plane is None:
                        # Normalize to a unit ray direction.
                        import math

                        g = max(abs(ddr), abs(ddc))
                        if g > 0 and (ddr % g == 0 and ddc % g == 0):
                            ur, uc = ddr // g, ddc // g
                            rays = [tuple(x) for x in S._RAY]
                            if (ur, uc) in rays:
                                plane = rays.index((ur, uc))
                    assert plane is not None, (r, c, rr, cc, pc)
                    out.append((plane + (10 if promo else 0), rr * 9 + cc))
    # Drops.
    hand = np.asarray(hand)
    in_check = not king_safe(bd)
    for hi, piece in enumerate(S._HAND_ORDER):
        if hand[0, hi] <= 0:
            continue
        for r in range(9):
            for c in range(9):
                if bd[r, c] != 0:
                    continue
                if piece in (S.P, S.L) and r == 8:
                    continue
                if piece == S.NK and r >= 7:
                    continue
                if piece == S.P and (bd[:, c] == S.P).any():
                    continue
                b2 = bd.copy()
                b2[r, c] = piece
                if not king_safe(b2):
                    continue
                if piece == S.P:
                    # Uchifuzume: pawn drop giving mate is illegal.
                    kr, kc = np.argwhere(b2 == -S.K)[0]
                    if (kr - 1, kc) == (r, c):
                        if _is_mate_for_opponent(b2):
                            continue
                out.append((20 + hi, r * 9 + c))
    return sorted(out)


def _is_mate_for_opponent(bd):
    """After my move, does the opponent have any legal reply? (board
    moves only are needed for pawn-check mates; a pawn check can also
    be answered by a drop? No — adjacent checks can't be blocked.)"""
    fb = np.asarray(S.flip(jnp.asarray(bd.reshape(81)))).reshape(9, 9)
    moves = _brute_board_moves_only(fb)
    return len(moves) == 0


def _brute_board_moves_only(bd):
    out = []

    def king_safe(b2):
        kr, kc = np.argwhere(b2 == S.K)[0]
        return not _attacked_brute(b2, kr, kc)

    for r in range(9):
        for c in range(9):
            pc = bd[r, c]
            if pc <= 0:
                continue
            dests = []
            for dr, dc in _STEPS.get(pc, []):
                rr, cc = r + dr, c + dc
                if 0 <= rr < 9 and 0 <= cc < 9 and bd[rr, cc] <= 0:
                    dests.append((rr, cc))
            for dr, dc in _SLIDES.get(pc, []):
                rr, cc = r + dr, c + dc
                while 0 <= rr < 9 and 0 <= cc < 9:
                    if bd[rr, cc] <= 0:
                        dests.append((rr, cc))
                    if bd[rr, cc] != 0:
                        break
                    rr, cc = rr + dr, cc + dc
            for rr, cc in dests:
                b2 = bd.copy()
                b2[r, c] = 0
                b2[rr, cc] = pc
                if king_safe(b2):
                    out.append((r * 9 + c, rr * 9 + cc))
    return out


def _jax_moves(board, hand):
    m = np.asarray(_mask(board, hand))
    return sorted(divmod(int(a), 81) for a in np.flatnonzero(m))


def test_opening_moves_crosscheck():
    b0 = jnp.asarray(S._INIT)
    h0 = jnp.zeros((2, 7), jnp.int32)
    jm = _jax_moves(b0, h0)
    bm = _brute_moves(b0, h0)
    assert jm == bm, (set(jm) - set(bm), set(bm) - set(jm))
    assert len(jm) == 30


def test_random_playout_crosscheck():
    """Play random legal moves; cross-check the full move list each ply."""
    rng = np.random.default_rng(0)
    board = jnp.asarray(S._INIT)
    hand = jnp.zeros((2, 7), jnp.int32)
    for ply in range(30):
        jm = _jax_moves(board, hand)
        bm = _brute_moves(board, hand)
        assert jm == bm, (
            f"ply {ply}:\n jax-only {set(jm)-set(bm)}\n "
            f"brute-only {set(bm)-set(jm)}\n"
            f"{np.asarray(board).reshape(9,9)[::-1]}\nhand {np.asarray(hand)}"
        )
        if not jm:
            break
        pl, to = jm[rng.integers(len(jm))]
        a = pl * 81 + to
        board, hand, _ = _apply(board, hand, jnp.int32(a))
        board = S.flip(board)
        hand = jnp.stack([hand[1], hand[0]])


def test_capture_goes_to_hand_and_drops_back():
    env = S.ShogiEnv.from_config(num_envs=1, max_num_players=2)
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    # Craft a capture: place my rook next to an enemy pawn.
    board = np.zeros(81, np.int8)
    board[4] = S.K
    board[76] = -S.K
    board[40] = S.R
    board[49] = -S.P  # directly above the rook
    st = dict(st)
    st["board"] = jnp.asarray(board)
    st["hand"] = jnp.zeros((2, 7), jnp.int32)
    # Rook takes the pawn: destination 49, mover found downward (ray
    # (-1,0) = plane 0... the mover is BELOW the destination: direction
    # from destination to source = (-1, 0) = plane 0).
    a = 0 * 81 + 49
    mask = np.asarray(_mask(st["board"], st["hand"]))
    assert mask[a]
    out = env.step_env(st, jnp.full((2,), a, jnp.int32), key)
    # After the flip the hand with the captured pawn belongs to [1].
    assert int(out.state["hand"][1, 0]) == 1
    # Opponent to move; then my turn again would allow the pawn drop.


def test_nifu_and_drop_restrictions():
    board = np.zeros(81, np.int8)
    board[4] = S.K
    board[76] = -S.K
    board[30] = S.P  # my pawn on file 3 (col 3)
    hand = np.zeros((2, 7), np.int32)
    hand[0, 0] = 1  # pawn in hand
    hand[0, 1] = 1  # lance
    hand[0, 2] = 1  # knight
    m = np.asarray(_mask(jnp.asarray(board), jnp.asarray(hand)))
    m = m.reshape(27, 81)
    # Pawn drops: nowhere on col 3 (nifu), nowhere on last rank.
    pawn_drops = np.flatnonzero(m[20])
    assert all(t % 9 != 3 for t in pawn_drops)
    assert all(t // 9 != 8 for t in pawn_drops)
    # Lance: not on last rank; knight: not on last two.
    assert all(t // 9 != 8 for t in np.flatnonzero(m[21]))
    assert all(t // 9 < 7 for t in np.flatnonzero(m[22]))


def test_mandatory_promotion():
    board = np.zeros(81, np.int8)
    board[4] = S.K
    board[76] = -S.K
    board[66] = S.P  # pawn on row 7 col 3: push to row 8 must promote
    m = np.asarray(_mask(jnp.asarray(board), jnp.zeros((2, 7), jnp.int32)))
    m = m.reshape(27, 81)
    to = 75  # row 8 col 3
    assert not m[0, to]   # non-promo push illegal
    assert m[10, to]      # promoting push legal


def test_registry_and_pool():
    assert "Shogi-v1" in envpool_tpu.list_all_envs()
    env = envpool_tpu.make(
        "Shogi-v1", env_type="gymnasium", num_envs=2, seed=0,
        max_num_players=2,
    )
    obs, info = env.reset()
    assert obs.shape == (2, 2, 9, 9, 119)
    assert info["legal_action_mask"].shape == (2, 2187)
    assert info["legal_action_mask"].sum(axis=-1).tolist() == [30, 30]
    acts = np.zeros((2, 2), np.int32)
    for e in range(2):
        acts[e, :] = np.flatnonzero(info["legal_action_mask"][e])[0]
    obs, rew, term, trunc, info = env.step(acts)
    assert not term.any()
