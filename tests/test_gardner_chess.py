"""GardnerChess (5x5) correctness vs an independent brute-force oracle.

No public perft tables are bundled for Gardner minichess, so the JAX
move generator is cross-checked against a deliberately independent
plain-Python generator (pseudo-legal + make/check-king-safety), depth 3
from the start position plus tactical spot positions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.envs.board import gardner_chess as G
from envpool_tpu.envs.board.chess import P, N, B, R, Q, K

_mask = jax.jit(G.legal_action_mask)
_apply = jax.jit(G.apply_action)

_DIRS = {
    R: [(1, 0), (-1, 0), (0, 1), (0, -1)],
    B: [(1, 1), (1, -1), (-1, 1), (-1, -1)],
}
_DIRS[Q] = _DIRS[R] + _DIRS[B]
_DIRS[K] = _DIRS[Q]
_KN = [(2, 1), (1, 2), (-1, 2), (-2, 1), (-2, -1), (-1, -2), (1, -2), (2, -1)]


def _brute_moves(board):
    """Independent generator: list of (frm, to, promo) legal moves."""
    board = np.asarray(board).reshape(5, 5)

    def attacked(bd, r, c):
        # Any enemy piece attacking (r, c)?
        for dr, dc in _KN:
            rr, cc = r + dr, c + dc
            if 0 <= rr < 5 and 0 <= cc < 5 and bd[rr, cc] == -N:
                return True
        for dc in (-1, 1):
            rr, cc = r + 1, c + dc
            if 0 <= rr < 5 and 0 <= cc < 5 and bd[rr, cc] == -P:
                return True
        for piece, dirs in ((R, _DIRS[R]), (B, _DIRS[B])):
            for dr, dc in dirs:
                rr, cc = r + dr, c + dc
                dist = 1
                while 0 <= rr < 5 and 0 <= cc < 5:
                    v = bd[rr, cc]
                    if v != 0:
                        if v == -piece or v == -Q or (v == -K and dist == 1):
                            return True
                        break
                    rr, cc, dist = rr + dr, cc + dc, dist + 1
        # King adjacency (also covered above for slider dirs at dist 1
        # only when v == -K; pawns/knights handled).
        return False

    moves = []
    for r in range(5):
        for c in range(5):
            pc = board[r, c]
            if pc <= 0:
                continue
            cand = []
            if pc == P:
                if r + 1 < 5 and board[r + 1, c] == 0:
                    cand.append((r + 1, c))
                for dc in (-1, 1):
                    rr, cc = r + 1, c + dc
                    if 0 <= cc < 5 and rr < 5 and board[rr, cc] < 0:
                        cand.append((rr, cc))
            elif pc == N:
                for dr, dc in _KN:
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < 5 and 0 <= cc < 5 and board[rr, cc] <= 0:
                        cand.append((rr, cc))
            elif pc == K:
                for dr, dc in _DIRS[K]:
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < 5 and 0 <= cc < 5 and board[rr, cc] <= 0:
                        cand.append((rr, cc))
            else:
                for dr, dc in _DIRS[pc]:
                    rr, cc = r + dr, c + dc
                    while 0 <= rr < 5 and 0 <= cc < 5:
                        if board[rr, cc] <= 0:
                            cand.append((rr, cc))
                        if board[rr, cc] != 0:
                            break
                        rr, cc = rr + dr, cc + dc
            for rr, cc in cand:
                b2 = board.copy()
                b2[r, c] = 0
                promo = pc == P and rr == 4
                b2[rr, cc] = Q if promo else pc
                kr, kc = np.argwhere(b2 == K)[0]
                if not attacked(b2, kr, kc):
                    promos = [N, B, R, Q] if promo else [0]
                    for pr in promos:
                        moves.append((r * 5 + c, rr * 5 + cc, pr))
    return moves


def _jax_moves(board):
    mask = np.asarray(_mask(board))
    out = []
    for a in np.flatnonzero(mask):
        f, pl = divmod(int(a), 49)
        t = int(G._TO_SQ[f, pl])
        promo = 0
        if G._IS_UNDER_PLANE[pl]:
            promo = int(G._UNDER_PIECE[pl])
        elif np.asarray(board)[f] == P and t // 5 == 4:
            promo = Q
        out.append((f, t, promo))
    return out


def _perft_both(board, depth):
    jm = sorted(_jax_moves(board))
    bm = sorted(_brute_moves(board))
    assert jm == bm, (
        f"move list mismatch:\n jax-only: {set(jm)-set(bm)}\n "
        f"brute-only: {set(bm)-set(jm)}\n board:\n"
        f"{np.asarray(board).reshape(5,5)[::-1]}"
    )
    if depth == 1:
        return len(jm)
    total = 0
    mask = np.asarray(_mask(board))
    for a in np.flatnonzero(mask):
        b2, _ = _apply(board, jnp.int32(a))
        total += _perft_both(G.flip(b2), depth - 1)
    return total


def test_perft_crosscheck_depth3():
    b0 = jnp.asarray(G._INIT_BOARD)
    n1 = _perft_both(b0, 1)
    assert n1 == 7
    assert _perft_both(b0, 2) == 53
    _perft_both(b0, 3)  # full move-list equality at every node


def test_tactical_positions():
    # Pinned rook cannot move off the file; king must evade check.
    board = np.zeros(25, np.int8)
    board[2] = K            # Kc1
    board[7] = R            # Rc2 (pinned by the queen on c5)
    board[22] = -Q          # qc5
    board[20] = -K          # ka5
    b = jnp.asarray(board)
    _perft_both(b, 2)


def test_registry_and_pool():
    assert "GardnerChess-v1" in envpool_tpu.list_all_envs()
    env = envpool_tpu.make(
        "GardnerChess-v1", env_type="gymnasium", num_envs=2, seed=0,
        max_num_players=2,
    )
    obs, info = env.reset()
    assert obs.shape == (2, 2, 5, 5, 115)
    assert info["legal_action_mask"].shape == (2, 1225)
    assert info["legal_action_mask"].sum(axis=-1).tolist() == [7, 7]
    acts = np.zeros((2, 2), np.int32)
    for e in range(2):
        acts[e, :] = np.flatnonzero(info["legal_action_mask"][e])[0]
    obs, rew, term, trunc, info = env.step(acts)
    assert not term.any()


def test_random_games_end():
    env = G.GardnerChessEnv.from_config(
        num_envs=1, max_num_players=2, max_termination_steps=80
    )
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(0)
    ended = 0
    for seed in range(2):
        st, obs = env.reset_env(jax.random.PRNGKey(seed))
        for t in range(80):
            mask = np.asarray(_mask(st["board"]))
            a = int(rng.choice(np.flatnonzero(mask)))
            out = env.step_env(
                st, jnp.full((2,), a, jnp.int32), jax.random.fold_in(key, t)
            )
            st = out.state
            if bool(out.terminated):
                ended += 1
                # Zero-sum rewards.
                assert abs(float(np.asarray(out.reward).sum())) < 1e-6
                break
    assert ended >= 1
