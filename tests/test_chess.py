"""Chess correctness: perft counts on classic positions + game endings.

Perft node counts are the standard public oracle for move-generator
correctness (initial position, Kiwipete, and endgame positions 3-5 from
the chessprogramming wiki).  The pip ``pgx`` oracle is not installable;
perft pins the rules far harder than random-playout comparison would.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.envs.board import chess as C

_PIECES = {"p": C.P, "n": C.N, "b": C.B, "r": C.R, "q": C.Q, "k": C.K}


def fen_board(fen):
    """FEN → (board-from-mover's-frame, castling, opp_castling, ep)."""
    fields = fen.split()
    rows = fields[0].split("/")
    board = np.zeros(64, np.int8)
    for r8, row in enumerate(rows):  # row 0 of FEN = rank 8
        c = 0
        for ch in row:
            if ch.isdigit():
                c += int(ch)
            else:
                sq = (7 - r8) * 8 + c
                sign = 1 if ch.isupper() else -1
                board[sq] = sign * _PIECES[ch.lower()]
                c += 1
    white_to_move = fields[1] == "w"
    cast = fields[2]
    w_ks, w_qs = "K" in cast, "Q" in cast
    b_ks, b_qs = "k" in cast, "q" in cast
    ep = -1
    if fields[3] != "-":
        file = ord(fields[3][0]) - ord("a")
        rank = int(fields[3][1]) - 1
        ep = rank * 8 + file
    if white_to_move:
        return (
            jnp.asarray(board),
            jnp.asarray([w_ks, w_qs]),
            jnp.asarray([b_ks, b_qs]),
            jnp.int32(ep),
        )
    flipped = np.asarray(C.flip(jnp.asarray(board)))
    ep_f = ep ^ 56 if ep >= 0 else -1
    return (
        jnp.asarray(flipped),
        jnp.asarray([b_ks, b_qs]),
        jnp.asarray([w_ks, w_qs]),
        jnp.int32(ep_f),
    )


_mask_jit = jax.jit(C.legal_action_mask)
_apply_jit = jax.jit(C.apply_action)


def perft(board, castling, opp_castling, ep, depth):
    mask = np.asarray(_mask_jit(board, castling, ep))
    acts = np.flatnonzero(mask)
    if depth == 1:
        return len(acts)
    total = 0
    for a in acts:
        b2, my_c, opp_c, new_ep, _ = _apply_jit(
            board, castling, opp_castling, ep, jnp.int32(a)
        )
        nb = C.flip(b2)
        total += perft(
            nb, opp_c, my_c,
            jnp.int32(int(new_ep) ^ 56) if int(new_ep) >= 0 else jnp.int32(-1),
            depth - 1,
        )
    return total


START = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0 1"
KIWIPETE = (
    "r3k2r/p1ppqpb1/bn2pnp1/3PN3/1p2P3/2N2Q1p/PPPBBPPP/R3K2R w KQkq - 0 1"
)
POS3 = "8/2p5/3p4/KP5r/1R3p1k/8/4P1P1/8 w - - 0 1"
POS4 = (
    "r3k2r/Pppp1ppp/1b3nbN/nP6/BBP1P3/q4N2/Pp1P2PP/R2Q1RK1 w kq - 0 1"
)
POS5 = "rnbq1k1r/pp1Pbppp/2p5/8/2B5/8/PPP1NnPP/RNBQK2R w KQ - 1 8"


@pytest.mark.parametrize(
    "fen,depth,expect",
    [
        (START, 1, 20),
        (START, 2, 400),
        (START, 3, 8902),
        (KIWIPETE, 1, 48),
        (KIWIPETE, 2, 2039),
        (POS3, 1, 14),
        (POS3, 2, 191),
        (POS4, 1, 6),
        (POS5, 1, 44),
    ],
)
def test_perft(fen, depth, expect):
    b, c, oc, ep = fen_board(fen)
    assert perft(b, c, oc, ep, depth) == expect


def _find_action(board, castling, ep, frm, to):
    """Action id for a from→to move (queen/knight planes)."""
    mask = np.asarray(_mask_jit(board, castling, ep))
    for a in np.flatnonzero(mask):
        f, pl = divmod(int(a), 73)
        if f == frm and int(C._TO_SQ[f, pl]) == to:
            return int(a)
    raise AssertionError(f"move {frm}->{to} not legal")


def _sq(name):
    return (int(name[1]) - 1) * 8 + (ord(name[0]) - ord("a"))


def test_fools_mate_checkmate():
    env = C.ChessEnv.from_config(num_envs=1, max_num_players=2)
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    # 1. f3 e5 2. g4 Qh4#  (all moves entered in the mover's frame).
    moves = [
        (_sq("f2"), _sq("f3")),
        (_sq("e2"), _sq("e3")),   # black e7e5 → mover frame e2e3... see below
    ]
    # In the mover's frame every move looks like a white move; black's
    # e7-e5 is entered as the flipped squares of d2-d4's mirror: e7→e5
    # maps to (63-sq) in the flipped frame.
    def play(st, frm, to):
        a = _find_action(st["board"], st["castling"], st["ep"], frm, to)
        out = env.step_env(
            st, jnp.full((2,), a, jnp.int32), jax.random.PRNGKey(1)
        )
        return out

    out = play(st, _sq("f2"), _sq("f3"))          # white f3
    st = out.state
    out = play(st, _sq("e7") ^ 56, _sq("e5") ^ 56)  # black e5 (flipped)
    st = out.state
    out = play(st, _sq("g2"), _sq("g4"))          # white g4
    st = out.state
    out = play(st, _sq("d8") ^ 56, _sq("h4") ^ 56)  # black Qh4#
    assert bool(out.terminated), "fool's mate not detected"
    rewards = np.asarray(out.reward)
    # The mover (black) wins.
    mover = int(np.asarray(st["shuffled"])[int(st["turn"]) % 2])
    assert rewards[mover] == 1.0
    assert rewards[1 - mover] == -1.0


def test_stalemate_draw():
    # Classic stalemate: black king a8, white queen c7, white king c6,
    # black to move → stalemate.
    fen = "k7/2Q5/2K5/8/8/8/8/8 b - - 0 1"
    b, c, oc, ep = fen_board(fen)
    mask = np.asarray(_mask_jit(b, c, ep))
    assert mask.sum() == 0
    king_sq = int(np.argmax(np.asarray(b) == C.K))
    attacked = np.asarray(C._attacked_by_them(b))
    assert not attacked[king_sq]  # not in check → stalemate, not mate


def test_checkmate_position():
    # Back-rank mate: black king h8, white rook a8, white king g6.
    fen = "R6k/8/6K1/8/8/8/8/8 b - - 0 1"
    b, c, oc, ep = fen_board(fen)
    mask = np.asarray(_mask_jit(b, c, ep))
    assert mask.sum() == 0
    king_sq = int(np.argmax(np.asarray(b) == C.K))
    attacked = np.asarray(C._attacked_by_them(b))
    assert attacked[king_sq]  # in check + no moves → checkmate


def test_en_passant_and_castling_in_perft():
    # Kiwipete already exercises both; sanity-check specific moves exist.
    b, c, oc, ep = fen_board(KIWIPETE)
    mask = np.asarray(_mask_jit(b, c, ep))
    # White can castle both sides: e1g1 and e1c1.
    a_ks = _find_action(b, c, ep, _sq("e1"), _sq("g1"))
    a_qs = _find_action(b, c, ep, _sq("e1"), _sq("c1"))
    assert mask[a_ks] and mask[a_qs]


def test_registry_and_pool():
    assert "Chess-v1" in envpool_tpu.list_all_envs()
    env = envpool_tpu.make(
        "Chess-v1", env_type="gymnasium", num_envs=2, seed=0,
        max_num_players=2,
    )
    obs, info = env.reset()
    assert obs.shape == (2, 2, 8, 8, 119)
    assert info["legal_action_mask"].shape == (2, 4672)
    assert info["legal_action_mask"].sum(axis=-1).tolist() == [20, 20]
    # Play a random legal move in each env.
    acts = np.zeros((2, 2), np.int32)
    for e in range(2):
        legal = np.flatnonzero(info["legal_action_mask"][e])
        acts[e, :] = legal[0]
    obs, rew, term, trunc, info = env.step(acts)
    assert not term.any()


def test_random_playouts_terminate():
    env = C.ChessEnv.from_config(num_envs=1, max_num_players=2,
                                 max_termination_steps=100)
    step = jax.jit(lambda s, a, k: env.step_env(s, a, k).state)
    # jit-unfriendly EnvOut: play eagerly on the mask path instead.
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(5)
    st, obs = env.reset_env(key)
    for t in range(100):
        mask = np.asarray(
            _mask_jit(st["board"], st["castling"], st["ep"])
        )
        legal = np.flatnonzero(mask)
        a = int(rng.choice(legal))
        out = env.step_env(
            st, jnp.full((2,), a, jnp.int32), jax.random.fold_in(key, t)
        )
        st = out.state
        if bool(out.terminated):
            break
    # Either the game ended or the 100-ply cap stops it at t=99.
    assert bool(out.terminated) or t == 99
