"""Animal shogi rules tests (hand-derived positions vs the reference
rules in ``envpool/pgx/animal_shogi.h``)."""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.envs.board.animal_shogi import (
    _INIT_BOARD, AnimalShogiEnv, _apply_moves, _legal_mask,
)


def _mask(board, hand=None):
    hand = jnp.zeros((2, 3), jnp.int32) if hand is None else \
        jnp.asarray(hand, jnp.int32)
    return np.asarray(_legal_mask(jnp.asarray(board, jnp.int32), hand))


def test_initial_legal_moves_exact():
    """Start position: pawn capture fwd, rook fwd, king diag-left/right.

    Derived by hand: own rook sq3, pawn sq6, king sq7, bishop sq11;
    bishop is fully blocked; labels = dir*12 + from."""
    mask = _mask(_INIT_BOARD)
    assert sorted(np.nonzero(mask)[0].tolist()) == [7, 39, 42, 67]


def test_pawn_promotes_to_gold():
    board = np.full(12, -1, np.int32)
    board[5] = 0   # own pawn at (1,1): moving to (1,0) promotes
    board[7] = 3   # own king
    board[0] = 8   # opp king (corner)
    b_after, _ = _apply_moves(jnp.asarray(board),
                              jnp.zeros((2, 3), jnp.int32))
    label = 3 * 12 + 5  # dir (0,-1) from sq5
    nb = np.asarray(b_after[label])
    assert nb[4] == 4  # gold on (1,0)
    assert nb[5] == -1


def test_capture_goes_to_hand_gold_demotes():
    board = np.full(12, -1, np.int32)
    board[5] = 2   # own rook at (1,1)
    board[4] = 9   # opponent GOLD at (1,0)
    board[7] = 3
    board[0] = 8
    _, h_after = _apply_moves(jnp.asarray(board),
                              jnp.zeros((2, 3), jnp.int32))
    label = 3 * 12 + 5
    nh = np.asarray(h_after[label])
    assert nh[0, 0] == 1  # gold demotes to pawn in hand
    assert nh[0, 1] == 0 and nh[0, 2] == 0


def test_drop_requires_hand_and_empty_square():
    board = np.full(12, -1, np.int32)
    board[7] = 3
    board[0] = 8
    hand = np.zeros((2, 3), np.int32)
    mask_nohand = _mask(board, hand)
    assert not mask_nohand[8 * 12: 11 * 12].any()
    hand[0, 0] = 1  # a pawn in hand
    mask = _mask(board, hand)
    drops = mask[8 * 12: 9 * 12]
    assert drops.sum() == 10  # every empty square (12 - king - opp king)
    assert not drops[7] and not drops[0]


def test_cannot_move_into_check():
    board = np.full(12, -1, np.int32)
    board[7] = 3   # own king (1,3)
    board[5] = 7   # opponent rook at (1,1): attacks (1,2) and (0,1)...
    board[0] = 8
    mask = _mask(board)
    # King stepping to (1,2)=sq6 (dir (0,-1) idx3, from 7) is illegal.
    assert not mask[3 * 12 + 7]
    # King stepping to (0,3)=sq3 (dir (-1,0) idx1) is legal.
    assert mask[1 * 12 + 7]


def test_try_rule_and_checkmate_end_games():
    env = envpool_tpu.make_gymnasium("AnimalShogi-v1", num_envs=4, seed=0)
    obs, info = env.reset()
    assert np.asarray(obs).shape == (4, 4, 3, 194)
    rng = np.random.default_rng(0)
    finished = 0
    for t in range(400):
        masks = np.asarray(info["legal_action_mask"])
        acts = np.asarray(
            [rng.choice(np.nonzero(masks[i])[0]) for i in range(4)],
            np.int32)
        obs, rew, term, trunc, info = env.step(acts)
        finished += int(np.asarray(term).sum())
        boards = np.asarray(info["board"]).reshape(4, -1)
        # Never more than one king per side on any board.
        assert ((boards == 3).sum(1) <= 1).all()
        assert ((boards == 8).sum(1) <= 1).all()
        if finished >= 4:
            break
    assert finished >= 4  # random games end quickly (checkmate/try)


def test_multiplayer_reward_rows():
    env = envpool_tpu.make_gymnasium(
        "AnimalShogi-v1", num_envs=2, seed=1, max_num_players=2)
    obs, info = env.reset()
    assert np.asarray(obs).shape == (2, 2, 4, 3, 194)
    rng = np.random.default_rng(2)
    for t in range(200):
        masks = np.asarray(info["legal_action_mask"])
        acts = np.stack([
            np.full(2, rng.choice(np.nonzero(masks[i])[0]))
            for i in range(2)]).astype(np.int32)
        obs, rew, term, trunc, info = env.step(acts)
        r = np.asarray(rew)
        assert r.shape == (2, 2)
        done = np.asarray(term)
        # zero-sum per game on terminal steps
        if done.any():
            assert np.allclose(r[done].sum(-1), 0.0)
            return
    raise AssertionError("no game finished")
