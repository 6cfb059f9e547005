"""Backgammon rules tests (vs hand-derived positions from the
reference rules, ``envpool/pgx/backgammon.h``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.envs.board.backgammon import (
    _INIT_BOARD, BackgammonEnv, _flip, _legal_mask, _move,
)


def _mask(board, dice=(True,) * 6):
    return np.asarray(_legal_mask(jnp.asarray(board, jnp.int32),
                                  jnp.asarray(dice)))


def test_initial_position_legality():
    mask = _mask(_INIT_BOARD)
    # From point 0 (src_code 2): die 5 -> point 5 (5 opp checkers) is
    # blocked; die 1..4, 6 are open (point 11 holds own checkers).
    m0 = mask[2 * 6: 3 * 6]
    assert list(m0) == [True, True, True, True, False, True]
    # Bar is empty: no bar moves legal, no pass rows.
    assert not mask[6:12].any()
    assert not mask[:6].any()


def test_bar_must_enter_first():
    board = np.asarray(_INIT_BOARD).copy()
    board[0] -= 1
    board[24] += 1  # one checker on the bar
    mask = _mask(board)
    # All legal moves must come from the bar (src_code 1 -> actions 6..11)
    legal = np.nonzero(mask)[0]
    assert len(legal) > 0
    assert all(6 <= a < 12 for a in legal)
    # Entering on die d lands on point d-1; point 5 (die 6) is blocked.
    assert not mask[6 + 5]


def test_bear_off_requires_all_home():
    board = np.zeros(28, np.int32)
    board[18] = 15  # all 15 on the 18-point: bearing off allowed
    mask = _mask(board)
    # src 18 -> src_code 20; die 6 bears off exactly (distance 6).
    assert mask[20 * 6 + 5]
    # die 3 -> target point 21 (open) is a normal move, legal too.
    assert mask[20 * 6 + 2]
    # Any checker outside home disables bear-off.
    board2 = board.copy()
    board2[18] -= 1
    board2[10] += 1
    mask2 = _mask(board2)
    assert not mask2[20 * 6 + 5]


def test_overshoot_bear_off_only_from_rearmost():
    board = np.zeros(28, np.int32)
    board[20] = 1    # rear distance 4
    board[22] = 1
    board[26] = 13
    mask = _mask(board)
    # die 6 overshoots: legal only from the rearmost point (20).
    assert mask[22 * 6 + 5]       # src 20 -> code 22
    assert not mask[24 * 6 + 5]   # src 22 -> code 24 not rearmost


def test_hit_sends_to_bar():
    board = np.zeros(28, np.int32)
    board[0] = 1
    board[3] = -1   # lone opponent blot
    board[26] = 14
    board[27] = -14
    new = np.asarray(_move(jnp.asarray(board, jnp.int32),
                           jnp.asarray(2 * 6 + 2)))  # 0 -> 3 with die 3
    assert new[0] == 0
    assert new[3] == 1
    assert new[25] == -1  # opponent on the bar


def test_flip_involution_and_perspective():
    f = _flip(jnp.asarray(_INIT_BOARD))
    assert (np.asarray(_flip(f)) == np.asarray(_INIT_BOARD)).all()
    # The start position is symmetric under flipping.
    assert (np.asarray(f) == np.asarray(_INIT_BOARD)).all()


def test_pass_only_when_stuck():
    board = np.zeros(28, np.int32)
    board[23] = 1            # own checker on the last point
    board[26] = 14
    board[0] = -15           # (opponent elsewhere)
    # Not all home?  23 is home; all home -> bear-off with die 1 legal.
    mask = _mask(board, dice=(True, False, False, False, False, False))
    assert mask[25 * 6 + 0]
    # Block every move: checker on bar, all entry points closed.
    board2 = np.zeros(28, np.int32)
    board2[24] = 1
    board2[26] = 14
    for i in range(6):
        board2[i] = -2
    board2[27] = -3
    mask2 = _mask(board2)
    assert mask2[:6].all()          # pass actions open up
    assert not mask2[6:].any()


def test_registry_selfplay_terminates():
    env = envpool_tpu.make_gymnasium("Backgammon-v1", num_envs=2, seed=1)
    obs, info = env.reset()
    assert np.asarray(obs).shape == (2, 34)
    rng = np.random.default_rng(0)
    saw_nonzero = False
    for t in range(300):
        masks = np.asarray(info["legal_action_mask"])
        acts = np.asarray([
            rng.choice(np.nonzero(masks[i])[0]) for i in range(2)
        ], np.int32)
        obs, rew, term, trunc, info = env.step(acts)
        saw_nonzero |= bool((np.abs(np.asarray(rew)) >= 1.0).any())
        # Checker conservation on every board.
        for b in np.asarray(info["board"]):
            pos = b[:24][b[:24] > 0].sum() + b[24] + b[26]
            neg = b[:24][b[:24] < 0].sum() + b[25] + b[27]
            assert pos == 15 and neg == -15
    assert saw_nonzero  # at least one game finished in 300 plies


def test_multiplayer_protocol_rows():
    """EnvPool per-player protocol: obs rows per player, reward [P]
    (reference spec: backgammon.h:151-168)."""
    env = envpool_tpu.make_gymnasium(
        "Backgammon-v1", num_envs=2, seed=3, max_num_players=2)
    obs, info = env.reset()
    arr = np.asarray(obs)
    assert arr.shape == (2, 2, 34)
    masks = np.asarray(info["legal_action_mask"])
    rng = np.random.default_rng(1)
    acts = np.stack([
        np.full(2, rng.choice(np.nonzero(masks[i])[0]))
        for i in range(2)
    ]).astype(np.int32)
    obs, rew, term, trunc, info = env.step(acts)
    assert np.asarray(rew).shape == (2, 2)
    # Only the current player sees its playable-dice counts.
    arr = np.asarray(obs)
    cp = np.asarray(info["current_player"])
    for i in range(2):
        other = 1 - cp[i]
        assert (arr[i, other, 28:] == 0).all()
