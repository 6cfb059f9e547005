"""Board-game family tests."""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.envs.board import Connect4Env, Game2048Env, TicTacToeEnv
from envpool_tpu.envs.board.game_2048 import _move, _slide_row_left


def test_2048_slide_and_merge() -> None:
    row, rew = _slide_row_left(jnp.asarray([1, 1, 2, 2], jnp.int32))
    np.testing.assert_array_equal(np.asarray(row), [2, 3, 0, 0])
    assert float(rew) == 4.0 + 8.0
    row, rew = _slide_row_left(jnp.asarray([1, 0, 0, 1], jnp.int32))
    np.testing.assert_array_equal(np.asarray(row), [2, 0, 0, 0])
    assert float(rew) == 4.0
    # No double-merge: [2,1,1,0] → [2,2,0,0], not [3,...].
    row, rew = _slide_row_left(jnp.asarray([2, 1, 1, 0], jnp.int32))
    np.testing.assert_array_equal(np.asarray(row), [2, 2, 0, 0])


def test_2048_directions() -> None:
    board = jnp.asarray(
        [[1, 0, 0, 1], [0, 0, 0, 0], [0, 0, 0, 0], [1, 0, 0, 0]], jnp.int32
    )
    up, rew = _move(board, jnp.int32(1))
    assert int(up[0, 0]) == 2  # the two 2s in column 0 merged up
    assert float(rew) == 4.0


def test_2048_pool() -> None:
    env = envpool_tpu.make("Play2048-v1", env_type="gymnasium", num_envs=8, seed=0)
    obs, info = env.reset()
    assert obs.shape == (8, 4, 4)
    assert ((obs > 0).sum(axis=(1, 2)) == 2).all()  # two spawned tiles
    rng = np.random.default_rng(0)
    total = np.zeros(8)
    for _ in range(50):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 4, 8).astype(np.int32)
        )
        total += rew
    assert (total > 0).all()  # merges happened


def test_tictactoe_win() -> None:
    env = TicTacToeEnv.from_config(num_envs=1)
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    # p0: 0, p1: 3, p0: 1, p1: 4, p0: 2 → p0 wins top row.
    for a, expect_done in [(0, False), (3, False), (1, False), (4, False), (2, True)]:
        out = env.step_env(st, jnp.int32(a), key)
        st = out.state
        assert bool(out.terminated) == expect_done
    assert float(out.reward) == 1.0


def test_tictactoe_illegal_move_loses() -> None:
    env = TicTacToeEnv.from_config(num_envs=1)
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    out = env.step_env(st, jnp.int32(4), key)
    out = env.step_env(out.state, jnp.int32(4), key)  # occupied!
    assert bool(out.terminated)
    assert float(out.reward) == -1.0


def test_connect4_vertical_win() -> None:
    env = Connect4Env.from_config(num_envs=1)
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    # p0 stacks column 0; p1 stacks column 1; p0 wins with 4 in column 0.
    moves = [0, 1, 0, 1, 0, 1, 0]
    for i, a in enumerate(moves):
        out = env.step_env(st, jnp.int32(a), key)
        st = out.state
    assert bool(out.terminated)
    assert float(out.reward) == 1.0
    # Gravity check: pieces at the bottom.
    board = np.asarray(st["board"])
    assert board[5, 0] == 1 and board[5, 1] == 2


def test_turn_alternation() -> None:
    env = envpool_tpu.make(
        "TicTacToe-v1", env_type="gymnasium", num_envs=2, seed=0
    )
    obs, info = env.reset()
    assert (obs["current_player"] == 0).all()
    assert obs["board"].shape == (2, 3, 3)
    obs, rew, term, trunc, info = env.step(np.zeros(2, np.int32))
    assert (obs["current_player"] == 1).all()
    assert info["legal_moves"].shape == (2, 9)
    assert (~info["legal_moves"][:, 0]).all()


def test_multiplayer_protocol() -> None:
    """EnvPool per-player action rows + per-player reward rows."""
    env = envpool_tpu.make(
        "TicTacToe-v1", env_type="gymnasium", num_envs=2, seed=0,
        max_num_players=2,
    )
    obs, info = env.reset()
    np.testing.assert_array_equal(
        info["players"]["env_id"], [[0, 0], [1, 1]]
    )
    # Scripted win for player 0 (actions given as [B, P] rows).
    for a0, a1 in [(0, 3), (3, 4), (1, 5), (4, 6), (2, 7)]:
        acts = np.array([[a0, a1]] * 2, np.int32)
        obs, rew, term, trunc, info = env.step(acts)
    assert term.all()
    np.testing.assert_array_equal(rew, [[1.0, -1.0], [1.0, -1.0]])
    # Flattened [B*P] rows fold automatically.
    env2 = envpool_tpu.make(
        "ConnectFour-v1", env_type="gymnasium", num_envs=2, seed=0,
        max_num_players=2,
    )
    env2.reset()
    obs, rew, term, trunc, info = env2.step(np.array([0, 1, 0, 1], np.int32))
    assert np.asarray(rew).shape == (2, 2)


def test_othello_opening_and_full_game() -> None:
    env = envpool_tpu.make("Othello-v1", env_type="gymnasium", num_envs=2, seed=0)
    obs, info = env.reset()
    b = obs["board"][0]
    assert (b == 1).sum() == 2 and (b == 2).sum() == 2
    # Canonical black openings.
    np.testing.assert_array_equal(
        np.flatnonzero(info["legal_moves"][0]), [19, 26, 37, 44]
    )
    rng = np.random.default_rng(0)
    for _ in range(70):
        mask = info["legal_moves"]
        acts = np.array(
            [rng.choice(np.flatnonzero(m)) if m.any() else 0 for m in mask],
            np.int32,
        )
        obs, rew, term, trunc, info = env.step(acts)
        if term.all():
            break
    assert term.all()
    assert set(np.unique(rew)).issubset({-1.0, 0.0, 1.0})


def test_othello_flip_correctness() -> None:
    """Playing 19 (row 2, col 3) flips the white disc at (3,3)."""
    import jax

    from envpool_tpu.envs.board import OthelloEnv

    env = OthelloEnv.from_config(num_envs=1)
    st, obs = env.reset_env(jax.random.PRNGKey(0))
    out = env.step_env(st, jnp.int32(19), jax.random.PRNGKey(0))
    b = np.asarray(out.state["board"])
    assert b[2, 3] == 1      # played disc
    assert b[3, 3] == 1      # flipped
    assert b[4, 4] == 2      # untouched
    assert float(out.reward) == 0.0 and not bool(out.terminated)


def test_kuhn_poker_payoffs() -> None:
    env = envpool_tpu.make(
        "KuhnPoker-v1", env_type="gymnasium", num_envs=256, seed=0
    )
    env.reset()
    rng = np.random.default_rng(0)
    rews = []
    for _ in range(50):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 2, 256).astype(np.int32)
        )
        rews.extend(rew[term].tolist())
    assert set(np.unique(rews)).issubset({-2.0, -1.0, 1.0, 2.0})
    # Check-check and folds pay ±1; called showdowns ±2 — both occur.
    assert 1.0 in rews and 2.0 in rews


def test_hex_no_draws_and_connectivity() -> None:
    """Hex theorem: a filled board always has exactly one winner."""
    env = envpool_tpu.make("Hex-v1", env_type="gymnasium", num_envs=4, seed=0)
    obs, info = env.reset()
    rng = np.random.default_rng(0)
    done = np.zeros(4, bool)
    winners = []
    for _ in range(121):
        mask = info["legal_moves"]
        acts = np.array(
            [rng.choice(np.flatnonzero(m)) if m.any() else 0 for m in mask],
            np.int32,
        )
        obs, rew, term, trunc, info = env.step(acts)
        for i in np.flatnonzero(term & ~done):
            winners.append(float(rew[i]))
        done |= term
        if done.all():
            break
    assert done.all()
    assert all(r == 1.0 for r in winners)


def test_hex_vertical_chain_wins() -> None:
    """A straight top-to-bottom column for player 0 wins."""
    import jax

    from envpool_tpu.envs.board.hex import HexEnv

    env = HexEnv.from_config(num_envs=1)
    st, obs = env.reset_env(jax.random.PRNGKey(0))
    # p0 fills column 0 (actions r*11); p1 plays far away (r*11+5).
    out = None
    for r in range(11):
        out = env.step_env(st, jnp.int32(r * 11), jax.random.PRNGKey(0))
        st = out.state
        if r < 10:
            out = env.step_env(st, jnp.int32(r * 11 + 5), jax.random.PRNGKey(0))
            st = out.state
    assert bool(out.terminated)
    assert float(out.reward) == 1.0


# ---------------------------------------------------------------------------
# Go (pgx-class; reference ids Go9x9-v1 etc., envpool/pgx/registration.py)
# ---------------------------------------------------------------------------


def _go_env(size=5, **kwargs):
    from envpool_tpu.envs.board.go import GoEnv

    return GoEnv.from_config(num_envs=1, board_size=size, **kwargs)


def _go_play(env, st, moves):
    key = jax.random.PRNGKey(0)
    out = None
    for a in moves:
        out = env.step_env(st, jnp.int32(a), key)
        st = out.state
    return st, out


def test_go_capture_single_stone() -> None:
    env = _go_env()
    st, obs = env.reset_env(jax.random.PRNGKey(0))
    # Black surrounds the white stone at (1,1)=6: B 1, W 6, B 5, W 20,
    # B 7, W 22, B 11 -> capture.
    st, out = _go_play(env, st, [1, 6, 5, 20, 7, 22, 11])
    board = np.asarray(st["board"])
    assert board[1, 1] == 0  # captured
    for p in (1, 5, 7, 11):
        assert board[p // 5, p % 5] == 1
    assert not bool(out.terminated)


def test_go_suicide_illegal() -> None:
    env = _go_env()
    st, obs = env.reset_env(jax.random.PRNGKey(0))
    st, out = _go_play(env, st, [1, 6, 5, 20, 7, 22, 11])
    # White to move; (1,1)=6 is now an eye surrounded by healthy black
    # chains -> suicide, illegal.
    legal = np.asarray(out.obs["info:legal_moves"])
    assert not legal[6]
    assert legal[25]  # pass always legal
    # 20 and 22 are white's own stones -> occupied, illegal.
    assert not legal[20] and not legal[22]


def test_go_simple_ko() -> None:
    env = _go_env()
    st, obs = env.reset_env(jax.random.PRNGKey(0))
    # Build the classic ko shape around (1,1)=6 and (1,2)=7.
    st, out = _go_play(env, st, [1, 2, 5, 8, 11, 12, 24, 6])
    # Black recaptures at 7, taking the lone white stone at 6.
    st, out = _go_play(env, st, [7])
    board = np.asarray(st["board"])
    assert board[1, 1] == 0 and board[1, 2] == 1
    legal = np.asarray(out.obs["info:legal_moves"])
    assert not legal[6]  # ko: immediate recapture banned
    # White plays elsewhere, black answers elsewhere -> ko clears.
    st, out = _go_play(env, st, [20, 23])
    legal = np.asarray(out.obs["info:legal_moves"])
    assert legal[6]  # white may now retake the ko


def test_go_double_pass_scoring() -> None:
    env = _go_env()
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    # Black stone in the center, then two passes: whole board is black
    # territory (25 > 0 + 7.5) -> the passing mover... white passes last
    # and loses; black passed second-to-last.
    st, out = _go_play(env, st, [12, 25, 25])
    assert bool(out.terminated)
    # Last mover is black (moves: B 12, W pass, B pass) -> black wins.
    assert float(out.reward) == 1.0

    # Empty board, two passes: white wins by komi; last mover is white.
    st, obs = env.reset_env(key)
    st, out = _go_play(env, st, [25, 25])
    assert bool(out.terminated)
    assert float(out.reward) == 1.0  # mover = white, white wins by komi


def test_go_illegal_move_terminates_with_loss() -> None:
    env = _go_env()
    st, obs = env.reset_env(jax.random.PRNGKey(0))
    st, out = _go_play(env, st, [12, 12])  # white plays on black's stone
    assert bool(out.terminated)
    assert float(out.reward) == -1.0


def test_go_pool_and_registry() -> None:
    for task in ("Go9x9-v1", "ChineseGo9x9-v1"):
        assert task in envpool_tpu.list_all_envs()
    env = envpool_tpu.make("Go9x9-v1", env_type="gymnasium", num_envs=4, seed=1)
    obs, info = env.reset()
    assert obs["board"].shape == (4, 9, 9)
    assert info["legal_moves"].shape == (4, 82)
    assert info["legal_moves"].all()  # empty board: everything playable
    # A few random legal moves per env.
    rng = np.random.default_rng(0)
    for _ in range(10):
        acts = np.array(
            [rng.choice(np.flatnonzero(m)) for m in info["legal_moves"]],
            np.int32,
        )
        obs, rew, term, trunc, info = env.step(acts)
    assert obs["board"].shape == (4, 9, 9)


def test_go_multiplayer_protocol_rewards() -> None:
    """EnvPool per-player rows: winner +1, loser -1 at termination."""
    from envpool_tpu.envs.board.go import GoEnv

    env = GoEnv.from_config(num_envs=1, board_size=5, max_num_players=2)
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    out = None
    for a in (12, 25, 25):
        act = jnp.full((2,), a, jnp.int32)
        out = env.step_env(st, act, key)
        st = out.state
    assert bool(out.terminated)
    rewards = np.asarray(out.reward)
    assert rewards.shape == (2,)
    assert rewards[0] == 1.0 and rewards[1] == -1.0  # black wins by area


# ---------------------------------------------------------------------------
# Leduc hold'em (reference id LeducHoldem-v1, envpool/pgx/registration.py)
# ---------------------------------------------------------------------------


def _leduc_state(cards):
    return {
        "cards": jnp.asarray(cards, jnp.int32),
        "bets": jnp.ones(2, jnp.int32),
        "round": jnp.int32(0),
        "raises": jnp.int32(0),
        "acted": jnp.int32(0),
        "player": jnp.int32(0),
    }


def test_leduc_raise_call_fold() -> None:
    from envpool_tpu.envs.board.leduc import LeducHoldemEnv

    env = LeducHoldemEnv.from_config(num_envs=1)
    key = jax.random.PRNGKey(0)
    st = _leduc_state([2, 0, 1])
    # Round 1: p0 raises (2), p1 calls -> round 2 opens, public revealed.
    out = env.step_env(st, jnp.int32(1), key)
    assert not bool(out.terminated)
    np.testing.assert_array_equal(np.asarray(out.state["bets"]), [3, 1])
    out = env.step_env(out.state, jnp.int32(0), key)
    assert not bool(out.terminated)
    assert int(out.state["round"]) == 1
    assert int(out.state["player"]) == 0
    assert int(out.obs["obs:public_card"]) == 1  # revealed in round 2
    np.testing.assert_array_equal(np.asarray(out.state["bets"]), [3, 3])
    # Round 2: p0 raises (4), p1 folds -> p0 wins p1's 3 chips.
    out = env.step_env(out.state, jnp.int32(1), key)
    np.testing.assert_array_equal(np.asarray(out.state["bets"]), [7, 3])
    out = env.step_env(out.state, jnp.int32(2), key)
    assert bool(out.terminated)
    assert float(out.reward) == -3.0  # mover = p1 (folder) loses 3


def test_leduc_showdown_pair_beats_rank() -> None:
    from envpool_tpu.envs.board.leduc import LeducHoldemEnv

    env = LeducHoldemEnv.from_config(num_envs=1)
    key = jax.random.PRNGKey(0)
    st = _leduc_state([0, 2, 0])  # p0 J pairs the public J; p1 holds K
    out = None
    for a in (0, 0, 0, 0):  # check-check both rounds
        out = env.step_env(st, jnp.int32(a), key)
        st = out.state
    assert bool(out.terminated)
    assert float(out.reward) == -1.0  # mover = p1, p0 wins the ante

    st = _leduc_state([1, 1, 2])  # equal ranks, no pair: split pot
    out = None
    for a in (0, 0, 0, 0):
        out = env.step_env(st, jnp.int32(a), key)
        st = out.state
    assert bool(out.terminated)
    assert float(out.reward) == 0.0


def test_leduc_legal_mask() -> None:
    from envpool_tpu.envs.board.leduc import LeducHoldemEnv

    env = LeducHoldemEnv.from_config(num_envs=1)
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    legal = np.asarray(obs["info:legal_moves"])
    assert legal[0] and legal[1] and not legal[2]  # no bet to fold to
    out = env.step_env(st, jnp.int32(1), key)  # p0 raises
    legal = np.asarray(out.obs["info:legal_moves"])
    assert legal[0] and legal[1] and legal[2]
    out = env.step_env(out.state, jnp.int32(1), key)  # p1 re-raises (cap)
    legal = np.asarray(out.obs["info:legal_moves"])
    assert legal[0] and not legal[1] and legal[2]


def test_leduc_pool() -> None:
    env = envpool_tpu.make(
        "LeducHoldem-v1", env_type="gymnasium", num_envs=8, seed=0
    )
    obs, info = env.reset()
    assert obs["card"].shape == (8,)
    assert (obs["public_card"] == 3).all()  # hidden in round 1
    rng = np.random.default_rng(0)
    for _ in range(20):
        acts = np.array(
            [rng.choice(np.flatnonzero(m)) for m in info["legal_moves"]],
            np.int32,
        )
        obs, rew, term, trunc, info = env.step(acts)
    assert obs["chips"].max() <= 13
