"""SparrowMahjong (suzume-jong) invariant tests.

Behavioral reference: ``envpool/pgx/sparrow_mahjong.h`` (tile/dealing
rules, scoring cache, furiten/ron/tsumo).  The pip ``pgx`` oracle is not
installable in this image; rule invariants + scoring-cache spot checks
stand in (see tests/oracle_fixtures/README.md for the golden harness).
"""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.envs.board.sparrow_mahjong import (
    SparrowMahjongEnv,
    _hand_to_score,
    _is_completed,
)


def test_scoring_cache_spot_checks() -> None:
    # Suzume-jong wins are 6 tiles = two sets (triplets or runs), no pair.
    # Two triplets: 1-1-1 2-2-2.
    hand = jnp.zeros(11, jnp.int32).at[0].set(3).at[1].set(3)
    assert bool(_is_completed(hand))
    base, yaku = _hand_to_score(hand)
    assert int(base) >= 1
    # Two runs: 1-2-3 + 4-5-6.
    runs = jnp.zeros(11, jnp.int32).at[jnp.arange(6)].set(1)
    assert bool(_is_completed(runs))
    # Red dragon triplet + run.
    dragons = jnp.zeros(11, jnp.int32).at[10].set(3)
    dragons = dragons.at[jnp.arange(3)].set(1)
    assert bool(_is_completed(dragons))
    # Incomplete: six singles not forming two runs.
    bad = jnp.zeros(11, jnp.int32).at[jnp.asarray([0, 1, 3, 4, 6, 8])].set(1)
    assert not bool(_is_completed(bad))
    # A 5-tile hand is never complete.
    five = jnp.zeros(11, jnp.int32).at[jnp.arange(5)].set(1)
    assert not bool(_is_completed(five))


def test_deal_invariants() -> None:
    env = SparrowMahjongEnv.from_config(num_envs=1, max_num_players=3)
    st, obs = env.reset_env(jax.random.PRNGKey(0))
    hands = np.asarray(st["hands"])
    # Current seat has 6 tiles (5 dealt + 1 drawn); others 5.
    assert hands[0].sum() == 6
    assert hands[1].sum() == 5 and hands[2].sum() == 5
    # Wall is a permutation of 0..43.
    assert sorted(np.asarray(st["wall"]).tolist()) == list(range(44))
    # Not an immediate tsumo (redeal loop guarantees it).
    assert not bool(_is_completed(st["hands"][0]))
    # Legal mask only allows discarding held tiles.
    legal = np.asarray(st["legal"])
    assert (legal <= (hands[0] > 0)).all()
    assert obs["obs"].shape == (3, 11, 15)


def test_full_games_terminate_and_scores_zero_sum() -> None:
    env = SparrowMahjongEnv.from_config(num_envs=1, max_num_players=3)
    step = env.step_env
    ended = 0
    for seed in range(6):
        key = jax.random.PRNGKey(seed)
        st, obs = env.reset_env(key)
        total = np.zeros(3)
        for t in range(60):
            legal = np.asarray(st["legal"])
            k = jax.random.fold_in(key, t)
            # Pick a random *legal* discard.
            choices = np.flatnonzero(legal)
            a = int(choices[int(jax.random.randint(k, (), 0, len(choices)))])
            out = step(st, jnp.full((3,), a, jnp.int32), k)
            st = out.state
            total += np.asarray(out.reward)
            if bool(out.terminated):
                ended += 1
                break
        # Seat scores are zero-sum (win + payments); rewards likewise.
        assert abs(total.sum()) < 1e-5
        assert int(np.asarray(st["scores"]).sum()) == 0
    assert ended >= 4  # most random games end within 60 plies


def test_registry_and_pool() -> None:
    assert "SparrowMahjong-v1" in envpool_tpu.list_all_envs()
    env = envpool_tpu.make(
        "SparrowMahjong-v1", env_type="gymnasium", num_envs=4, seed=7
    )
    obs, info = env.reset()
    assert obs.shape == (4, 3, 11, 15)  # [B, P] per-player rows
    act = np.zeros((4, 3), np.int32)
    # Discard a tile type the current seat actually holds.
    hands = info["hands"]
    for e in range(4):
        seat = 0  # turn 0: seat 0 is to act
        act[e, :] = int(np.flatnonzero(hands[e][seat] > 0)[0])
    obs, rew, term, trunc, info = env.step(act)
    assert np.asarray(rew).shape == (4, 3)
