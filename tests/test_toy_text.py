"""Toy-text behavior tests (alignment with reference semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.envs.toy_text import (
    BlackjackEnv,
    CatchEnv,
    CliffWalkingEnv,
    FrozenLakeEnv,
    NChainEnv,
    TaxiEnv,
)


def test_catch_episode() -> None:
    env = envpool_tpu.make("Catch-v0", env_type="gymnasium", num_envs=16, seed=0)
    obs, info = env.reset()
    assert obs.shape == (16, 10, 5)
    # Ball on row 0, paddle mid-bottom.
    assert (obs[:, 0].sum(-1) == 1).all()
    assert (obs[:, -1, 2] == 1).all()
    # Episode ends after height-1 = 9 steps with reward ±1.
    for t in range(9):
        obs, rew, term, trunc, info = env.step(np.ones(16, np.int32))
    assert term.all()
    assert set(np.unique(rew)).issubset({-1.0, 1.0})


def test_catch_tracking_policy_wins() -> None:
    """A paddle that tracks the ball always catches it."""
    env = CatchEnv.from_config(num_envs=1)
    key = jax.random.PRNGKey(3)
    state, obs = env.reset_env(key)
    for _ in range(9):
        x, y, paddle = (int(v) for v in state)
        act = jnp.int32(1 + np.sign(y - paddle))
        out = env.step_env(state, act, key)
        state = out.state
    assert bool(out.terminated)
    assert float(out.reward) == 1.0


def test_frozen_lake_holes_and_goal() -> None:
    env = FrozenLakeEnv.from_config(num_envs=1, size=4)
    key = jax.random.PRNGKey(0)
    # From (1,0), forced move right into hole (1,1) must terminate w/ 0.
    # Note slip: choose a key whose slip is 0. Find one.
    for k in range(50):
        key = jax.random.PRNGKey(k)
        slip = jax.random.randint(key, (), -1, 2, jnp.int32)
        if int(slip) == 0:
            break
    out = env.step_env(jnp.array([1, 0], jnp.int32), jnp.int32(2), key)
    assert bool(out.terminated)
    assert float(out.reward) == 0.0
    assert int(out.obs["obs"]) == 1 * 4 + 1
    # Into the goal (3,3) from (3,2) moving right.
    out = env.step_env(jnp.array([3, 2], jnp.int32), jnp.int32(2), key)
    assert bool(out.terminated)
    assert float(out.reward) == 1.0


def test_frozen_lake_8x8_spec() -> None:
    spec = envpool_tpu.make_spec("FrozenLake8x8-v1", num_envs=2)
    assert spec.state_array_spec["obs"].maximum == 63
    assert spec.config.max_episode_steps == 200


def test_cliffwalking_cliff_and_goal() -> None:
    env = CliffWalkingEnv.from_config(num_envs=1)
    key = jax.random.PRNGKey(0)
    # Step down from (2,5) onto the cliff → back to start, -100.
    out = env.step_env(jnp.array([2, 5], jnp.int32), jnp.int32(2), key)
    assert float(out.reward) == -100.0
    assert int(out.obs["obs"]) == 36
    assert not bool(out.terminated)
    # Reach the goal from (2,11) moving down.
    out = env.step_env(jnp.array([2, 11], jnp.int32), jnp.int32(2), key)
    assert bool(out.terminated)
    assert float(out.reward) == -1.0


def test_cliffwalking_prob_info() -> None:
    env = envpool_tpu.make(
        "CliffWalkingSlippery-v1", env_type="gymnasium", num_envs=4
    )
    obs, info = env.reset()
    obs, rew, term, trunc, info = env.step(np.zeros(4, np.int32))
    np.testing.assert_allclose(info["prob"], 1.0 / 3.0, rtol=1e-6)


def test_taxi_moves_and_walls() -> None:
    env = TaxiEnv.from_config(num_envs=1)
    key = jax.random.PRNGKey(0)
    # From (0,0): move east blocked? map row 0 = "|:|::|" → sep right of
    # y=0 is ':' → allowed.
    out = env.step_env(jnp.array([0, 0, 0, 1], jnp.int32), jnp.int32(2), key)
    x, y, s, t = (int(v) for v in out.state)
    assert (x, y) == (0, 1)
    # From (0,1): east hits wall '|' → stays.
    out = env.step_env(jnp.array([0, 1, 0, 1], jnp.int32), jnp.int32(2), key)
    assert int(out.state[1]) == 1
    assert float(out.reward) == -1.0


def test_taxi_pickup_dropoff() -> None:
    env = TaxiEnv.from_config(num_envs=1)
    key = jax.random.PRNGKey(0)
    # Pickup at R=(0,0) with s=0.
    out = env.step_env(jnp.array([0, 0, 0, 1], jnp.int32), jnp.int32(4), key)
    assert int(out.state[2]) == 4
    assert float(out.reward) == -1.0
    # Bad pickup (wrong cell).
    out = env.step_env(jnp.array([2, 2, 0, 1], jnp.int32), jnp.int32(4), key)
    assert float(out.reward) == -10.0
    # Correct dropoff at G=(0,4) with s=4, t=1.
    out = env.step_env(jnp.array([0, 4, 4, 1], jnp.int32), jnp.int32(5), key)
    assert bool(out.terminated)
    assert float(out.reward) == 20.0
    assert int(out.state[2]) == 1
    # Dropoff at wrong loc Y=(4,0) → passenger exits there (s=2), -1.
    out = env.step_env(jnp.array([4, 0, 4, 1], jnp.int32), jnp.int32(5), key)
    assert not bool(out.terminated)
    assert float(out.reward) == -1.0
    assert int(out.state[2]) == 2


def test_nchain_dynamics() -> None:
    env = NChainEnv.from_config(num_envs=1)
    # Find keys with/without flip (u < 0.2 flips).
    keys = {bool(jax.random.uniform(jax.random.PRNGKey(k), ()) < 0.2): k
            for k in range(40)}
    no_flip = jax.random.PRNGKey(keys[False])
    out = env.step_env(jnp.int32(2), jnp.int32(0), no_flip)
    assert int(out.state) == 3 and float(out.reward) == 0.0
    out = env.step_env(jnp.int32(4), jnp.int32(0), no_flip)
    assert int(out.state) == 4 and float(out.reward) == 10.0
    out = env.step_env(jnp.int32(3), jnp.int32(1), no_flip)
    assert int(out.state) == 0 and float(out.reward) == 2.0


def test_blackjack_pool() -> None:
    env = envpool_tpu.make("Blackjack-v1", env_type="gymnasium", num_envs=64, seed=0)
    obs, info = env.reset()
    assert obs.shape == (64, 3)
    assert (obs[:, 0] >= 2).all() and (obs[:, 0] <= 21).all()
    assert (obs[:, 1] >= 1).all() and (obs[:, 1] <= 10).all()
    # Stick everywhere → all episodes end; rewards in {-1,0,1}.
    obs, rew, term, trunc, info = env.step(np.zeros(64, np.int32))
    assert term.all()
    assert set(np.unique(rew)).issubset({-1.0, 0.0, 1.0})


def test_blackjack_hit_bust() -> None:
    env = BlackjackEnv.from_config(num_envs=1)
    state = {
        "p_sum": jnp.int32(20),
        "p_ace": jnp.bool_(False),
        "p_cards": jnp.int32(3),
        "p_first": jnp.array([10, 7], jnp.int32),
        "d_sum": jnp.int32(15),
        "d_ace": jnp.bool_(False),
        "d_first": jnp.array([10, 5], jnp.int32),
    }
    # Hitting on 20: bust unless the card is an ace (raw sum 21).
    for k in range(30):
        key = jax.random.PRNGKey(k)
        out = env.step_env(state, jnp.int32(1), key)
        card = int(out.state["p_sum"]) - 20
        if card > 1:
            assert bool(out.terminated) and float(out.reward) == -1.0
        else:
            assert not bool(out.terminated)


def test_toy_text_all_registered() -> None:
    envs = envpool_tpu.list_all_envs()
    for task in [
        "Catch-v0",
        "FrozenLake-v1",
        "FrozenLake8x8-v1",
        "Taxi-v3",
        "NChain-v0",
        "CliffWalking-v1",
        "CliffWalkingSlippery-v1",
        "CliffWalking-v0",
        "Blackjack-v1",
        "tabular/Blackjack-v0",
    ]:
        assert task in envs
