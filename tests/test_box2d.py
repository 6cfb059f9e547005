"""LunarLander family tests."""

import numpy as np
import pytest

import envpool_tpu


def test_spec_surface() -> None:
    spec = envpool_tpu.make_spec("LunarLander-v2", num_envs=2)
    assert spec.state_array_spec["obs"].shape == (8,)
    assert spec.action_array_spec["action"].is_discrete
    spec_c = envpool_tpu.make_spec("LunarLanderContinuous-v2", num_envs=2)
    assert spec_c.action_array_spec["action"].shape == (2,)


def test_random_play_statistics() -> None:
    """Random policy: negative returns, episodes end within ~hundreds."""
    env = envpool_tpu.make(
        "LunarLander-v2", env_type="gymnasium", num_envs=8, seed=0
    )
    env.reset()
    rng = np.random.default_rng(0)
    returns, cur = [], np.zeros(8)
    for _ in range(600):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 4, 8).astype(np.int32)
        )
        cur += rew
        for i in np.flatnonzero(term | trunc):
            returns.append(cur[i])
            cur[i] = 0
    assert len(returns) > 10
    assert np.mean(returns) < 0
    assert np.min(returns) >= -500


def test_crash_gives_minus_100() -> None:
    """Free fall → impact crash with terminal reward -100."""
    env = envpool_tpu.make(
        "LunarLander-v2", env_type="gymnasium", num_envs=4, seed=1
    )
    env.reset()
    noop = np.zeros(4, np.int32)
    terminal_rewards = []
    for _ in range(200):
        obs, rew, term, trunc, info = env.step(noop)
        terminal_rewards.extend(rew[term].tolist())
    assert terminal_rewards  # falls within 200 frames
    assert all(r == -100.0 for r in terminal_rewards)


def test_obs_normalization_at_reset() -> None:
    env = envpool_tpu.make(
        "LunarLander-v2", env_type="gymnasium", num_envs=16, seed=0
    )
    obs, info = env.reset()
    # Spawn centered horizontally, above the pad, legs off the ground.
    assert np.abs(obs[:, 0]).max() < 0.05
    assert (obs[:, 1] > 0.5).all()
    assert (obs[:, 6] == 0).all() and (obs[:, 7] == 0).all()


def test_main_engine_decelerates() -> None:
    env = envpool_tpu.make(
        "LunarLander-v2", env_type="gymnasium", num_envs=2, seed=3
    )
    obs0, _ = env.reset()
    # Fire main engine continuously: vertical velocity should be higher
    # (less negative) than free fall after 30 frames.
    for _ in range(30):
        obs_fire, *_ = env.step(np.full(2, 2, np.int32))
    env2 = envpool_tpu.make(
        "LunarLander-v2", env_type="gymnasium", num_envs=2, seed=3
    )
    env2.reset()
    for _ in range(30):
        obs_fall, *_ = env2.step(np.zeros(2, np.int32))
    assert (obs_fire[:, 3] > obs_fall[:, 3]).all()
