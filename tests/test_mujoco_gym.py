"""Gym-MuJoCo env family tests."""

import numpy as np
import pytest

import envpool_tpu

TASKS = [
    ("HalfCheetah-v4", 17, 6),
    ("Hopper-v4", 11, 3),
    ("Walker2d-v4", 17, 6),
    ("Swimmer-v4", 8, 2),
    ("Ant-v4", 27, 8),
    ("Reacher-v4", 11, 2),
    ("InvertedPendulum-v4", 4, 1),
    ("InvertedDoublePendulum-v4", 11, 1),
]


@pytest.mark.parametrize("task,obs_dim,act_dim", TASKS)
def test_spec_shapes(task, obs_dim, act_dim) -> None:
    spec = envpool_tpu.make_spec(task, num_envs=2)
    assert spec.state_array_spec["obs"].shape == (obs_dim,)
    assert spec.action_array_spec["action"].shape == (act_dim,)


def test_half_cheetah_rollout() -> None:
    env = envpool_tpu.make(
        "HalfCheetah-v4", env_type="gymnasium", num_envs=4, seed=0
    )
    obs, info = env.reset()
    assert obs.shape == (4, 17)
    rng = np.random.default_rng(0)
    for _ in range(10):
        a = rng.uniform(-1, 1, (4, 6)).astype(np.float32)
        obs, rew, term, trunc, info = env.step(a)
    assert np.isfinite(obs).all()
    assert not term.any()  # cheetah never terminates
    # info mirrors the reference state keys.
    assert "x_velocity" in info and "reward_ctrl" in info
    assert "qpos0" in info and info["qpos0"].shape == (4, 9)


def test_hopper_terminates_when_unhealthy() -> None:
    env = envpool_tpu.make("Hopper-v4", env_type="gymnasium", num_envs=8, seed=0)
    env.reset()
    rng = np.random.default_rng(0)
    terms = 0
    for _ in range(120):
        a = rng.uniform(-1, 1, (8, 3)).astype(np.float32)
        obs, rew, term, trunc, info = env.step(a)
        terms += int(term.sum())
    assert terms > 0  # random hopper falls over


def test_inverted_pendulum_reward_and_termination() -> None:
    env = envpool_tpu.make(
        "InvertedPendulum-v4", env_type="gymnasium", num_envs=8, seed=0
    )
    env.reset()
    rng = np.random.default_rng(0)
    terms = 0
    for _ in range(80):
        a = rng.uniform(-3, 3, (8, 1)).astype(np.float32)
        obs, rew, term, trunc, info = env.step(a)
        # In-episode steps reward 1.0; auto-reset transitions reward 0.
        is_reset = info["elapsed_step"] == 0
        assert ((rew == 1.0) | is_reset).all()
        terms += int(term.sum())
    assert terms > 0  # random control tips the pole


def test_reacher_reward_structure() -> None:
    env = envpool_tpu.make("Reacher-v4", env_type="gymnasium", num_envs=4, seed=0)
    obs, info = env.reset()
    a = np.zeros((4, 2), np.float32)
    obs, rew, term, trunc, info = env.step(a)
    # reward = -dist - 0 for zero action; dist ≤ arm span + goal radius.
    assert (rew <= 0).all() and (rew > -1.0).all()
    np.testing.assert_allclose(
        rew, info["reward_dist"] + info["reward_ctrl"], rtol=1e-5
    )
    # 50-step truncation.
    for t in range(49):
        obs, rew, term, trunc, info = env.step(a)
    assert trunc.all()


def test_determinism() -> None:
    def run():
        env = envpool_tpu.make(
            "HalfCheetah-v4", env_type="gymnasium", num_envs=2, seed=7
        )
        obs, _ = env.reset()
        rng = np.random.default_rng(0)
        for _ in range(5):
            a = rng.uniform(-1, 1, (2, 6)).astype(np.float32)
            obs, *_ = env.step(a)
        return obs

    np.testing.assert_array_equal(run(), run())


def test_humanoid_obs_dim_and_step() -> None:
    env = envpool_tpu.make("Humanoid-v4", env_type="gymnasium", num_envs=2, seed=0)
    obs, info = env.reset()
    assert obs.shape == (2, 376)  # gym v4 layout incl. worldbody rows
    obs, rew, term, trunc, info = env.step(
        np.zeros((2, 17), np.float32)
    )
    assert np.isfinite(obs).all()


def test_humanoid_standup_reward() -> None:
    env = envpool_tpu.make(
        "HumanoidStandup-v4", env_type="gymnasium", num_envs=2, seed=0
    )
    env.reset()
    obs, rew, term, trunc, info = env.step(np.zeros((2, 17), np.float32))
    # Lying height ~0.1 / dt 0.003 + 1 ≈ 30-40.
    assert (rew > 5).all() and (rew < 100).all()
    assert not term.any()
