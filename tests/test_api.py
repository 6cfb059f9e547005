"""Registry / spec / spaces API tests (mirrors envpool/make_test.py style)."""

import numpy as np
import pytest

import envpool_tpu


def test_list_all_envs_contains_families() -> None:
    envs = envpool_tpu.list_all_envs()
    for task in [
        "CartPole-v0",
        "CartPole-v1",
        "Pendulum-v0",
        "Pendulum-v1",
        "MountainCar-v0",
        "MountainCarContinuous-v0",
        "Acrobot-v1",
    ]:
        assert task in envs


def test_make_unknown_raises() -> None:
    with pytest.raises(ValueError, match="not supported"):
        envpool_tpu.make("NoSuchEnv-v0", env_type="gymnasium")
    with pytest.raises(ValueError, match="env_type"):
        envpool_tpu.make("CartPole-v1", env_type="bogus")


def test_batch_size_validation() -> None:
    with pytest.raises(ValueError, match="batch_size"):
        envpool_tpu.make(
            "CartPole-v1", env_type="gymnasium", num_envs=4, batch_size=8
        )


def test_env_seed_validation() -> None:
    with pytest.raises(ValueError, match="env_seed"):
        envpool_tpu.make(
            "CartPole-v1", env_type="gymnasium", num_envs=4, env_seed=[1, 2]
        )


def test_spec_surface() -> None:
    spec = envpool_tpu.make_spec("CartPole-v1", num_envs=16, seed=3)
    assert spec.config.num_envs == 16
    assert spec.config.seed == 3
    assert spec.config.max_episode_steps == 500
    assert spec.reward_threshold == 475.0
    sas = spec.state_array_spec
    for key in [
        "info:env_id",
        "elapsed_step",
        "done",
        "reward",
        "discount",
        "step_type",
        "trunc",
        "obs",
    ]:
        assert key in sas
    assert list(spec.action_array_spec) == ["action"]


def test_gymnasium_spaces() -> None:
    import gymnasium

    env = envpool_tpu.make("CartPole-v1", env_type="gymnasium", num_envs=2)
    assert isinstance(env.action_space, gymnasium.spaces.Discrete)
    assert env.action_space.n == 2
    assert isinstance(env.observation_space, gymnasium.spaces.Box)
    assert env.observation_space.shape == (4,)
    assert env.single_observation_space is env.observation_space

    cont = envpool_tpu.make(
        "MountainCarContinuous-v0", env_type="gymnasium", num_envs=2
    )
    assert isinstance(cont.action_space, gymnasium.spaces.Box)
    assert cont.action_space.shape == (1,)

    mc = envpool_tpu.make("MountainCar-v0", env_type="gymnasium", num_envs=2)
    assert mc.action_space.n == 3


def test_dm_specs() -> None:
    import dm_env.specs

    env = envpool_tpu.make_dm("CartPole-v1", num_envs=2)
    act = env.action_spec()
    assert isinstance(act, dm_env.specs.DiscreteArray)
    assert act.num_values == 2
    obs = env.observation_spec()
    assert obs.obs.shape == (4,)
    assert hasattr(obs, "env_id")


def test_config_repr_and_len() -> None:
    env = envpool_tpu.make("CartPole-v1", env_type="gymnasium", num_envs=3)
    assert len(env) == 3
    assert "num_envs=3" in repr(env)
    assert env.config["max_episode_steps"] == 500
    np.testing.assert_array_equal(env.all_env_ids, np.arange(3))


def test_unknown_config_key_rejected() -> None:
    with pytest.raises(TypeError, match="unknown config"):
        envpool_tpu.make("CartPole-v1", env_type="gymnasium", bogus_key=1)


def test_aliases() -> None:
    env = envpool_tpu.make(
        "phys2d/CartPole-v1", env_type="gymnasium", num_envs=2
    )
    assert env.config["max_episode_steps"] == 500
