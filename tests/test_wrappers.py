"""Wrapper transform tests."""

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.engine import Engine
from envpool_tpu.envs.classic_control import CartPoleEnv, PendulumEnv
from envpool_tpu.wrappers import FrameStack, RewardClip, TransformObservation


def test_frame_stack_spec_and_shift() -> None:
    env = FrameStack(CartPoleEnv.from_config(num_envs=4), stack_num=3)
    assert env.state_spec()["obs"].shape == (3, 4)
    engine = Engine(env)
    ps = engine.init()
    ps, ts = engine.reset(ps, jnp.ones(4, jnp.bool_))
    obs0 = np.asarray(ts["obs"])
    # push_all at reset: all slots equal.
    np.testing.assert_array_equal(obs0[:, 0], obs0[:, 1])
    np.testing.assert_array_equal(obs0[:, 1], obs0[:, 2])
    ps, ts = engine.step(ps, {"action": jnp.ones(4, jnp.int32)})
    obs1 = np.asarray(ts["obs"])
    # Shift: oldest two slots are the previous frame.
    np.testing.assert_array_equal(obs1[:, 0], obs0[:, 2])
    np.testing.assert_array_equal(obs1[:, 1], obs0[:, 2])
    assert not np.array_equal(obs1[:, 2], obs0[:, 2])


def test_reward_clip() -> None:
    env = RewardClip(PendulumEnv.from_config(num_envs=2))
    engine = Engine(env)
    ps = engine.init()
    ps, ts = engine.reset(ps, jnp.ones(2, jnp.bool_))
    ps, ts = engine.step(ps, {"action": jnp.zeros((2, 1), jnp.float32)})
    # Pendulum rewards are negative costs → clipped to -1.
    assert set(np.unique(ts["reward"])).issubset({-1.0, 0.0})
    # info:reward carries the raw value.
    assert (np.asarray(ts["info:reward"]) <= 0).all()
    assert (np.asarray(ts["info:reward"]) != np.asarray(ts["reward"])).any()


def test_transform_observation() -> None:
    env = TransformObservation(
        CartPoleEnv.from_config(num_envs=2), lambda o: o * 2.0
    )
    engine = Engine(env)
    ps = engine.init()
    ps, ts = engine.reset(ps, jnp.ones(2, jnp.bool_))
    assert np.abs(np.asarray(ts["obs"])).max() <= 0.1  # 2 * 0.05


def test_normalize_obs_converges() -> None:
    from envpool_tpu.wrappers import NormalizeObs

    env = NormalizeObs(PendulumEnv.from_config(num_envs=4))
    engine = Engine(env)
    ps = engine.init()
    ps, ts = engine.reset(ps, jnp.ones(4, jnp.bool_))
    for _ in range(50):
        ps, ts = engine.step(
            ps, {"action": jnp.zeros((4, 1), jnp.float32)}
        )
    obs = np.asarray(ts["obs"])
    assert np.abs(obs).max() <= 10.0  # clipped
    # After 50 steps the normalized obs should be O(1), not raw scale.
    assert np.abs(obs).mean() < 3.0
