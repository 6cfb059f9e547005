"""Classic-control alignment tests.

Analog of the reference's oracle/alignment tests (SURVEY.md §4.5): we step
our float32 dynamics and an independent float64 numpy oracle implementing
the reference's documented update equations from identical states, and
compare under tolerance.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.envs.classic_control import (
    AcrobotEnv,
    CartPoleEnv,
    MountainCarEnv,
    PendulumEnv,
)


def _cartpole_oracle(state, action):
    g, mc, mp, length, tau, fmag = 9.8, 1.0, 0.1, 0.5, 0.02, 10.0
    mt, mpl = mc + mp, mp * length
    x, x_dot, theta, theta_dot = (float(v) for v in state)
    force = fmag if action == 1 else -fmag
    cost, sint = math.cos(theta), math.sin(theta)
    temp = (force + mpl * theta_dot**2 * sint) / mt
    theta_acc = (g * sint - cost * temp) / (
        length * (4.0 / 3.0 - mp * cost * cost / mt)
    )
    x_acc = temp - mpl * theta_acc * cost / mt
    return np.array(
        [
            x + tau * x_dot,
            x_dot + tau * x_acc,
            theta + tau * theta_dot,
            theta_dot + tau * theta_acc,
        ]
    )


def test_cartpole_alignment() -> None:
    env = CartPoleEnv.from_config(num_envs=1)
    key = jax.random.PRNGKey(0)
    state = jnp.array([0.01, -0.02, 0.03, 0.04], jnp.float32)
    rng = np.random.default_rng(1)
    for _ in range(60):
        act = int(rng.integers(0, 2))
        out = env.step_env(state, jnp.int32(act), key)
        expect = _cartpole_oracle(np.asarray(state, np.float64), act)
        np.testing.assert_allclose(
            np.asarray(out.state), expect, rtol=1e-4, atol=1e-5
        )
        state = out.state
        if bool(out.terminated):
            break


def test_cartpole_termination_bounds() -> None:
    env = CartPoleEnv.from_config(num_envs=1)
    key = jax.random.PRNGKey(0)
    state = jnp.array([2.39, 10.0, 0.0, 0.0], jnp.float32)
    out = env.step_env(state, jnp.int32(1), key)
    assert bool(out.terminated)  # x beyond 2.4
    state = jnp.array([0.0, 0.0, 0.2094, 10.0], jnp.float32)
    out = env.step_env(state, jnp.int32(1), key)
    assert bool(out.terminated)  # theta beyond 12 deg


def _pendulum_oracle(state, u):
    max_speed, max_torque, dt, g = 8.0, 2.0, 0.05, 10.0
    theta, theta_dot = (float(v) for v in state)
    u = min(max(u, -max_torque), max_torque)
    cost = theta**2 + 0.1 * theta_dot**2 + 0.001 * u**2
    new_theta_dot = theta_dot + 3 * (g / 2 * math.sin(theta) + u) * dt
    theta = theta + new_theta_dot * dt  # unclamped (reference quirk)
    theta_dot = min(max(new_theta_dot, -max_speed), max_speed)
    theta = ((theta + math.pi) % (2 * math.pi)) - math.pi
    return np.array([theta, theta_dot]), -cost


def test_pendulum_alignment() -> None:
    env = PendulumEnv.from_config(num_envs=1)
    key = jax.random.PRNGKey(0)
    state = jnp.array([1.0, -0.5], jnp.float32)
    rng = np.random.default_rng(2)
    for _ in range(50):
        u = float(rng.uniform(-2, 2))
        out = env.step_env(state, jnp.float32([u]), key)
        expect_state, expect_rew = _pendulum_oracle(
            np.asarray(state, np.float64), u
        )
        np.testing.assert_allclose(
            np.asarray(out.state), expect_state, rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            float(out.reward), expect_rew, rtol=1e-4, atol=1e-4
        )
        state = out.state


def test_pendulum_obs_is_cos_sin() -> None:
    env = PendulumEnv.from_config(num_envs=1)
    out = env.step_env(
        jnp.array([0.7, 0.3], jnp.float32),
        jnp.float32([0.0]),
        jax.random.PRNGKey(0),
    )
    theta, theta_dot = (float(v) for v in out.state)
    np.testing.assert_allclose(
        np.asarray(out.obs["obs"]),
        [math.cos(theta), math.sin(theta), theta_dot],
        rtol=1e-6,
    )


def test_mountain_car_goal_and_wall() -> None:
    env = MountainCarEnv.from_config(num_envs=1)
    key = jax.random.PRNGKey(0)
    # At the goal with positive velocity → terminated, reward -1.
    out = env.step_env(jnp.array([0.5, 0.07], jnp.float32), jnp.int32(2), key)
    assert bool(out.terminated)
    assert float(out.reward) == -1.0
    # At the left wall moving left → velocity zeroed.
    out = env.step_env(jnp.array([-1.2, -0.05], jnp.float32), jnp.int32(0), key)
    assert float(out.state[1]) == 0.0
    assert float(out.state[0]) == np.float32(-1.2)


def test_acrobot_reward_and_termination() -> None:
    env = AcrobotEnv.from_config(num_envs=1)
    key = jax.random.PRNGKey(0)
    out = env.step_env(
        jnp.array([0.05, 0.0, 0.0, 0.0], jnp.float32), jnp.int32(1), key
    )
    assert not bool(out.terminated)
    assert float(out.reward) == -1.0
    # Raised configuration: -cos(t1) - cos(t1+t2) > 1 after one step.
    out = env.step_env(
        jnp.array([math.pi, 0.0, 0.0, 0.0], jnp.float32), jnp.int32(1), key
    )
    assert bool(out.terminated)
    assert float(out.reward) == 0.0


def test_acrobot_info_state() -> None:
    env = envpool_tpu.make("Acrobot-v1", env_type="gymnasium", num_envs=2)
    obs, info = env.reset()
    assert obs.shape == (2, 6)
    assert info["state"].shape == (2, 2)


@pytest.mark.parametrize(
    "task,act",
    [
        ("CartPole-v1", 1),
        ("MountainCar-v0", 1),
        ("Acrobot-v1", 0),
    ],
)
def test_reset_obs_within_init_range(task: str, act: int) -> None:
    env = envpool_tpu.make(task, env_type="gymnasium", num_envs=64, seed=0)
    obs, _ = env.reset()
    if task == "CartPole-v1":
        assert np.abs(obs).max() <= 0.05
    elif task == "MountainCar-v0":
        assert (obs[:, 0] >= -0.6).all() and (obs[:, 0] <= -0.4).all()
        assert (obs[:, 1] == 0).all()
    else:
        # cos components near 1, sin near 0, velocities 0.
        assert (obs[:, 0] > 0.99).all()
        assert (np.abs(obs[:, 4:]) <= 0.1 + 1e-6).all()
