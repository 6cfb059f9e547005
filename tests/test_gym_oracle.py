"""Lockstep alignment vs the real gymnasium implementations.

Beyond the reference-formula oracles in test_classic_control.py, these
tests step the actual gymnasium CPU envs from injected identical states —
the reference's alignment-test strategy (SURVEY.md §4.5) applied with
gymnasium itself as the oracle.  Pendulum is excluded: the reference (and
hence this build) wraps theta and integrates with the unclamped velocity,
a documented deviation from gymnasium (see pendulum.py docstring).
"""

import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from envpool_tpu.envs.classic_control import (  # noqa: E402
    AcrobotEnv,
    CartPoleEnv,
    MountainCarEnv,
)


def test_cartpole_matches_gymnasium() -> None:
    ref = gym.make("CartPole-v1").unwrapped
    ref.reset(seed=0)
    ours = CartPoleEnv.from_config(num_envs=1)
    state = jnp.asarray(ref.state, jnp.float32)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    for _ in range(40):
        a = int(rng.integers(0, 2))
        obs_ref, rew_ref, term_ref, trunc_ref, _ = ref.step(a)
        out = ours.step_env(state, jnp.int32(a), key)
        np.testing.assert_allclose(
            np.asarray(out.state), np.asarray(ref.state, np.float64),
            rtol=1e-4, atol=1e-5,
        )
        assert bool(out.terminated) == bool(term_ref)
        state = out.state
        if term_ref:
            break


def test_mountain_car_matches_gymnasium() -> None:
    ref = gym.make("MountainCar-v0").unwrapped
    ref.reset(seed=1)
    ours = MountainCarEnv.from_config(num_envs=1)
    state = jnp.asarray(ref.state, jnp.float32)
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(0)
    for _ in range(100):
        a = int(rng.integers(0, 3))
        ref.step(a)
        out = ours.step_env(state, jnp.int32(a), key)
        np.testing.assert_allclose(
            np.asarray(out.state), np.asarray(ref.state, np.float64),
            rtol=1e-4, atol=1e-6,
        )
        state = out.state


def test_acrobot_matches_gymnasium() -> None:
    ref = gym.make("Acrobot-v1").unwrapped
    ref.reset(seed=2)
    ours = AcrobotEnv.from_config(num_envs=1)
    state = jnp.asarray(ref.state, jnp.float32)
    rng = np.random.default_rng(2)
    key = jax.random.PRNGKey(0)
    for t in range(30):
        a = int(rng.integers(0, 3))
        ref.step(a)
        out = ours.step_env(state, jnp.int32(a), key)
        # RK4 with trig — float32 drift accumulates; lockstep resync.
        np.testing.assert_allclose(
            np.asarray(out.state), np.asarray(ref.state, np.float64),
            rtol=2e-3, atol=2e-4,
        )
        state = jnp.asarray(ref.state, jnp.float32)
