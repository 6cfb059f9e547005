"""BipedalWalker tests: invariants + Box2D-oracle behavioral alignment.

The dynamics are penalty-based Lagrangian (not bit-exact vs Box2D's
impulse solver); alignment is at the behavior level: obs layout/scale,
terrain law, settling behavior, reward accounting, terminals.
"""

import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.core.registry import registry


def test_registry_and_spec():
    ids = envpool_tpu.list_all_envs()
    assert "BipedalWalker-v3" in ids
    assert "BipedalWalkerHardcore-v3" in ids
    spec = envpool_tpu.make_spec("BipedalWalker-v3", num_envs=1)
    assert spec.state_array_spec["obs"].shape == (24,)
    assert spec.action_array_spec["action"].shape == (4,)


def test_terrain_law():
    import jax

    from envpool_tpu.envs.box2d.bipedal_walker import (
        TERRAIN_HEIGHT,
        TERRAIN_STARTPAD,
    )

    env = registry._env("BipedalWalker-v3", num_envs=1)
    t = np.asarray(env._generate_terrain(jax.random.PRNGKey(0)))
    assert t.shape == (200,)
    # Startpad is flat at TERRAIN_HEIGHT.
    np.testing.assert_allclose(
        t[: TERRAIN_STARTPAD], TERRAIN_HEIGHT, atol=1e-5
    )
    # Mean-reverting walk stays near TERRAIN_HEIGHT.
    assert abs(t.mean() - TERRAIN_HEIGHT) < 1.5
    assert t.std() < 2.0
    # Hardcore terrain has larger variation (stumps/pits/stairs).
    hard = registry._env("BipedalWalkerHardcore-v3", num_envs=1)
    th = np.asarray(hard._generate_terrain(jax.random.PRNGKey(0)))
    assert th.std() > t.std() * 0.8


def test_collapse_terminates_cleanly():
    """Zero action: motors off → the walker collapses (gym behavior)
    and the episode ends on hull contact, with no NaN and physical
    speeds throughout."""
    import jax
    import jax.numpy as jnp

    env = registry._env("BipedalWalker-v3", num_envs=1)
    key = jax.random.PRNGKey(1)
    st, obs = env.reset_env(key)
    step = jax.jit(
        lambda s, a, k: env.step_env(s, a, k), static_argnums=()
    ) if False else env.step_env
    ended = False
    for t in range(300):
        out = env.step_env(st, jnp.zeros(4, jnp.float32), key)
        st = out.state
        q = np.asarray(st["q"])
        assert np.isfinite(q).all(), f"NaN at step {t}"
        speed = np.linalg.norm(np.asarray(st["qd"][:2]))
        assert speed < 25.0, f"unphysical speed {speed} at step {t}"
        if bool(out.terminated):
            ended = True
            assert float(out.reward) == -100.0
            break
    assert ended, "collapse never terminated the episode"


def test_obs_layout_matches_gym_oracle():
    Box2D = pytest.importorskip("Box2D")
    import gymnasium as gym

    genv = gym.make("BipedalWalker-v3")
    gobs, _ = genv.reset(seed=0)
    env = envpool_tpu.make(
        "BipedalWalker-v3", env_type="gymnasium", num_envs=2, seed=0
    )
    obs, info = env.reset()
    assert obs.shape[1:] == gobs.shape
    # Same layout semantics at reset: near-zero hull angle, lidar in
    # (0, 1], hip angles small, knee-angle feature offset by +1.
    assert abs(obs[0, 0]) < 0.2 and abs(gobs[0]) < 0.2
    assert (obs[:, 14:] > 0).all() and (obs[:, 14:] <= 1.0).all()
    assert (gobs[14:] > 0).all() and (gobs[14:] <= 1.0).all()
    assert abs(obs[0, 6] - 1.0) < 0.7 and abs(gobs[6] - 1.0) < 0.7
    genv.close()


def test_reward_accounting_matches_formula():
    """reward = Δshaping − 0.00035·TORQUE·Σ|a| away from terminals."""
    import jax
    import jax.numpy as jnp

    from envpool_tpu.envs.box2d.bipedal_walker import MOTORS_TORQUE, SCALE

    env = registry._env("BipedalWalker-v3", num_envs=1)
    key = jax.random.PRNGKey(2)
    st, _ = env.reset_env(key)
    a = jnp.asarray([0.3, -0.2, 0.1, 0.4])
    out = env.step_env(st, a, key)
    q = np.asarray(out.state["q"])
    shaping = 130 * q[0] / SCALE - 5.0 * abs(q[2])
    expect = (
        shaping
        - float(st["prev_shaping"])
        - 0.00035 * MOTORS_TORQUE * float(np.abs(np.asarray(a)).sum())
    )
    if not bool(out.terminated):
        np.testing.assert_allclose(float(out.reward), expect, atol=1e-4)


def test_fall_gives_minus_100():
    import jax
    import jax.numpy as jnp

    env = registry._env("BipedalWalker-v3", num_envs=1)
    key = jax.random.PRNGKey(3)
    st, _ = env.reset_env(key)
    # Teleport the hull into the ground: hull contact → game over.
    st = dict(st)
    st["q"] = st["q"].at[1].set(0.0)
    out = env.step_env(st, jnp.zeros(4, jnp.float32), key)
    assert bool(out.terminated)
    assert float(out.reward) == -100.0


def test_pool_runs_and_truncates():
    env = envpool_tpu.make(
        "BipedalWalker-v3", env_type="gymnasium", num_envs=4, seed=0,
        max_episode_steps=40,
    )
    obs, info = env.reset()
    done_seen = False
    for t in range(45):
        obs, rew, term, trunc, info = env.step(
            np.random.default_rng(t).uniform(-1, 1, (4, 4)).astype(np.float32)
        )
        done_seen = done_seen or bool((term | trunc).any())
    assert done_seen
