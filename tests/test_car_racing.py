"""CarRacing tests: track law, car dynamics response, pixels, rewards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.core.registry import registry
from envpool_tpu.envs.box2d import car_racing as CR


@pytest.fixture(scope="module")
def env_and_state():
    env = registry._env("CarRacing-v3", num_envs=1)
    st, obs = env.reset_env(jax.random.PRNGKey(0))
    return env, st, obs


def test_track_properties(env_and_state):
    env, st, obs = env_and_state
    n = int(jnp.sum(st["valid"]))
    assert 80 <= n < CR.MAX_TILES, n
    xy = np.asarray(st["track"])[np.asarray(st["valid"])]
    # Closed loop: consecutive points spaced ~TRACK_DETAIL_STEP; the
    # loop end returns near the start.
    gaps = np.linalg.norm(np.diff(xy, axis=0), axis=1)
    assert gaps.max() < 3 * CR.TRACK_DETAIL_STEP
    # The loop closes via the explicit wrap segment; the end-to-start
    # residual can span several detail steps (gym's glue check is
    # perpendicular-only, same here).
    assert np.linalg.norm(xy[0] - xy[-1]) < 25 * CR.TRACK_DETAIL_STEP
    # Track stays around the playfield (mild transients allowed).
    assert np.abs(xy).max() < CR.PLAYFIELD * 1.1


def test_obs_is_pixels(env_and_state):
    env, st, obs = env_and_state
    img = np.asarray(obs["obs"])
    assert img.shape == (96, 96, 3) and img.dtype == np.uint8
    # Road gray + both grass greens present in the initial view.
    colors = set(map(tuple, img.reshape(-1, 3)))
    assert (102, 102, 102) in colors, "no road pixels"
    assert any(c[1] >= 204 and c[0] == 102 for c in colors), "no grass"


def test_gas_accelerates_and_brake_stops(env_and_state):
    env, st0, _ = env_and_state
    st = dict(st0)
    step = lambda s, a: env.step_env(s, jnp.asarray(a, jnp.float32),
                                     jax.random.PRNGKey(1))
    for _ in range(30):
        out = step(st, [0.0, 1.0, 0.0])
        st = dict(out.state)
    v1 = float(jnp.hypot(st["car"]["vx"], st["car"]["vy"]))
    assert v1 > 5.0, f"gas did not accelerate (v={v1})"
    for _ in range(40):
        out = step(st, [0.0, 0.0, 1.0])
        st = dict(out.state)
    v2 = float(jnp.hypot(st["car"]["vx"], st["car"]["vy"]))
    assert v2 < v1 * 0.35, f"brake ineffective ({v1} -> {v2})"


def test_steering_turns(env_and_state):
    env, st0, _ = env_and_state
    st = dict(st0)
    for _ in range(25):
        out = env.step_env(
            st, jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
            jax.random.PRNGKey(2),
        )
        st = dict(out.state)
    th0 = float(st["car"]["th"])
    for _ in range(25):
        out = env.step_env(
            st, jnp.asarray([-1.0, 0.5, 0.0], jnp.float32),
            jax.random.PRNGKey(2),
        )
        st = dict(out.state)
    assert abs(float(st["car"]["th"]) - th0) > 0.15, "steering ineffective"


def test_tile_reward_accounting(env_and_state):
    env, st0, _ = env_and_state
    st = dict(st0)
    total = 0.0
    for _ in range(60):
        out = env.step_env(
            st, jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
            jax.random.PRNGKey(3),
        )
        st = dict(out.state)
        total += float(out.reward)
    visited = int(jnp.sum(st["visited"] & st["valid"]))
    n = int(jnp.sum(st["valid"]))
    # Driving forward along the track visits tiles: reward =
    # visited * 1000/n - 0.1 * steps.
    assert visited >= 2
    expect = visited * 1000.0 / n - 0.1 * 60
    assert abs(total - expect) < 1.0, (total, expect)


def test_registry_and_pool():
    ids = envpool_tpu.list_all_envs()
    assert "CarRacing-v2" in ids and "CarRacing-v3" in ids
    env = envpool_tpu.make(
        "CarRacing-v3", env_type="gymnasium", num_envs=2, seed=0,
        max_episode_steps=20,
    )
    obs, info = env.reset()
    assert obs.shape == (2, 96, 96, 3) and obs.dtype == np.uint8
    for _ in range(5):
        obs, rew, term, trunc, info = env.step(
            np.tile(np.asarray([[0.0, 1.0, 0.0]], np.float32), (2, 1))
        )
    assert np.isfinite(rew).all()
