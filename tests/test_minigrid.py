"""MiniGrid family tests."""

import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.envs.minigrid import core as mg

import jax
import jax.numpy as jnp


def test_empty_scripted_walk() -> None:
    env = envpool_tpu.make(
        "MiniGrid-Empty-5x5-v0", env_type="gymnasium", num_envs=2, seed=0
    )
    obs, info = env.reset()
    assert obs["image"].shape == (2, 7, 7, 3)
    assert (obs["direction"] == 0).all()
    np.testing.assert_array_equal(info["agent_pos"][0], [1, 1])
    # forward x2, turn right, forward x2 → goal at (3,3).
    for a in [2, 2, 1, 2, 2]:
        obs, rew, term, trunc, info = env.step(np.full(2, a, np.int32))
    assert term.all()
    np.testing.assert_allclose(rew, 1.0 - 0.9 * 5 / 100, rtol=1e-6)


def test_view_shows_walls_and_visibility() -> None:
    env_cls = envpool_tpu.make_spec(
        "MiniGrid-Empty-5x5-v0", num_envs=1
    ).env
    key = jax.random.PRNGKey(0)
    st, obs = env_cls.reset_env(key)
    img = np.asarray(obs["obs:image"])
    # Agent cell (3, 6) is its own floor (empty).
    assert img[3, 6, 0] in (mg.EMPTY, 0)
    # In a 5x5 grid from (1,1) facing right, walls are visible ahead.
    assert (img[:, :, 0] == mg.WALL).any()
    # Goal (green) somewhere in view.
    assert (img[:, :, 0] == mg.GOAL).any()


def test_turn_semantics() -> None:
    env = envpool_tpu.make(
        "MiniGrid-Empty-5x5-v0", env_type="gymnasium", num_envs=1, seed=0
    )
    obs, _ = env.reset()
    obs, *_ = env.step(np.array([1], np.int32))  # right
    assert obs["direction"][0] == 1
    obs, *_ = env.step(np.array([0], np.int32))  # left
    assert obs["direction"][0] == 0
    obs, *_ = env.step(np.array([0], np.int32))  # left wraps
    assert obs["direction"][0] == 3


def test_lava_terminates_with_zero() -> None:
    env = envpool_tpu.make(
        "MiniGrid-DistShift1-v0", env_type="gymnasium", num_envs=1, seed=0
    )
    env.reset()
    # DistShift1: lava at row 2, cols 3-5; agent (1,1) facing right.
    # forward x2 → (3,1); turn right (dir=down); forward → lava at (3,2).
    rew = None
    for a in [2, 2, 1, 2]:
        obs, rew, term, trunc, info = env.step(np.array([a], np.int32))
    assert term[0]
    assert rew[0] == 0.0


def test_doorkey_pickup_and_unlock() -> None:
    """Key pickup → toggle locked door → opens."""
    from envpool_tpu.envs.minigrid import core

    grid = core.empty_grid(6, 6)
    grid = core.set_cell(grid, 3, 1, core.DOOR, core.YELLOW, core.LOCKED)
    grid = core.set_cell(grid, 2, 1, core.KEY, core.YELLOW)
    pos = jnp.asarray([1, 1], jnp.int32)
    d = jnp.int32(0)  # facing right at the key
    carrying = jnp.asarray([core.EMPTY, 0], jnp.int8)
    # Pickup key.
    grid, pos, d, carrying, goal, lava = core.step_agent(
        grid, pos, d, carrying, jnp.int32(core.PICKUP)
    )
    assert int(carrying[0]) == core.KEY
    assert int(grid[1, 2, 0]) == core.EMPTY
    # Move forward to (2,1), door now in front at (3,1).
    grid, pos, d, carrying, *_ = core.step_agent(
        grid, pos, d, carrying, jnp.int32(core.FORWARD)
    )
    # Toggle → unlocks.
    grid, pos, d, carrying, *_ = core.step_agent(
        grid, pos, d, carrying, jnp.int32(core.TOGGLE)
    )
    assert int(grid[1, 3, 2]) == core.OPEN
    # Walk through.
    grid, pos, d, carrying, *_ = core.step_agent(
        grid, pos, d, carrying, jnp.int32(core.FORWARD)
    )
    np.testing.assert_array_equal(np.asarray(pos), [3, 1])


def test_registration_count() -> None:
    tasks = [t for t in envpool_tpu.list_all_envs() if "MiniGrid" in t]
    assert len(tasks) == 22


def test_determinism_random_tasks() -> None:
    def run(task):
        env = envpool_tpu.make(task, env_type="gymnasium", num_envs=4, seed=3)
        obs, info = env.reset()
        return np.asarray(obs["image"])

    for task in ["MiniGrid-DoorKey-5x5-v0", "MiniGrid-FourRooms-v0"]:
        np.testing.assert_array_equal(run(task), run(task))


def test_babyai_goto_obj() -> None:
    env = envpool_tpu.make(
        "BabyAI-GoToObj-v0", env_type="gymnasium", num_envs=8, seed=0
    )
    obs, info = env.reset()
    # Mission id encodes color*8 + object type (key/ball/box = 5/6/7).
    assert all(m % 8 in (5, 6, 7) for m in info["mission_id"].tolist())
    rng = np.random.default_rng(0)
    succ = 0
    for _ in range(200):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 3, 8).astype(np.int32)
        )
        succ += int((rew > 0).sum())
    assert succ > 0  # random walk eventually faces the object


def test_babyai_goto_door_missions() -> None:
    env = envpool_tpu.make(
        "BabyAI-GoToDoor-v0", env_type="gymnasium", num_envs=8, seed=1
    )
    obs, info = env.reset()
    assert all(m % 8 == mg.DOOR for m in info["mission_id"].tolist())
