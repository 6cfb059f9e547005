"""Procgen family tests: 50-id parity + per-game behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.core.registry import registry

REF_IDS = [
    "BigfishEasy-v0", "BigfishHard-v0", "BossfightEasy-v0",
    "BossfightHard-v0", "CaveflyerEasy-v0", "CaveflyerExploration-v0",
    "CaveflyerHard-v0", "CaveflyerMemory-v0", "ChaserEasy-v0",
    "ChaserHard-v0", "ChaserExtreme-v0", "ClimberEasy-v0",
    "ClimberExploration-v0", "ClimberHard-v0", "CoinrunEasy-v0",
    "CoinrunExploration-v0", "CoinrunHard-v0", "DodgeballEasy-v0",
    "DodgeballHard-v0", "DodgeballExtreme-v0", "DodgeballMemory-v0",
    "FruitbotEasy-v0", "FruitbotHard-v0", "HeistEasy-v0",
    "HeistExploration-v0", "HeistHard-v0", "HeistMemory-v0",
    "JumperEasy-v0", "JumperExploration-v0", "JumperHard-v0",
    "JumperMemory-v0", "LeaperEasy-v0", "LeaperExploration-v0",
    "LeaperHard-v0", "LeaperExtreme-v0", "MazeEasy-v0",
    "MazeExploration-v0", "MazeHard-v0", "MazeMemory-v0", "MinerEasy-v0",
    "MinerHard-v0", "MinerMemory-v0", "NinjaEasy-v0",
    "NinjaExploration-v0", "NinjaHard-v0", "PlunderEasy-v0",
    "PlunderHard-v0", "StarpilotEasy-v0", "StarpilotHard-v0",
    "StarpilotExtreme-v0",
]


def test_50_ids():
    ids = set(envpool_tpu.list_all_envs())
    missing = [t for t in REF_IDS if t not in ids]
    assert not missing, missing


def test_maze_generation_connected():
    """The DFS maze has a path start→goal (BFS reachability check)."""
    from collections import deque

    env = registry._env("MazeHard-v0", num_envs=1)
    for seed in range(3):
        st, obs = env.reset_env(jax.random.PRNGKey(seed))
        walls = np.asarray(st["g"]["walls"])
        goal = tuple(np.asarray(st["g"]["goal"]))
        start = (1, 1)
        n = walls.shape[0]
        seen = {start}
        q = deque([start])
        while q:
            r, c = q.popleft()
            for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                nr, nc = r + dr, c + dc
                if (
                    0 <= nr < n and 0 <= nc < n
                    and not walls[nr, nc]
                    and (nr, nc) not in seen
                ):
                    seen.add((nr, nc))
                    q.append((nr, nc))
        assert goal in seen, f"seed {seed}: goal unreachable"


def test_maze_goal_reward():
    env = registry._env("MazeEasy-v0", num_envs=1)
    st, _ = env.reset_env(jax.random.PRNGKey(0))
    g = dict(st["g"])
    # Teleport next to the goal and step onto it.
    goal = np.asarray(g["goal"])
    g["pos"] = jnp.asarray(goal, jnp.int32)
    st = dict(st)
    st["g"] = g
    out = env.step_env(st, jnp.int32(4), jax.random.PRNGKey(1))  # idle
    assert float(out.reward) == 10.0 and bool(out.terminated)


def test_heist_key_order():
    env = registry._env("HeistEasy-v0", num_envs=1)
    st, _ = env.reset_env(jax.random.PRNGKey(0))
    game = env.game
    g = dict(st["g"])
    # Standing on key 2 without keys 0/1 does not collect it.
    g["pos"] = g["keys"][2]
    g2, r, done = game.tick(g, jnp.int32(4), jax.random.PRNGKey(1))
    assert not bool(g2["have"][2])
    # With keys 0 and 1 held it does.
    g["have"] = g["have"].at[0].set(True).at[1].set(True)
    g3, r, done = game.tick(g, jnp.int32(4), jax.random.PRNGKey(1))
    assert bool(g3["have"][2])


def test_bigfish_eat_and_be_eaten():
    env = registry._env("BigfishEasy-v0", num_envs=1)
    game = env.game
    st, _ = env.reset_env(jax.random.PRNGKey(0))
    g = dict(st["g"])
    # Put a smaller fish on the player.
    g["ents"] = g["ents"].at[0].set(
        jnp.asarray([*np.asarray(g["p"]), 0.0, 0.0, 0.5])
    )
    g["alive"] = g["alive"].at[0].set(True)
    g2, r, done = game.tick(g, jnp.int32(4), jax.random.PRNGKey(1))
    assert float(r) >= 1.0 and not bool(done)
    assert float(g2["size"]) > float(g["size"])
    # A bigger fish ends the episode.
    g["ents"] = g["ents"].at[0].set(
        jnp.asarray([*np.asarray(g["p"]), 0.0, 0.0, 7.0])
    )
    g3, r, done = game.tick(g, jnp.int32(4), jax.random.PRNGKey(2))
    assert bool(done)


def test_coinrun_reach_goal():
    env = registry._env("CoinrunEasy-v0", num_envs=1)
    game = env.game
    st, _ = env.reset_env(jax.random.PRNGKey(0))
    g = dict(st["g"])
    g["x"] = jnp.float32(15.0)
    g2, r, done = game.tick(g, jnp.int32(7), jax.random.PRNGKey(1))
    assert float(r) == 10.0 and bool(done)


def test_leaper_car_hit():
    env = registry._env("LeaperEasy-v0", num_envs=1)
    game = env.game
    st, _ = env.reset_env(jax.random.PRNGKey(0))
    g = dict(st["g"])
    g["row"] = jnp.int32(1)
    g["x"] = g["cars"][0]
    g2, r, done = game.tick(g, jnp.int32(4), jax.random.PRNGKey(1))
    assert bool(done) and float(r) == 0.0


def test_level_window_config():
    env = registry._env(
        "MazeEasy-v0", num_envs=1, num_levels=5, start_level=100
    )
    for seed in range(4):
        st, obs = env.reset_env(jax.random.PRNGKey(seed))
        lvl = int(st["lvl"])
        assert 100 <= lvl < 105


def test_pool_obs_and_terminals():
    env = envpool_tpu.make(
        "StarpilotEasy-v0", env_type="gymnasium", num_envs=4, seed=0,
        max_episode_steps=60,
    )
    obs, info = env.reset()
    assert obs.shape == (4, 64, 64, 3) and obs.dtype == np.uint8
    assert "level_seed" in info
    rng = np.random.default_rng(0)
    for _ in range(20):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 15, 4).astype(np.int32)
        )
    assert np.isfinite(rew).all()
