"""Arcade wave 4 cores: Tennis, Assault, Atlantis, Kangaroo, UpNDown,
RoadRunner."""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.core.registry import registry

IDS = [
    "TennisLite-v5", "AssaultLite-v5", "AtlantisLite-v5",
    "KangarooLite-v5", "UpNDownLite-v5", "RoadRunnerLite-v5",
]


def test_ids_registered():
    ids = set(envpool_tpu.list_all_envs())
    assert all(t in ids for t in IDS)


def test_cores_run_and_render():
    for tid in IDS:
        env = registry._env(tid, num_envs=1)
        game = env.game
        g = game.init(jax.random.PRNGKey(0))
        tick = jax.jit(game.tick)
        rng = np.random.default_rng(0)
        for t in range(120):
            g, r, over = tick(
                g, jnp.int32(rng.integers(0, game.action_set_size)),
                jax.random.PRNGKey(t),
            )
            assert np.isfinite(float(r)), tid
        fr = np.asarray(game.render_gray(g))
        assert fr.shape == (210, 160) and len(np.unique(fr)) >= 3, tid


def test_tennis_point_on_missed_return():
    env = registry._env("TennisLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    # Ball sailing past the player's baseline → opponent point, -1.
    g["serving"] = jnp.bool_(False)
    g["by"] = jnp.float32(194.5)
    g["bvy"] = jnp.float32(2.0)
    g["bx"] = jnp.float32(30.0)
    g["px"] = jnp.float32(140.0)  # far from the ball
    g2, r, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
    assert float(r) == -1.0 and int(g2["o_pts"]) == 1


def test_assault_overheat_blocks_fire():
    env = registry._env("AssaultLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["heat"] = jnp.float32(1.1)
    g["ex"] = g["ex"].at[0].set(g["px"])  # target directly overhead
    g2, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(r) == 0.0 and bool(g2["alive"][0])
    g["heat"] = jnp.float32(0.0)
    g3, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(r) > 0.0 and not bool(g3["alive"][0])


def test_atlantis_city_loss_ends_game():
    env = registry._env("AtlantisLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["city"] = jnp.zeros(6, bool).at[0].set(True)
    g["passes"] = jnp.full(4, 3, jnp.int32)
    g["sx"] = jnp.full(4, np.float32(1e9))  # force wrap → bombing pass
    g2, r, over = game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
    assert not bool(g2["city"][0]) and bool(over)


def test_kangaroo_climb_scores():
    env = registry._env("KangarooLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["px"] = jnp.float32(160.0 - 16.0)  # at floor-0 ladder (right end)
    g["m_alive"] = jnp.zeros(3, bool)
    g2, r, _ = game.tick(g, jnp.int32(2), jax.random.PRNGKey(0))  # UP
    assert int(g2["floor"]) == 1 and float(r) >= 200.0


def test_pool_pipeline():
    env = envpool_tpu.make(
        "AssaultLite-v5", env_type="gymnasium", num_envs=4, seed=0,
        max_episode_steps=80,
    )
    obs, info = env.reset()
    assert obs.shape == (4, 4, 84, 84) and obs.dtype == np.uint8
    rng = np.random.default_rng(0)
    for _ in range(10):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 7, 4).astype(np.int32)
        )
    assert np.isfinite(rew).all()
