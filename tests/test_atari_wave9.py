"""Arcade wave 9 cores: Centipede, MontezumaRevenge, Hero, Gravitar,
Pooyan, Carnival."""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.core.registry import registry

IDS = [
    "CentipedeLite-v5", "MontezumaRevengeLite-v5", "HeroLite-v5",
    "GravitarLite-v5", "PooyanLite-v5", "CarnivalLite-v5",
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


def test_centipede_shot_leaves_mushroom():
    env = registry._env("CentipedeLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    colw = 160.0 / 16
    g["seg_col"] = g["seg_col"].at[0].set(8.0)
    g["px"] = jnp.float32((8.0 + 0.5) * colw)
    g2, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(r) == 10.0 and not bool(g2["seg_alive"][0])
    assert bool(g2["mush"][0, 8])


def test_montezuma_key_then_door():
    env = registry._env("MontezumaRevengeLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    # Teleport to the key.
    g["px"] = jnp.float32(game._KEY_POS[0])
    g["py"] = jnp.float32(game._KEY_POS[1])
    g2, r, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
    assert float(r) == 100.0 and bool(g2["has_key"])
    # Door without the key pays nothing; with it, +300 and room++.
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["px"] = jnp.float32(game._DOOR_X)
    g["py"] = jnp.float32(game._PLAT[0])
    g3, r, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
    assert float(r) == 0.0
    g["has_key"] = jnp.bool_(True)
    g4, r, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
    assert float(r) == 300.0 and int(g4["room"]) == 2


def test_hero_dynamite_opens_shaft():
    env = registry._env("HeroLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["px"] = g["wall_x"][0]
    g["py"] = jnp.float32(140.0)
    g2, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(r) == 75.0 and not bool(g2["wall_up"][0])


def test_gravitar_gravity_pulls_down():
    env = registry._env("GravitarLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["vx"] = jnp.float32(0.0)
    g2, _, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
    assert float(g2["vy"]) > float(g["vy"])


def test_carnival_ammo_is_the_clock():
    env = registry._env("CarnivalLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["ammo"] = jnp.float32(1.0)
    g["t_live"] = jnp.zeros(9, bool).at[0].set(True)
    g["tx"] = g["tx"].at[0].set(90.0)
    g["px"] = jnp.float32(10.0)          # a miss, far from the target
    g2, _, over = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))
    assert bool(over)  # last shot spent


def test_pool_pipeline():
    env = envpool_tpu.make(
        "MontezumaRevengeLite-v5", env_type="gymnasium", num_envs=4,
        seed=0, max_episode_steps=80,
    )
    obs, info = env.reset()
    assert obs.shape == (4, 4, 84, 84) and obs.dtype == np.uint8
    rng = np.random.default_rng(0)
    for _ in range(10):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 18, 4).astype(np.int32)
        )
    assert np.isfinite(rew).all()
