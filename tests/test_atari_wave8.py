"""Arcade wave 8 cores: Alien, Berzerk, Venture, Kaboom, Krull,
Pitfall."""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.core.registry import registry

IDS = [
    "AlienLite-v5", "BerzerkLite-v5", "VentureLite-v5",
    "KaboomLite-v5", "KrullLite-v5", "PitfallLite-v5",
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


def test_alien_egg_and_flame():
    env = registry._env("AlienLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    # Step right onto an egg cell → +10.
    g2, r, _ = game.tick(g, jnp.int32(3), jax.random.PRNGKey(0))
    assert float(r) == 10.0
    # With the flame up, an adjacent alien does not catch the player.
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["apos"] = g["apos"].at[0].set(jnp.asarray([8, 2]))
    g["flame"] = jnp.float32(5.0)
    g3, _, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(1))
    assert int(g3["lives"]) == 3


def test_berzerk_shot_and_otto():
    env = registry._env("BerzerkLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["rx"] = g["rx"].at[0].set(g["px"] + 30.0)
    g["ry"] = g["ry"].at[0].set(g["py"])
    g2, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))  # FIRE
    assert float(r) == 50.0 and not bool(g2["r_alive"][0])
    # Otto is invincible and kills on contact once the timer expires.
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["otto_t"] = jnp.float32(0.0)
    g["otto_x"], g["otto_y"] = g["px"], g["py"]
    g3, _, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(1))
    assert int(g3["lives"]) == 2


def test_kaboom_catch_and_miss():
    env = registry._env("KaboomLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["bx"] = g["bx"].at[0].set(g["px"])
    g["by"] = g["by"].at[0].set(182.0)
    g["b_live"] = g["b_live"].at[0].set(True)
    g2, r, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
    assert float(r) > 0.0
    # A miss (far from the paddle) costs a bucket.
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["bx"] = g["bx"].at[0].set(10.0)
    g["px"] = jnp.float32(140.0)
    g["by"] = g["by"].at[0].set(196.0)
    g["b_live"] = g["b_live"].at[0].set(True)
    g3, _, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(1))
    assert int(g3["buckets"]) == 2


def test_krull_glaive_returns():
    env = registry._env("KrullLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["s_alive"] = jnp.zeros(4, bool)  # no spiders in the way
    st, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))  # throw
    assert bool(st["g_out"])
    for t in range(120):
        st, r, _ = game.tick(
            dict(st, s_alive=jnp.zeros(4, bool)), jnp.int32(0),
            jax.random.PRNGKey(t),
        )
        if not bool(st["g_out"]):
            break
    assert not bool(st["g_out"])  # came back to the hero


def test_pitfall_treasure_and_log():
    env = registry._env("PitfallLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["treas_x"] = jnp.float32(23.0)
    g["hx"] = jnp.full(3, np.float32(500.0))
    g2, r, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
    assert float(r) == 2000.0
    # A log at the runner's feet while grounded loses points.
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["hx"] = g["hx"].at[0].set(20.0)
    g["htype"] = g["htype"].at[0].set(1)
    g["treas_x"] = jnp.float32(500.0)
    g3, r, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(1))
    assert float(r) == -100.0


def test_pool_pipeline():
    env = envpool_tpu.make(
        "BerzerkLite-v5", env_type="gymnasium", num_envs=4, seed=0,
        max_episode_steps=80,
    )
    obs, info = env.reset()
    assert obs.shape == (4, 4, 84, 84) and obs.dtype == np.uint8
    rng = np.random.default_rng(0)
    for _ in range(10):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 18, 4).astype(np.int32)
        )
    assert np.isfinite(rew).all()
