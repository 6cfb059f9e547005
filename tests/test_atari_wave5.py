"""Arcade wave 5 (completes the Atari-5 subset): BattleZone,
DoubleDunk, NameThisGame, Phoenix."""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.core.registry import registry

IDS = [
    "BattleZoneLite-v5", "DoubleDunkLite-v5", "NameThisGameLite-v5",
    "PhoenixLite-v5",
]


def test_atari5_subset_complete():
    ids = set(envpool_tpu.list_all_envs())
    atari5 = IDS[:2] + ["NameThisGameLite-v5", "PhoenixLite-v5",
                        "QbertLite-v5"]
    assert all(t in ids for t in atari5)


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


def test_battlezone_aimed_shot_kills():
    env = registry._env("BattleZoneLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    # Aim exactly at tank 0 and fire.
    ex, ey = float(g["ex"][0]), float(g["ey"][0])
    g["ang"] = jnp.float32(np.arctan2(ey, ex))
    g2, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(r) == 1000.0
    assert bool(g2["e_alive"][0])  # respawned on the horizon ring
    assert float(jnp.hypot(g2["ex"][0], g2["ey"][0])) > 60.0


def test_doubledunk_made_shot_scores():
    env = registry._env("DoubleDunkLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    # Shoot from point blank: land the shot deterministically-enough by
    # placing the shot origin at the hoop (p(make) ~ 0.95).
    g["px"], g["py"] = jnp.float32(80.0), jnp.float32(55.0)
    g2, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))  # FIRE
    assert float(g2["shot_t"]) > 0  # ball in flight
    made = 0
    st = g2
    for t in range(20):
        st, r, _ = game.tick(st, jnp.int32(0), jax.random.PRNGKey(t + 7))
        made += float(r)
        if float(st["shot_t"]) == 0:
            break
    assert made in (0.0, 2.0, 3.0)


def test_phoenix_shield_blocks():
    env = registry._env("PhoenixLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    # A swooping bird on top of the ship: without shield, life lost.
    g["bx"] = g["bx"].at[0].set(g["px"])
    g["by"] = g["by"].at[0].set(185.0)
    g["swoop"] = g["swoop"].at[0].set(5.0)
    g2, _, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(3))
    assert int(g2["lives"]) == 3
    # With the shield up, no life lost.
    g["shield"] = jnp.float32(10.0)
    g3, _, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(3))
    assert int(g3["lives"]) == 4


def test_namethisgame_oxygen():
    env = registry._env("NameThisGameLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["px"] = jnp.float32(float(g["hose_x"]) + 60.0)  # away from hose
    g["shark_x"] = jnp.float32(-100.0)
    g2, _, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
    assert float(g2["oxy"]) < float(g["oxy"])
    g["px"] = g["hose_x"]
    g["oxy"] = jnp.float32(50.0)
    g3, _, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
    assert float(g3["oxy"]) > 50.0


def test_pool_pipeline():
    env = envpool_tpu.make(
        "PhoenixLite-v5", env_type="gymnasium", num_envs=4, seed=0,
        max_episode_steps=80,
    )
    obs, info = env.reset()
    assert obs.shape == (4, 4, 84, 84) and obs.dtype == np.uint8
    rng = np.random.default_rng(0)
    for _ in range(10):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 8, 4).astype(np.int32)
        )
    assert np.isfinite(rew).all()
