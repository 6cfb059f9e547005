"""Arcade wave 7 cores: StarGunner, TimePilot, Jamesbond, WizardOfWor,
Zaxxon, BankHeist."""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.core.registry import registry

IDS = [
    "StarGunnerLite-v5", "TimePilotLite-v5", "JamesbondLite-v5",
    "WizardOfWorLite-v5", "ZaxxonLite-v5", "BankHeistLite-v5",
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


def test_stargunner_row_shot():
    env = registry._env("StarGunnerLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["ey"] = g["ey"].at[0].set(g["py"])
    g["ex"] = g["ex"].at[0].set(100.0)
    g2, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(r) == 100.0


def test_timepilot_era_bonus():
    env = registry._env("TimePilotLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    # Aim at enemy 0 and fire with 7 prior kills → kill + era bonus.
    ex, ey = float(g["ex"][0]), float(g["ey"][0])
    g["ang"] = jnp.float32(np.arctan2(ey, ex))
    g["kills"] = jnp.int32(7)
    g2, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(r) == 1100.0 and int(g2["era"]) == 2


def test_zaxxon_wall_gap():
    env = registry._env("ZaxxonLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["wall_d"] = jnp.float32(1.0)
    g["gap_alt"] = jnp.float32(3.0)
    g["alt"] = jnp.float32(3.0)  # lined up with the gap
    g2, r, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
    assert float(r) == 100.0 and int(g2["lives"]) == 3
    g["alt"] = jnp.float32(0.0)  # smack into the wall
    g3, r, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
    assert int(g3["lives"]) == 2


def test_bankheist_rob_turns_cop():
    env = registry._env("BankHeistLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    # Place the car next to bank 0 at (1, 3) and drive onto it.
    g["pr"], g["pc"] = jnp.int32(1), jnp.int32(2)
    g2, r, _ = game.tick(g, jnp.int32(3), jax.random.PRNGKey(0))  # RIGHT
    assert float(r) == 50.0 and bool(g2["is_cop"][0])


def test_wizardofwor_ray_blocked_by_wall():
    env = registry._env("WizardOfWorLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    # Player at center facing right; put a monster behind the (4,4) wall
    # on the left — ray right should NOT hit it.
    g["mpos"] = g["mpos"].at[0].set(jnp.asarray([4, 1]))
    g["dir"] = jnp.int32(1)
    g2, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))
    assert bool(g2["m_alive"][0])


def test_pool_pipeline():
    env = envpool_tpu.make(
        "ZaxxonLite-v5", env_type="gymnasium", num_envs=4, seed=0,
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
