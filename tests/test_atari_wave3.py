"""Arcade wave 3 cores: Qbert, MsPacman, BeamRider, Frostbite,
Riverraid, CrazyClimber."""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.core.registry import registry

IDS = [
    "QbertLite-v5", "MsPacmanLite-v5", "BeamRiderLite-v5",
    "FrostbiteLite-v5", "RiverraidLite-v5", "CrazyClimberLite-v5",
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
            assert np.isfinite(float(r))
        fr = np.asarray(game.render_gray(g))
        assert fr.shape == (210, 160) and len(np.unique(fr)) >= 3, tid


def test_qbert_scoring_and_round_clear():
    env = registry._env("QbertLite-v5", num_envs=1)
    game = env.game
    g = game.init(jax.random.PRNGKey(0))
    # Light a fresh cube: hop down-right from the apex → +25.
    g2, r, _ = game.tick(g, jnp.int32(2), jax.random.PRNGKey(0))
    assert float(r) == 25.0 and bool(g2["lit"][1, 1])
    # All-but-one lit: the last hop pays 25 + 100 round bonus.
    tri = np.tril(np.ones((6, 6), bool))
    lit = jnp.asarray(tri).at[1, 1].set(False)
    g = dict(g)
    g["lit"] = lit
    g3, r, _ = game.tick(g, jnp.int32(2), jax.random.PRNGKey(0))
    assert float(r) == 125.0 and not bool(jnp.any(g3["lit"]))


def test_qbert_fall_costs_life():
    env = registry._env("QbertLite-v5", num_envs=1)
    game = env.game
    g = game.init(jax.random.PRNGKey(0))
    g2, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))  # up off
    assert int(g2["lives"]) == int(g["lives"]) - 1


def test_mspacman_pellets_and_ghost():
    env = registry._env("MsPacmanLite-v5", num_envs=1)
    game = env.game
    g = game.init(jax.random.PRNGKey(0))
    # Move into a pellet cell → +10 and pellet consumed.
    g2, r, _ = game.tick(g, jnp.int32(3), jax.random.PRNGKey(0))  # left
    assert float(r) == 10.0
    assert not bool(g2["pellets"][g2["pr"], g2["pc"]])
    # Ghost on the player with no fright → life lost, positions reset.
    g = dict(g)
    g["ghosts"] = jnp.broadcast_to(
        jnp.asarray([int(g["pr"]), int(g["pc"])]), (4, 2)
    )
    g3, r, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(1))
    assert int(g3["lives"]) == 2


def test_beamrider_hit():
    env = registry._env("BeamRiderLite-v5", num_envs=1)
    game = env.game
    g = game.init(jax.random.PRNGKey(0))
    g = dict(g)
    g["e_lane"] = g["e_lane"].at[0].set(g["lane"])
    g["e_depth"] = g["e_depth"].at[0].set(0.5)
    g2, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))  # FIRE
    assert float(r) == 44.0
    assert float(g2["e_depth"][0]) == 0.0  # respawned at horizon


def test_riverraid_fuel_drains_and_bank_kills():
    env = registry._env("RiverraidLite-v5", num_envs=1)
    game = env.game
    g = game.init(jax.random.PRNGKey(0))
    g2, _, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
    assert float(g2["fuel"]) < float(g["fuel"])
    g = dict(g)
    g["px"] = jnp.float32(1.0)  # inside the bank
    g3, _, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
    assert int(g3["lives"]) == 2


def test_pool_pipeline():
    env = envpool_tpu.make(
        "MsPacmanLite-v5", env_type="gymnasium", num_envs=4, seed=0,
        max_episode_steps=100,
    )
    obs, info = env.reset()
    assert obs.shape == (4, 4, 84, 84) and obs.dtype == np.uint8
    rng = np.random.default_rng(0)
    for _ in range(10):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 9, 4).astype(np.int32)
        )
    assert np.isfinite(rew).all()
