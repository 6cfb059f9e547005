"""Arcade wave 6 cores: DemonAttack, Gopher, ChopperCommand, IceHockey,
FishingDerby, Amidar."""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.core.registry import registry

IDS = [
    "DemonAttackLite-v5", "GopherLite-v5", "ChopperCommandLite-v5",
    "IceHockeyLite-v5", "FishingDerbyLite-v5", "AmidarLite-v5",
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


def test_demon_attack_split_then_kill():
    env = registry._env("DemonAttackLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["dx"] = g["dx"].at[0].set(g["px"])
    g["dy"] = g["dy"].at[0].set(150.0)  # lowest → targeted
    # First hit on a big demon splits it (+10, still alive, now small).
    g2, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(r) == 10.0 and bool(g2["alive"][0]) and bool(g2["small"][0])
    # Second hit kills the small (+30).
    g2 = dict(g2)
    g2["fire_cool"] = jnp.int32(0)
    g2["dx"] = g2["dx"].at[0].set(g2["px"])
    g3, r, _ = game.tick(g2, jnp.int32(1), jax.random.PRNGKey(1))
    assert float(r) == 30.0 and not bool(g3["alive"][0])


def test_gopher_bonk_and_fill():
    env = registry._env("GopherLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    colw = 160.0 / 8
    g["g_col"] = jnp.int32(4)
    g["px"] = jnp.float32((4 + 0.5) * colw)
    g["depth"] = g["depth"].at[4].set(2.0)
    g2, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(r) == 20.0  # filled one unit
    assert float(g2["depth"][4]) < 2.0
    g["g_up"] = jnp.bool_(True)
    g3, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(r) == 100.0 and not bool(g3["g_up"])


def test_icehockey_goal_scores():
    env = registry._env("IceHockeyLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["bx"] = jnp.float32(80.0)
    g["by"] = jnp.float32(36.0)
    g["bvy"] = jnp.float32(-4.0)
    g2, r, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
    assert float(r) == 1.0 and int(g2["my_goals"]) == 1
    # faceoff reset
    assert abs(float(g2["by"]) - 105.0) < 1e-5


def test_fishingderby_deeper_fish_worth_more():
    env = registry._env("FishingDerbyLite-v5", num_envs=1)
    game = env.game
    for row, want in ((0, 1.0), (5, 6.0)):
        g = dict(game.init(jax.random.PRNGKey(0)))
        g["hooked"] = jnp.int32(row)
        g["hook_y"] = jnp.float32(62.4)
        g["shark_x"] = jnp.float32(-100.0)
        g2, r, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
        assert float(r) == want, (row, float(r))


def test_amidar_paints_edges():
    env = registry._env("AmidarLite-v5", num_envs=1)
    game = env.game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["er"] = jnp.zeros(5, jnp.int32)  # chasers far away (top row)
    g2, r, _ = game.tick(g, jnp.int32(3), jax.random.PRNGKey(0))  # RIGHT
    assert float(r) == 1.0  # fresh edge painted
    assert bool(g2["h_done"][5, 0])
    # retracing the same edge pays nothing
    g3, r, _ = game.tick(
        dict(g2, move_cool=jnp.int32(0)), jnp.int32(4),
        jax.random.PRNGKey(1),
    )  # LEFT back
    assert float(r) == 0.0


def test_pool_pipeline():
    env = envpool_tpu.make(
        "DemonAttackLite-v5", env_type="gymnasium", num_envs=4, seed=0,
        max_episode_steps=80,
    )
    obs, info = env.reset()
    assert obs.shape == (4, 4, 84, 84) and obs.dtype == np.uint8
    rng = np.random.default_rng(0)
    for _ in range(10):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 6, 4).astype(np.int32)
        )
    assert np.isfinite(rew).all()
