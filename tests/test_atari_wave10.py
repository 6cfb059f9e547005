"""Arcade waves 10-11: the ten cores completing the Atari-57 roster
(Asteroids, Defender, KungFuMaster, PrivateEye, Robotank, Solaris,
Surround, Tutankham, VideoPinball, YarsRevenge)."""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.core.registry import registry

IDS = [
    "AsteroidsLite-v5", "DefenderLite-v5", "KungFuMasterLite-v5",
    "PrivateEyeLite-v5", "RobotankLite-v5", "SolarisLite-v5",
    "SurroundLite-v5", "TutankhamLite-v5", "VideoPinballLite-v5",
    "YarsRevengeLite-v5",
]


def test_ids_registered_and_atari57_complete():
    ids = set(envpool_tpu.list_all_envs())
    assert all(t in ids for t in IDS)
    lite = {
        i.replace("Lite-v5", "").lower() for i in ids if i.endswith("Lite-v5")
    }
    atari57 = [
        "alien", "amidar", "assault", "asterix", "asteroids", "atlantis",
        "bankheist", "battlezone", "beamrider", "berzerk", "bowling",
        "boxing", "breakout", "centipede", "choppercommand", "crazyclimber",
        "defender", "demonattack", "doubledunk", "enduro", "fishingderby",
        "freeway", "frostbite", "gopher", "gravitar", "hero", "icehockey",
        "jamesbond", "kangaroo", "krull", "kungfumaster",
        "montezumarevenge", "mspacman", "namethisgame", "phoenix",
        "pitfall", "pong", "privateeye", "qbert", "riverraid",
        "roadrunner", "robotank", "seaquest", "skiing", "solaris",
        "spaceinvaders", "stargunner", "surround", "tennis", "timepilot",
        "tutankham", "upndown", "venture", "videopinball", "wizardofwor",
        "yarsrevenge", "zaxxon",
    ]
    assert [g for g in atari57 if g not in lite] == []


def test_cores_run_and_render():
    for tid in IDS:
        env = registry._env(tid, num_envs=1)
        game = env.game
        g = game.init(jax.random.PRNGKey(0))
        tick = jax.jit(game.tick)
        rng = np.random.default_rng(0)
        for t in range(100):
            g, r, over = tick(
                g, jnp.int32(rng.integers(0, game.action_set_size)),
                jax.random.PRNGKey(t),
            )
            assert np.isfinite(float(r)), tid
        fr = np.asarray(game.render_gray(g))
        assert fr.shape == (210, 160) and len(np.unique(fr)) >= 3, tid


def test_asteroids_shot_splits_big_rock():
    game = registry._env("AsteroidsLite-v5", num_envs=1).game
    g = dict(game.init(jax.random.PRNGKey(0)))
    # Park a big rock dead ahead and fire.
    g["rock"] = g["rock"].at[0].set(jnp.asarray([100.0, 105.0]))
    g["rvel"] = jnp.zeros_like(g["rvel"])
    g["px"] = jnp.float32(80.0)
    g["py"] = jnp.float32(105.0)
    g["pang"] = jnp.float32(0.0)  # facing +x
    n_alive0 = int(np.sum(np.asarray(g["ralive"])))
    r_total = 0.0
    for t in range(12):
        g, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(t))
        r_total += float(r)
    assert r_total >= 20.0  # big rock worth 20
    # Split spawned a small rock: alive count did not decrease.
    assert int(np.sum(np.asarray(g["ralive"]))) >= n_alive0


def test_robotank_hit_requires_aim():
    game = registry._env("RobotankLite-v5", num_envs=1).game
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["eb"] = g["eb"].at[0].set(0.0)
    g["heading"] = jnp.float32(0.0)   # enemy 0 dead center
    g2, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(1))
    assert float(r) == 1.0 and not bool(g2["elive"][0])
    # Aimed far off: no hit.
    g["heading"] = jnp.float32(1.5)
    g["eb"] = jnp.full_like(g["eb"], -1.5)
    g3, r3, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(1))
    assert float(r3) == 0.0


def test_surround_walls_are_fatal():
    game = registry._env("SurroundLite-v5", num_envs=1).game
    g = dict(game.init(jax.random.PRNGKey(0)))
    # Drive into the top wall (UP); the snakes advance every 4th frame.
    r_total = 0.0
    for t in range(140):
        g, r, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(t))  # UP
        r_total += float(r)
    # The player eventually crashed into the boundary at least once.
    assert int(g["e_score"]) >= 1
    assert r_total <= -1.0


def test_video_pinball_plunger_launches():
    game = registry._env("VideoPinballLite-v5", num_envs=1).game
    g = dict(game.init(jax.random.PRNGKey(0)))
    assert bool(g["plunging"])
    for t in range(10):  # charge (DOWN)
        g, _, _ = game.tick(g, jnp.int32(5), jax.random.PRNGKey(t))
    g, _, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(99))  # release
    assert not bool(g["plunging"])
    assert float(g["vy"]) < 0.0  # launched upward


def test_yars_nibble_arms_cannon():
    game = registry._env("YarsRevengeLite-v5", num_envs=1).game
    g = dict(game.init(jax.random.PRNGKey(0)))
    # Park on a shield cell: nibbles accumulate.
    g["px"] = jnp.float32(160.0 - 35.0)
    g["py"] = jnp.float32(66.0)
    g["mx"] = jnp.float32(0.0)
    g["my"] = jnp.float32(200.0)  # missile far away
    total = 0.0
    for t in range(6):
        g["px"] = jnp.float32(160.0 - 35.0)
        g["py"] = jnp.float32(66.0 + t * 6.0)
        g, r, _ = game.tick(g, jnp.int32(0), jax.random.PRNGKey(t))
        g = dict(g)
        total += float(r)
    assert total >= 4 * 69.0
    assert int(g["nibbles"]) >= 4
    # Fire launches the cannon.
    g2, _, _ = game.tick(g, jnp.int32(1), jax.random.PRNGKey(50))
    assert float(g2["cannon_x"]) >= 0.0


def test_pools_step_through_pipeline():
    """Full 84x84 pipeline smoke for the new ids (batched pool)."""
    for tid in ("AsteroidsLite-v5", "SurroundLite-v5",
                "VideoPinballLite-v5"):
        env = envpool_tpu.make(tid, env_type="gymnasium", num_envs=2, seed=0)
        obs, _ = env.reset()
        n = env.action_space.n
        for t in range(4):
            obs, r, te, tr, info = env.step(
                np.random.default_rng(t).integers(0, n, 2).astype(np.int32)
            )
        assert obs.shape == (2, 4, 84, 84)
