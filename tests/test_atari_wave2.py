"""Arcade wave-2 game-logic tests (Asterix/Skiing/Boxing/Seaquest/
Enduro/Bowling)."""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.envs.atari.more_games import (
    AsterixGame,
    BowlingGame,
    BoxingGame,
    EnduroGame,
    SeaquestGame,
    SkiingGame,
)


def _run(game, g, actions, seed=0):
    key = jax.random.PRNGKey(seed)
    total = 0.0
    for t, a in enumerate(actions):
        g, r, over = game.tick(g, jnp.int32(a), jax.random.fold_in(key, t))
        total += float(r)
    return g, total


def test_asterix_collect_good_object():
    game = AsterixGame()
    g = game.init(jax.random.PRNGKey(0))
    # Put a good object directly on the player.
    g = dict(g)
    g["obj_x"] = g["obj_x"].at[int(g["lane"])].set(g["px"])
    g["obj_good"] = g["obj_good"].at[int(g["lane"])].set(True)
    g2, r, over = game.tick(g, jnp.int32(0), jax.random.PRNGKey(1))
    assert float(r) == 50.0
    # A bad object costs a life.
    g = dict(game.init(jax.random.PRNGKey(2)))
    g["obj_x"] = g["obj_x"].at[int(g["lane"])].set(g["px"])
    g["obj_good"] = g["obj_good"].at[int(g["lane"])].set(False)
    g2, r, over = game.tick(g, jnp.int32(0), jax.random.PRNGKey(3))
    assert int(g2["lives"]) == int(g["lives"]) - 1


def test_skiing_finish_penalty():
    game = SkiingGame()
    g = game.init(jax.random.PRNGKey(0))
    g = dict(g)
    g["dist"] = jnp.float32(3198.0)  # one step from the finish
    g["gate_x"] = jnp.full_like(g["gate_x"], g["px"])  # final gate passed
    g["missed"] = g["missed"].at[:3].set(True)
    g2, r, over = game.tick(g, jnp.int32(0), jax.random.PRNGKey(1))
    assert bool(over)
    assert float(r) == -3 * 500.0


def test_boxing_jab_scores():
    game = BoxingGame()
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["ex"] = g["px"] + jnp.float32(10.0)
    g["ey"] = g["py"]
    g2, r, over = game.tick(g, jnp.int32(1), jax.random.PRNGKey(1))
    assert float(r) == 1.0 and int(g2["p_score"]) == 1
    # Cooldown prevents machine-gun jabs.
    g3, r2, _ = game.tick(g2, jnp.int32(1), jax.random.PRNGKey(2))
    assert float(r2) <= 0.0


def test_seaquest_torpedo_and_oxygen():
    game = SeaquestGame()
    g = dict(game.init(jax.random.PRNGKey(0)))
    from envpool_tpu.envs.atari.more_games import _SQ_LANE_Y

    # Aim at the lane-0 fish: position sub in lane 0, fire.
    g["py"] = jnp.float32(_SQ_LANE_Y[0])
    g["px"] = g["fish_x"][0] - 10.0
    g["torp_d"] = jnp.float32(1.0)
    total = 0.0
    key = jax.random.PRNGKey(1)
    a = 1  # FIRE
    for t in range(8):
        g, r, over = game.tick(g, jnp.int32(a), jax.random.fold_in(key, t))
        g = dict(g)
        total += float(r)
        a = 0
    assert total >= 20.0, "torpedo never hit the fish"
    # Oxygen runs out -> lose a life.
    g["oxygen"] = jnp.float32(0.0005)
    lives0 = int(g["lives"])
    g, r, over = game.tick(g, jnp.int32(0), key)
    assert int(g["lives"]) == lives0 - 1


def test_enduro_passes_score():
    game = EnduroGame()
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["speed"] = jnp.float32(4.0)
    g["car_d"] = g["car_d"].at[0].set(-4.9)  # about to be passed
    g["car_x"] = g["car_x"].at[0].set(10.0)  # away from the player
    g2, r, over = game.tick(g, jnp.int32(1), jax.random.PRNGKey(1))
    assert float(r) >= 1.0


def test_bowling_strike_path():
    game = BowlingGame()
    g = dict(game.init(jax.random.PRNGKey(0)))
    g["by"] = jnp.float32(105.0)
    key = jax.random.PRNGKey(1)
    g, r, over = game.tick(g, jnp.int32(1), key)  # FIRE: roll
    g = dict(g)
    total = float(r)
    for t in range(60):
        g, r, over = game.tick(g, jnp.int32(0), jax.random.fold_in(key, t))
        g = dict(g)
        total += float(r)
    assert total >= 3.0, f"center roll knocked only {total} pins"


def test_pool_ids_and_pipeline():
    ids = envpool_tpu.list_all_envs()
    lites = [i for i in ids if i.endswith("Lite-v5")]
    assert len(lites) >= 10, lites
    env = envpool_tpu.make(
        "AsterixLite-v5", env_type="gymnasium", num_envs=2, seed=0,
        img_height=84, img_width=84, stack_num=4,
    )
    obs, info = env.reset()
    assert obs.shape == (2, 4, 84, 84)
