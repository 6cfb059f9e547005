"""Lockstep vs committed golden trajectories (oracle_fixtures/).

Each family's test skips when its fixture is absent (see
oracle_fixtures/README.md for how to generate them where the upstream
packages are installable).
"""

import os

import numpy as np
import pytest

HERE = os.path.join(os.path.dirname(__file__), "oracle_fixtures")


def _load(name):
    path = os.path.join(HERE, f"{name}_golden.npz")
    if not os.path.exists(path):
        pytest.skip(
            f"{name} golden fixture not generated (no oracle package in "
            "this image; see tests/oracle_fixtures/README.md)"
        )
    return np.load(path)


def _keys(data):
    episodes = {}
    for k in data.files:
        env_id, seed, field = k.rsplit("|", 2)
        episodes.setdefault((env_id, int(seed)), {})[field] = data[k]
    return episodes


def test_minigrid_golden_lockstep():
    data = _load("minigrid")
    import jax
    import jax.numpy as jnp

    from envpool_tpu.core.registry import registry

    for (env_id, seed), ep in _keys(data).items():
        env = registry._env(env_id, num_envs=1)
        st, obs = env.reset_env(jax.random.PRNGKey(seed))
        key = "obs" if "obs" in obs else "obs:image"
        np.testing.assert_array_equal(
            np.asarray(obs[key]), ep["images"][0],
            err_msg=f"{env_id}|{seed} reset image",
        )
        for t, a in enumerate(ep["actions"]):
            out = env.step_env(st, jnp.int32(a), jax.random.PRNGKey(t))
            st = out.state
            np.testing.assert_array_equal(
                np.asarray(out.obs[key]), ep["images"][t + 1],
                err_msg=f"{env_id}|{seed} step {t}",
            )
            np.testing.assert_allclose(
                float(out.reward), ep["rewards"][t], atol=1e-6
            )


def test_pgx_golden_legal_counts():
    data = _load("pgx")
    import jax
    import jax.numpy as jnp

    from envpool_tpu.core.registry import registry

    id_map = {
        "go_9x9": "Go9x9-v1",
        "othello": "Othello-v1",
        "chess": "Chess-v1",
        "gardner_chess": "GardnerChess-v1",
        "shogi": "Shogi-v1",
        "hex": "Hex-v1",
        "connect_four": "ConnectFour-v1",
        "tic_tac_toe": "TicTacToe-v1",
    }
    for (env_id, seed), ep in _keys(data).items():
        if env_id not in id_map:
            continue
        env = registry._env(id_map[env_id], num_envs=1, max_num_players=2)
        st, obs = env.reset_env(jax.random.PRNGKey(seed))
        mask = obs["info:legal_action_mask"]
        assert int(np.asarray(mask).sum()) == ep["n_legal"][0]
        for t, a in enumerate(ep["actions"]):
            out = env.step_env(
                st, jnp.full((2,), a, jnp.int32), jax.random.PRNGKey(t)
            )
            st = out.state
            if bool(out.terminated):
                break
            assert (
                int(np.asarray(out.obs["info:legal_action_mask"]).sum())
                == ep["n_legal"][t + 1]
            ), f"{env_id}|{seed} step {t}"


def test_highway_golden_lockstep():
    data = _load("highway")
    import jax
    import jax.numpy as jnp

    from envpool_tpu.core.registry import registry

    id_map = {"highway-v0": "highway-v0", "merge-v0": "merge-v0",
              "roundabout-v0": "roundabout-v0"}
    for (env_id, seed), ep in _keys(data).items():
        env = registry._env(id_map[env_id], num_envs=1)
        st, obs = env.reset_env(jax.random.PRNGKey(seed))
        for t, a in enumerate(ep["actions"]):
            out = env.step_env(st, jnp.int32(a), jax.random.PRNGKey(t))
            st = out.state
            np.testing.assert_allclose(
                float(out.reward), ep["rewards"][t], atol=5e-2,
                err_msg=f"{env_id}|{seed} step {t}",
            )
