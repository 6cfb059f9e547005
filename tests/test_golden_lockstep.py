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


def test_pgx_golden_lockstep():
    """Full-board + legal-mask + reward lockstep vs the independent scalar
    rules oracles (tests/oracle_fixtures/independent/scalar_board.py)."""
    data = _load("pgx")
    import jax
    import jax.numpy as jnp

    from envpool_tpu.core.registry import registry

    id_map = {
        "go_9x9": "Go9x9-v1",
        "othello": "Othello-v1",
        "connect_four": "ConnectFour-v1",
        "tic_tac_toe": "TicTacToe-v1",
    }
    for (name, seed), ep in _keys(data).items():
        env = registry._env(id_map[name], num_envs=1)
        st, obs = env.reset_env(jax.random.PRNGKey(seed))
        tag = f"{name}|{seed}"
        np.testing.assert_array_equal(
            np.asarray(obs["obs:board"]), ep["boards"][0], f"{tag} reset board"
        )
        np.testing.assert_array_equal(
            np.asarray(obs["info:legal_moves"]), ep["masks"][0],
            f"{tag} reset mask",
        )
        for t, a in enumerate(ep["actions"]):
            out = env.step_env(st, jnp.int32(a), jax.random.PRNGKey(t))
            st = out.state
            np.testing.assert_array_equal(
                np.asarray(out.obs["obs:board"]), ep["boards"][t + 1],
                f"{tag} board after move {t}",
            )
            assert int(out.obs["obs:current_player"]) == ep["players"][t + 1] \
                or bool(out.terminated), f"{tag} player after move {t}"
            np.testing.assert_allclose(
                float(out.reward), ep["rewards"][t], atol=1e-6,
                err_msg=f"{tag} reward at move {t}",
            )
            assert bool(out.terminated) == bool(ep["terminated"][t]), (
                f"{tag} terminated at move {t}"
            )
            if not bool(out.terminated):
                np.testing.assert_array_equal(
                    np.asarray(out.obs["info:legal_moves"]), ep["masks"][t + 1],
                    f"{tag} mask after move {t}",
                )


def test_highway_golden_lockstep():
    """Lockstep vs the independent scalar IDM/MOBIL/bicycle/SAT oracle
    (independent/scalar_highway.py): full vehicle positions, ego obs,
    rewards, crash flags.  Tolerances cover float32-vs-float64 drift over
    the 5-15 substeps per policy step."""
    data = _load("highway")
    import jax
    import jax.numpy as jnp

    from envpool_tpu.core.registry import registry

    for (env_id, seed), ep in _keys(data).items():
        env = registry._env(env_id, num_envs=1)
        st, obs = env.reset_env(jax.random.PRNGKey(seed))
        tag = f"{env_id}|{seed}"
        np.testing.assert_allclose(
            np.asarray(obs["obs"]), ep["obs"][0], atol=1e-4,
            err_msg=f"{tag} reset obs",
        )
        for t, a in enumerate(ep["actions"]):
            out = env.step_env(st, jnp.int32(a), jax.random.PRNGKey(t))
            st = out.state
            np.testing.assert_allclose(
                np.asarray(st["x"]), ep["x"][t + 1], atol=5e-2,
                err_msg=f"{tag} x at step {t}",
            )
            np.testing.assert_allclose(
                np.asarray(st["y"]), ep["y"][t + 1], atol=5e-2,
                err_msg=f"{tag} y at step {t}",
            )
            np.testing.assert_allclose(
                np.asarray(out.obs["obs"]), ep["obs"][t + 1], atol=5e-3,
                err_msg=f"{tag} obs at step {t}",
            )
            np.testing.assert_allclose(
                float(out.reward), ep["rewards"][t], atol=1e-3,
                err_msg=f"{tag} reward at step {t}",
            )
            assert bool(st["crashed"][0]) == bool(ep["crashed"][t]), (
                f"{tag} ego crash flag at step {t}"
            )


def test_jumanji_golden_2048():
    """Oracle-verified transitions: every (board, action, board', reward)
    of the repo's Game2048 must obey the independent scalar slide/merge/
    spawn laws (independent/scalar_jumanji.py).  Spawn randomness is
    handled by law-checking (exactly one new 1/2-exponent tile in an empty
    cell of the slid board) instead of RNG parity."""
    import sys

    sys.path.insert(0, HERE)
    import jax
    import jax.numpy as jnp
    from independent.scalar_jumanji import (
        movable_2048, verify_2048_transition,
    )

    from envpool_tpu.core.registry import registry

    env = registry._env("Game2048-v1", num_envs=1)

    @jax.jit
    def _step(st, a, k):
        out = env.step_env(st, a, k)
        return out.state, out.obs, out.reward, out.terminated

    class _Out:
        def __init__(self, parts):
            self.state, self.obs, self.reward, self.terminated = parts

    step = lambda st, a, k: _Out(_step(st, a, k))
    for seed in range(2):
        st, obs = env.reset_env(jax.random.PRNGKey(seed))
        board = np.asarray(obs["obs:board"])
        # Reset: exactly two spawned tiles.
        tiles = board[board > 0]
        assert len(tiles) == 2 and set(tiles) <= {1, 2}
        rng = np.random.default_rng(seed)
        for t in range(80):
            mask = np.asarray(obs["obs:action_mask"])
            np.testing.assert_array_equal(
                mask,
                [movable_2048(board.tolist(), (a + 1) % 4) for a in range(4)],
                err_msg=f"seed {seed} step {t} action mask",
            )
            a = int(rng.choice(np.flatnonzero(mask)))
            out = step(st, jnp.int32(a), jax.random.PRNGKey(1000 + t))
            st, obs = out.state, out.obs
            after = np.asarray(obs["obs:board"])
            err = verify_2048_transition(
                board, after, (a + 1) % 4, float(out.reward)
            )
            assert err is None, f"seed {seed} step {t}: {err}"
            assert int(obs["info:highest_tile"]) == int(2 ** after.max())
            board = after
            if bool(out.terminated):
                assert not any(
                    movable_2048(board.tolist(), d) for d in range(4)
                )
                break


def test_jumanji_golden_sliding_tile():
    """Full lockstep vs the scalar fifteen-puzzle oracle from the repo
    env's scrambled reset layout (deterministic dynamics)."""
    import sys

    sys.path.insert(0, HERE)
    import jax
    import jax.numpy as jnp
    from independent.scalar_jumanji import ScalarSlidingTile

    from envpool_tpu.core.registry import registry

    env = registry._env("SlidingTilePuzzle-v0", num_envs=1)
    for seed in range(2):
        st, obs = env.reset_env(jax.random.PRNGKey(seed))
        oracle = ScalarSlidingTile(
            np.asarray(st["puzzle"]),
            np.asarray(st["pos"]),
            int(env.config["grid_size"]),
            int(env.config["time_limit"]),
        )
        rng = np.random.default_rng(seed)
        for t in range(80):
            np.testing.assert_array_equal(
                np.asarray(obs["obs:action_mask"]), oracle.action_mask(),
                err_msg=f"seed {seed} step {t} mask",
            )
            a = int(rng.integers(0, 4))  # includes illegal pushes
            want_r, want_done = oracle.step(a)
            out = env.step_env(st, jnp.int32(a), jax.random.PRNGKey(t))
            st, obs = out.state, out.obs
            np.testing.assert_array_equal(
                np.asarray(obs["obs:puzzle"]), oracle.puzzle_array(),
                err_msg=f"seed {seed} step {t} puzzle",
            )
            np.testing.assert_array_equal(
                np.asarray(obs["obs:empty_tile_position"]),
                list(oracle.pos),
                err_msg=f"seed {seed} step {t} pos",
            )
            assert float(out.reward) == want_r, f"seed {seed} step {t} reward"
            assert bool(out.terminated) == want_done
            if want_done:
                break


def test_envpool_golden_lockstep():
    """Dynamics lockstep vs trajectories recorded from the ACTUAL
    envpool binary (classic control; deterministic dynamics).

    The recorded initial observation is injected as state (reference
    episodes are seeded from per-env mt19937 draws, core/env.h:101-110,
    so parity is defined at the trajectory level — SURVEY.md hard-part
    #4), then our pure step_env must reproduce the reference's
    obs/reward/termination sequence: tight for the first steps, within
    float32-drift tolerance over the full 100-step horizon.
    """
    import jax
    import jax.numpy as jnp

    from envpool_tpu.core.registry import registry

    data = _load("envpool")
    episodes = _keys(data)
    assert episodes, "empty envpool fixture"
    checked = 0
    for (env_id, seed), ep in sorted(episodes.items()):
        env = registry._env(env_id, num_envs=1)
        obs_ref = ep["obs"]
        acts = ep["actions"]
        # Recover internal state from the reference's first observation.
        o0 = obs_ref[0]
        if env_id.startswith("Pendulum"):
            state = jnp.asarray(
                [np.arctan2(o0[1], o0[0]), o0[2]], jnp.float32
            )
        elif env_id.startswith("Acrobot"):
            state = jnp.asarray(
                [np.arctan2(o0[1], o0[0]), np.arctan2(o0[3], o0[2]),
                 o0[4], o0[5]], jnp.float32,
            )
        else:
            state = jnp.asarray(o0, jnp.float32)
        def _step(st, a, k):
            o = env.step_env(st, a, k)
            return o.state, o.obs["obs"], o.reward, o.terminated

        step = jax.jit(_step)
        for t in range(len(acts)):
            a = jnp.asarray(acts[t])
            state, obs_t, rew_t, term_t = step(
                state, a, jax.random.PRNGKey(t)
            )
            got = np.asarray(obs_t, np.float64)
            tol = 1e-4 if t < 10 else 5e-3 + 1e-3 * t
            np.testing.assert_allclose(
                got, obs_ref[t + 1], atol=tol, rtol=tol,
                err_msg=f"{env_id} seed {seed} step {t}",
            )
            assert abs(float(rew_t) - ep["rewards"][t]) < 1e-3, (
                env_id, seed, t
            )
            term = bool(term_t)
            if ep["terms"][t] and t < len(acts) - 1:
                assert term or t >= 98, (env_id, seed, t)
                break
        checked += 1
    assert checked >= 4
