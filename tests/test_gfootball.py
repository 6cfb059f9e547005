"""gfootball family tests (18 scenarios, SMM obs, game rules)."""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.core.registry import registry


def test_18_ids():
    ids = [
        i for i in envpool_tpu.list_all_envs() if i.startswith("gfootball/")
    ]
    assert len(ids) == 18
    assert "gfootball/11_vs_11_stochastic-v1" in ids
    assert "gfootball/academy_empty_goal_close-v1" in ids


def test_smm_obs_layout():
    env = registry._env("gfootball/11_vs_11_stochastic-v1", num_envs=1)
    st, obs = env.reset_env(jax.random.PRNGKey(0))
    smm = np.asarray(obs["obs"])
    assert smm.shape == (72, 96, 4) and smm.dtype == np.uint8
    # 11 left dots, 11 right dots (some may overlap a pixel), one ball,
    # one active marker.
    assert 5 <= (smm[:, :, 0] > 0).sum() <= 11
    assert 5 <= (smm[:, :, 1] > 0).sum() <= 11
    assert (smm[:, :, 2] > 0).sum() == 1
    assert (smm[:, :, 3] > 0).sum() == 1


def test_empty_goal_close_scoring():
    """Run right + shoot: the lone attacker scores within a few steps."""
    env = registry._env(
        "gfootball/academy_empty_goal_close-v1", num_envs=1
    )
    key = jax.random.PRNGKey(1)
    st, obs = env.reset_env(key)
    total = 0.0
    scored = False
    for t in range(120):
        # Move right (action 5) until close, then shot (12).
        x = float(st["ball"][0])
        a = 12 if x > 0.85 else 5
        out = env.step_env(st, jnp.int32(a), jax.random.fold_in(key, t))
        st = dict(out.state)
        total += float(out.reward)
        if float(out.reward) > 0:
            scored = True
            break
    assert scored, f"never scored (ball x={float(st['ball'][0]):.2f})"
    assert bool(out.terminated)  # academy scenarios end on a goal


def test_possession_and_pass():
    env = registry._env(
        "gfootball/academy_pass_and_shoot_with_keeper-v1", num_envs=1
    )
    key = jax.random.PRNGKey(2)
    st, obs = env.reset_env(key)
    assert int(st["owned_team"]) == 0
    out = env.step_env(st, jnp.int32(11), key)  # short pass
    # Ball released into flight.
    assert int(out.state["owned_team"]) in (-1, 0)
    speed = float(jnp.linalg.norm(out.state["ball"][2:]))
    if int(out.state["owned_team"]) == -1:
        assert speed > 0.0


def test_own_goal_concede_in_11v11():
    env = registry._env("gfootball/11_vs_11_hard_stochastic-v1", num_envs=1)
    key = jax.random.PRNGKey(3)
    st, _ = env.reset_env(key)
    # Teleport the ball into our goal mouth moving left.
    st = dict(st)
    st["owned_team"] = jnp.int32(-1)
    st["owned_player"] = jnp.int32(-1)
    st["ball"] = jnp.asarray([-0.999, 0.0, -0.02, 0.0], jnp.float32)
    out = env.step_env(st, jnp.int32(0), key)
    assert float(out.reward) == -1.0
    assert int(out.state["score"][1]) == 1


def test_pool_runs():
    env = envpool_tpu.make(
        "gfootball/5_vs_5-v1", env_type="gymnasium", num_envs=4, seed=0,
        max_episode_steps=50,
    )
    obs, info = env.reset()
    assert obs.shape == (4, 72, 96, 4)
    rng = np.random.default_rng(0)
    for _ in range(10):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 19, 4).astype(np.int32)
        )
    assert "score" in info and info["score"].shape == (4, 2)


def test_simple115v2_representation():
    """Upstream GRF's simple115v2 vector obs beside the SMM default."""
    import numpy as np

    import envpool_tpu

    env = envpool_tpu.make(
        "11_vs_11_stochastic-v3"
        if "11_vs_11_stochastic-v3" in envpool_tpu.list_all_envs()
        else [i for i in envpool_tpu.list_all_envs() if "11_vs_11" in i][0],
        env_type="gymnasium", num_envs=2, seed=0,
        representation="simple115v2",
    )
    obs, _ = env.reset()
    assert obs.shape == (2, 115) and obs.dtype == np.float32
    # Ownership one-hot (indices 88:91) and active one-hot (97:108) sum 1.
    assert np.allclose(obs[:, 94:97].sum(axis=1), 1.0)
    assert np.allclose(obs[:, 97:108].sum(axis=1), 1.0)
    for t in range(4):
        obs, r, te, tr, info = env.step(np.full(2, 5, np.int32))
    # Movement produced nonzero direction entries.
    assert (np.abs(obs[:, 22:44]) > 0).any()
