"""Dummy fixture env tests (dummy/dummy_py_envpool_test.py analog)."""

import numpy as np

import envpool_tpu


def test_dummy_contract() -> None:
    env = envpool_tpu.make("Dummy-v0", env_type="gymnasium", num_envs=3, seed=0)
    obs, info = env.reset()
    np.testing.assert_array_equal(obs["raw"][0], np.arange(10))
    assert info["queue_size"].shape == (3,)
    acts = np.array([1, 2, 3], np.int32)
    obs, rew, term, trunc, info = env.step(acts)
    np.testing.assert_array_equal(rew, acts.astype(np.float32))
    np.testing.assert_array_equal(obs["dyn"][:, 0], acts)
    np.testing.assert_array_equal(obs["raw"][:, 0], [1, 1, 1])
    # Terminates after state_num steps.
    for _ in range(9):
        obs, rew, term, trunc, info = env.step(acts)
    assert term.all()


def test_dummy_multiplayer_dyn_field() -> None:
    env = envpool_tpu.make(
        "Dummy-v0", env_type="gymnasium", num_envs=2, max_num_players=3
    )
    obs, info = env.reset()
    assert obs["dyn"].shape == (2, 3, 2)
    assert info["players"]["env_id"].shape == (2, 3)
