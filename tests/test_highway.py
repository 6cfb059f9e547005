"""Highway family tests.

Mirrors the reference's highway test taxonomy
(``envpool/highway/highway_deterministic_test.py``,
``highway_align_test.py``): registry ids, spec shapes, determinism per seed,
reward normalization bounds, crash/terminate behavior.
"""

import numpy as np
import pytest

import envpool_tpu as ep


@pytest.mark.parametrize("task", ["Highway-v0", "HighwayFast-v0"])
def test_make_and_spec(task):
    env = ep.make_gymnasium(task, num_envs=2, seed=1)
    obs, info = env.reset()
    assert obs.shape == (2, 5, 5)
    assert obs.dtype == np.float32
    # Ego row: presence 1, all features in [-1, 1].
    assert np.all(obs[:, 0, 0] == 1.0)
    assert np.all(np.abs(obs) <= 1.0)
    assert "speed" in info and "crashed" in info


def test_deterministic():
    e1 = ep.make_gymnasium("HighwayFast-v0", num_envs=3, seed=9)
    e2 = ep.make_gymnasium("HighwayFast-v0", num_envs=3, seed=9)
    e3 = ep.make_gymnasium("HighwayFast-v0", num_envs=3, seed=10)
    o1, _ = e1.reset()
    o2, _ = e2.reset()
    o3, _ = e3.reset()
    np.testing.assert_array_equal(o1, o2)
    assert not np.array_equal(o1, o3)
    rng = np.random.default_rng(0)
    diff = False
    for _ in range(10):
        act = rng.integers(0, 5, size=3).astype(np.int32)
        o1 = e1.step(act)[0]
        o2 = e2.step(act)[0]
        o3 = e3.step(act)[0]
        np.testing.assert_array_equal(o1, o2)
        diff = diff or not np.array_equal(o1, o3)
    assert diff


def test_reward_normalized_bounds():
    """With normalize_reward=True rewards stay in [0, 1] (LMap of extremes)."""
    env = ep.make_gymnasium("HighwayFast-v0", num_envs=4, seed=3)
    env.reset()
    rng = np.random.default_rng(1)
    for _ in range(15):
        act = rng.integers(0, 5, size=4).astype(np.int32)
        _, rew, term, trunc, info = env.step(act)
        assert np.all(rew >= -1e-6) and np.all(rew <= 1.0 + 1e-6)


def test_crash_terminates_and_offroad_flag():
    """IDLE into dense traffic eventually crashes some env; crash → term."""
    env = ep.make_gymnasium(
        "HighwayFast-v0", num_envs=8, seed=5, vehicles_density=2.0
    )
    env.reset()
    crashed_seen = False
    for _ in range(30):
        # FASTER constantly → rear-end the leading vehicle.
        _, rew, term, trunc, info = env.step(np.full(8, 3, np.int32))
        if np.any(info["crashed"]):
            crashed_seen = True
            # crashed envs are terminated in the same step
            assert np.all(term[info["crashed"]])
            break
    assert crashed_seen


def test_faster_slower_changes_speed():
    env = ep.make_gymnasium(
        "Highway-v0", num_envs=1, seed=2, vehicles_count=0
    )
    env.reset()
    _, _, _, _, info = env.step(np.array([3], np.int32))  # FASTER
    fast_speed = float(info["speed"][0])
    env2 = ep.make_gymnasium(
        "Highway-v0", num_envs=1, seed=2, vehicles_count=0
    )
    env2.reset()
    _, _, _, _, info2 = env2.step(np.array([4], np.int32))  # SLOWER
    slow_speed = float(info2["speed"][0])
    assert fast_speed > 25.0 > slow_speed


def test_lane_change_moves_laterally():
    env = ep.make_gymnasium(
        "Highway-v0", num_envs=1, seed=11, vehicles_count=0, initial_lane_id=1
    )
    obs, _ = env.reset()
    y0 = obs[0, 0, 2]
    for _ in range(3):
        obs, *_ = env.step(np.array([2], np.int32))  # LANE_RIGHT
    assert obs[0, 0, 2] > y0 + 0.1  # moved toward higher y (right lane)


def test_truncation_at_duration():
    env = ep.make_gymnasium(
        "HighwayFast-v0", num_envs=2, seed=21, vehicles_count=0
    )
    env.reset()
    truncs = []
    for _ in range(30):
        _, _, term, trunc, _ = env.step(np.ones(2, np.int32))
        assert not np.any(term)  # empty road: no crash possible
        truncs.append(np.array(trunc))
    assert np.all(truncs[-1])  # trunc exactly at step == duration
    assert not np.any(truncs[:-1])


def test_list_registered():
    ids = ep.list_all_envs()
    for task in ["Highway-v0", "HighwayFast-v0", "highway-v0"]:
        assert task in ids


def test_parking_goal_env_reaches_success() -> None:
    """A crude pull-toward-goal policy parks within the episode budget."""
    import jax.numpy as jnp
    import envpool_tpu
    from envpool_tpu.envs.highway.scenarios import ParkingEnv

    env = envpool_tpu.make("Parking-v0", env_type="gymnasium", num_envs=16,
                           seed=3)
    obs, _ = env.reset()
    success = False
    for _ in range(100):
        delta = obs["desired_goal"] - obs["achieved_goal"]
        # Heading toward goal: steer by bearing error, gentle throttle.
        import numpy as np

        tx, ty = delta[:, 0] * 100, delta[:, 1] * 100
        cos_h, sin_h = obs["achieved_goal"][:, 4], obs["achieved_goal"][:, 5]
        bearing = np.arctan2(ty, tx)
        heading = np.arctan2(sin_h, cos_h)
        herr = (bearing - heading + np.pi) % (2 * np.pi) - np.pi
        act = np.stack(
            [0.3 * np.ones_like(herr), np.clip(herr, -1, 1)], 1
        ).astype(np.float32)
        obs, r, te, tr, info = env.step(act)
        if info["is_success"].any():
            success = True
            break
    assert success


def test_parking_reward_formula() -> None:
    import jax.numpy as jnp
    import numpy as np
    from envpool_tpu.envs.highway.scenarios import ParkingEnv, _WEIGHTS

    a = jnp.asarray([0.1, 0.0, 0.0, 0.0, 1.0, 0.0])
    d = jnp.asarray([0.0, 0.0, 0.0, 0.0, 1.0, 0.0])
    r = float(ParkingEnv.goal_reward(a, d))
    assert abs(r - (-(0.1 ** 0.5))) < 1e-6


def test_lane_keeping_centered_reward() -> None:
    import numpy as np
    import envpool_tpu

    env = envpool_tpu.make("LaneKeeping-v0", env_type="gymnasium",
                           num_envs=4, seed=0)
    obs, _ = env.reset()
    # Reward near 1 when the lateral error is small at reset.
    obs, r, te, tr, _ = env.step(np.zeros((4, 1), np.float32))
    assert (r > 0.3).all()
