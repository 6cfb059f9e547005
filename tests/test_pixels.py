"""from_pixels wrapper tests (reference registration.py:142-185)."""

import numpy as np
import pytest

import envpool_tpu


def test_pixel_obs_shape_and_stacking():
    env = envpool_tpu.make(
        "HalfCheetah-v4", env_type="gymnasium", num_envs=2, seed=0,
        from_pixels=True,
    )
    obs, info = env.reset()
    assert obs.shape == (2, 3, 84, 84) and obs.dtype == np.uint8
    # At reset the stack is the repeated first frame.
    np.testing.assert_array_equal(obs[0, 0], obs[0, 1])
    prev = obs.copy()
    for _ in range(4):
        obs, rew, term, trunc, info = env.step(
            np.random.default_rng(0).uniform(-1, 1, (2, 6)).astype(np.float32)
        )
    # Frames changed as the robot moved; newest frame differs from the
    # reset frame, and the stack rolls.
    assert (obs[0, -1] != prev[0, -1]).any()
    # info keys pass through.
    assert "qpos0" in info


def test_pixel_scene_content():
    env = envpool_tpu.make(
        "Hopper-v4", env_type="gymnasium", num_envs=1, seed=0,
        from_pixels=True, height=64, width=64,
    )
    obs, _ = env.reset()
    frame = obs[0, -1]
    # Sky (168), ground checker (90/110), and robot shades all present.
    vals = set(np.unique(frame).tolist())
    assert 168 in vals, "no sky"
    assert 90 in vals or 110 in vals, "no ground"
    assert len(vals) > 4, "no geometry drawn"


def test_pixel_dmc_flavor():
    env = envpool_tpu.make_dm(
        "WalkerWalk-v1", num_envs=2, seed=1, from_pixels=True,
        height=48, width=48, stack=2,
    )
    ts = env.reset()
    assert ts.observation.obs.shape == (2, 2, 48, 48)


def test_from_pixels_rejects_non_physics_envs():
    with pytest.raises(ValueError):
        envpool_tpu.make(
            "CartPole-v1", env_type="gymnasium", num_envs=1, seed=0,
            from_pixels=True,
        )
