"""Batched render() tests (AsyncEnvPool::Render analog)."""

import numpy as np
import pytest

import envpool_tpu


def test_cartpole_render() -> None:
    env = envpool_tpu.make("CartPole-v1", env_type="gymnasium", num_envs=4, seed=0)
    env.reset()
    frames = env.render()
    assert frames.shape == (4, 400, 600, 3)
    assert frames.dtype == np.uint8
    # White background, black cart somewhere.
    assert (frames == 255).mean() > 0.5
    assert (frames == 0).any()
    # Subset render.
    sub = env.render(np.array([1, 3]))
    assert sub.shape == (2, 400, 600, 3)
    np.testing.assert_array_equal(sub[0], frames[1])


def test_pong_render() -> None:
    env = envpool_tpu.make("PongLite-v5", env_type="gymnasium", num_envs=2, seed=0)
    env.reset()
    frames = env.render()
    assert frames.shape == (2, 210, 160, 3)
    # Background color (144, 72, 17) dominates.
    bg = (frames == np.array([144, 72, 17], np.uint8)).all(-1)
    assert bg.mean() > 0.5


def test_minigrid_render() -> None:
    env = envpool_tpu.make(
        "MiniGrid-Empty-5x5-v0", env_type="gymnasium", num_envs=2, seed=0
    )
    env.reset()
    frames = env.render()
    assert frames.shape == (2, 40, 40, 3)
    # Red agent cell present; green goal present; grey walls present.
    assert (frames == np.array([255, 0, 0], np.uint8)).all(-1).any()
    assert (frames == np.array([0, 200, 0], np.uint8)).all(-1).any()


def test_render_unsupported_raises() -> None:
    env = envpool_tpu.make("NChain-v0", env_type="gymnasium", num_envs=2)
    env.reset()
    with pytest.raises(NotImplementedError, match="render"):
        env.render()
