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


def test_tile_frames_grid():
    from envpool_tpu.adapters.base import tile_frames

    frames = np.arange(5 * 2 * 3 * 3, dtype=np.uint8).reshape(5, 2, 3, 3)
    grid = tile_frames(frames)
    # 5 frames → 3 cols × 2 rows grid.
    assert grid.shape == (4, 9, 3)
    assert (grid[0:2, 0:3] == frames[0]).all()
    assert (grid[0:2, 3:6] == frames[1]).all()
    assert (grid[2:4, 0:3] == frames[3]).all()
    assert (grid[2:4, 6:9] == 0).all()  # padding cell


def test_render_mode_human_requires_cv2():
    """With render_mode='human', render() routes through the viewer and
    (without opencv in this image) raises the reference's RuntimeError."""
    import pytest

    import envpool_tpu

    env = envpool_tpu.make_gymnasium(
        "CartPole-v1", num_envs=2, render_mode="human"
    )
    env.reset()
    assert env.render_mode == "human"
    try:
        import cv2
    except ImportError:
        with pytest.raises(RuntimeError, match="opencv"):
            env.render()
        return
    shown = {}
    orig_imshow, orig_waitkey = cv2.imshow, cv2.waitKey
    cv2.imshow = lambda name, img: shown.update(name=name, img=img)
    cv2.waitKey = lambda ms: 0
    try:
        out = env.render()
    finally:
        cv2.imshow, cv2.waitKey = orig_imshow, orig_waitkey
    assert out is None
    # Two CartPole frames tiled side by side (BGR-flipped by the viewer).
    b, h, w, _ = 2, 400, 600, 3
    assert shown["img"].shape == (h, 2 * w, 3)
