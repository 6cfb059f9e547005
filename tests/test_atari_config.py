"""ALE config semantics: full_action_space / mode / difficulty.

Reference surface: envpool/atari/atari_env.h:50-89 (mode/difficulty
switches, 18-action full set).
"""

import jax
import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.envs.atari.arcade_env import full_to_minimal_map


def test_full_action_space_spec():
    for task in ("PongLite-v5", "BreakoutLite-v5", "QbertLite-v5"):
        e = envpool_tpu.make(
            task, env_type="gymnasium", num_envs=2, seed=0,
            full_action_space=True,
        )
        assert e.action_space.n == 18, task
        obs, _ = e.reset()
        for t in range(6):
            obs, r, te, tr, info = e.step(
                np.random.default_rng(t).integers(0, 18, 2).astype(np.int32)
            )
        assert obs.shape[0] == 2


def test_full_to_minimal_projection():
    # Pong's minimal set: NOOP FIRE RIGHT LEFT RIGHTFIRE LEFTFIRE.
    table = full_to_minimal_map((0, 1, 3, 4, 11, 12))
    assert table[0] == 0          # NOOP → NOOP
    assert table[1] == 1          # FIRE → FIRE
    assert table[3] == 2          # RIGHT → RIGHT
    assert table[4] == 3          # LEFT → LEFT
    assert table[11] == 4         # RIGHTFIRE → RIGHTFIRE
    assert table[2] == 0          # UP → NOOP (Pong ignores up/down)
    assert table[6] == 2          # UPRIGHT → RIGHT
    assert table[14] == 4         # UPRIGHTFIRE → RIGHTFIRE


def test_mode_difficulty_validation():
    with pytest.raises(ValueError, match="mode"):
        envpool_tpu.make(
            "PongLite-v5", env_type="gymnasium", num_envs=1, mode=7
        )
    with pytest.raises(ValueError, match="difficulty"):
        envpool_tpu.make(
            "PongLite-v5", env_type="gymnasium", num_envs=1, difficulty=3
        )


def test_pong_difficulty_shrinks_paddle():
    """The difficulty switch halves the player paddle — observable in the
    rendered frame's paddle pixel count."""
    frames = {}
    for diff in (0, 1):
        spec = envpool_tpu.make_spec(
            "PongLite-v5", num_envs=1, seed=0, difficulty=diff
        )
        env = spec.env
        st, _ = env.reset_env(jax.random.PRNGKey(0))
        frame = np.asarray(env.render_state(st))
        frames[diff] = frame
    # Player paddle column band (PLAYER_X=140..144): count paddle-green
    # pixels (ALE player color (92, 186, 92)).
    def paddle_px(f):
        band = f[:, 140:144]
        return (
            (band[..., 0] == 92) & (band[..., 1] == 186) & (band[..., 2] == 92)
        ).sum()

    count0 = paddle_px(frames[0])
    count1 = paddle_px(frames[1])
    assert 0 < count1 < count0, (count0, count1)


def test_freeway_mode_speeds_traffic():
    spec0 = envpool_tpu.make_spec("FreewayLite-v5", num_envs=1, seed=0)
    spec2 = envpool_tpu.make_spec(
        "FreewayLite-v5", num_envs=1, seed=0, mode=2, difficulty=1
    )
    g0 = spec0.env.game
    g2 = spec2.env.game
    assert np.all(np.abs(g2._car_speed()) > np.abs(g0._car_speed()))
