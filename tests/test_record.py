"""Episode demo recording (.lmp analog, adapters/record.py)."""

import glob
import os
import shutil

import numpy as np

import envpool_tpu


def test_record_and_replay(tmp_path):
    d = str(tmp_path / "demos")
    env = envpool_tpu.make(
        "CartPole-v1", env_type="gymnasium", num_envs=2, seed=9,
        max_episode_steps=40, record_dir=d,
    )
    env.reset()
    rng = np.random.default_rng(3)
    sent = []
    rewards = []
    for _ in range(60):
        a = rng.integers(0, 2, 2).astype(np.int32)
        sent.append(a)
        _, rew, term, trunc, _ = env.step(a)
        rewards.append(rew.copy())
    files = sorted(glob.glob(os.path.join(d, "*.npz")))
    assert files, "no demo files written"
    with np.load(files[0]) as z:
        assert "action" in z.files
        assert int(z["__seed__"]) in (9, 10)  # seed + env_id
        assert z["action"].ndim == 1 and len(z["action"]) > 0
    # Determinism: replaying the identical action stream through a fresh
    # pool with the same seed reproduces the reward stream exactly.
    env2 = envpool_tpu.make(
        "CartPole-v1", env_type="gymnasium", num_envs=2, seed=9,
        max_episode_steps=40,
    )
    env2.reset()
    for a, r in zip(sent, rewards):
        _, rew, *_ = env2.step(a)
        np.testing.assert_array_equal(rew, r)


def test_vizdoom_lmp_save_dir(tmp_path):
    d = str(tmp_path / "lmp")
    env = envpool_tpu.make(
        "Basic-v1", env_type="gymnasium", num_envs=2, seed=1,
        use_combined_action=True, max_episode_steps=8, lmp_save_dir=d,
    )
    env.reset()
    rng = np.random.default_rng(0)
    for _ in range(20):
        env.step(rng.integers(0, 6, 2).astype(np.int32))
    assert glob.glob(os.path.join(d, "env_*_*.npz"))
