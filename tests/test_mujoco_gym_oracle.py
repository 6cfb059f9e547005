"""Per-task obs/reward lockstep vs real gymnasium MuJoCo envs.

The reference's bar (``mujoco/gym/mujoco_gym_align_test.py:37-100``) is
stepping EnvPool and the original Python env from identical injected
states and asserting equality.  Here:

- *Obs parity*: inject (qpos, qvel) into gymnasium via ``set_state`` and
  compare its ``_get_obs()`` to our ``observe(qpos, qvel)`` exactly
  (float32 tolerance).
- *Reward parity*: step gymnasium from the injected state with a random
  action; feed its *own* before/after states into our ``reward_done`` and
  compare the scalar reward + termination flag.  This isolates the reward
  pipeline from solver drift.

Dynamics alignment lives in test_physics.py (contact-free exact,
contact behavioral).
"""

import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")
pytest.importorskip("mujoco")

from envpool_tpu.core.registry import registry  # noqa: E402

# (task_id, obs_atol, check_obs, check_reward)
TASKS = [
    ("HalfCheetah-v4", 1e-5, True, True),
    ("Hopper-v4", 1e-5, True, True),
    ("Walker2d-v4", 1e-5, True, True),
    ("Swimmer-v4", 1e-5, True, True),
    ("Ant-v4", 1e-4, True, True),
    ("Reacher-v4", 1e-5, True, True),
    # Pusher-v4 raises ImportError under mujoco>=3 in gymnasium (issue
    # #950) — v5 below covers the shared obs/reward pipeline.
    ("InvertedPendulum-v4", 1e-5, True, True),
    ("InvertedDoublePendulum-v4", 1e-4, True, True),
    ("Pusher-v5", 1e-4, True, True),
    ("Hopper-v5", 1e-5, True, True),
    ("Walker2d-v5", 1e-5, True, True),
    ("HalfCheetah-v5", 1e-5, True, True),
    ("Reacher-v5", 1e-5, True, True),
]


def _sample_state(genv, rng):
    # Quantize to float32 so both sides see bit-identical injected states
    # (our engine is float32; float64-only differences would otherwise
    # show up as cancellation noise in velocity-based rewards).
    m = genv.unwrapped.model
    qpos = (genv.unwrapped.init_qpos + rng.uniform(-0.08, 0.08, m.nq)).astype(
        np.float32
    ).astype(np.float64)
    qvel = rng.uniform(-0.1, 0.1, m.nv).astype(np.float32).astype(np.float64)
    return qpos, qvel


@pytest.mark.parametrize("task_id,atol,check_obs,check_reward", TASKS)
def test_obs_and_reward_lockstep(task_id, atol, check_obs, check_reward):
    genv = gymnasium.make(task_id)
    genv.reset(seed=0)
    g = genv.unwrapped
    myenv = registry._env(task_id, num_envs=1)
    rng = np.random.default_rng(0)

    for trial in range(5):
        qpos, qvel = _sample_state(g, rng)
        g.set_state(qpos, qvel)
        if check_obs:
            gobs = np.asarray(g._get_obs(), np.float64)
            mobs = np.asarray(
                myenv.observe(
                    np.asarray(qpos, np.float32), np.asarray(qvel, np.float32)
                ),
                np.float64,
            )
            assert gobs.shape == mobs.shape, (task_id, gobs.shape, mobs.shape)
            np.testing.assert_allclose(
                mobs, gobs, atol=max(atol, 1e-5 * np.abs(gobs).max()),
                err_msg=f"{task_id} obs mismatch (trial {trial})",
            )
        if check_reward:
            m = g.model
            lo = np.where(
                m.actuator_ctrllimited.astype(bool), m.actuator_ctrlrange[:, 0], -1
            )
            hi = np.where(
                m.actuator_ctrllimited.astype(bool), m.actuator_ctrlrange[:, 1], 1
            )
            action = rng.uniform(lo, hi).astype(np.float32)
            before = {
                "qpos": np.asarray(qpos, np.float32),
                "qvel": np.asarray(qvel, np.float32),
            }
            obs, r_gym, term, trunc, info = g.step(action)
            after = {
                "qpos": np.asarray(g.data.qpos, np.float32),
                "qvel": np.asarray(g.data.qvel, np.float32),
            }
            r_mine, term_mine, _ = myenv.reward_done(before, after, action)
            np.testing.assert_allclose(
                float(r_mine),
                float(r_gym),
                atol=5e-3,
                rtol=1e-4,
                err_msg=f"{task_id} reward mismatch (trial {trial})",
            )
            assert bool(term_mine) == bool(term), (
                f"{task_id} termination mismatch (trial {trial})"
            )
    genv.close()


def test_humanoid_obs_layout_blocks():
    """Humanoid obs: qpos/qvel blocks exact; com blocks same layout/scale.

    cinert/cvel/cfrc_ext come from our own engine quantities (documented
    approximation, envs/mujoco_gym/humanoid.py) — assert shape + the
    worldbody-row convention rather than exact values.
    """
    genv = gymnasium.make("Humanoid-v4")
    genv.reset(seed=0)
    g = genv.unwrapped
    myenv = registry._env("Humanoid-v4", num_envs=1)
    rng = np.random.default_rng(1)
    qpos = g.init_qpos + rng.uniform(-0.01, 0.01, g.model.nq)
    qvel = rng.uniform(-0.05, 0.05, g.model.nv)
    g.set_state(qpos, qvel)
    gobs = np.asarray(g._get_obs(), np.float64)
    mobs = np.asarray(
        myenv.observe(np.asarray(qpos, np.float32), np.asarray(qvel, np.float32)),
        np.float64,
    )
    assert gobs.shape == mobs.shape == (376,)
    nq, nv = g.model.nq, g.model.nv
    k = (nq - 2) + nv
    np.testing.assert_allclose(mobs[:k], gobs[:k], atol=1e-5)
    # cinert block: worldbody row zero in both; mass entries (every 10th
    # element offset 9) match exactly (mass is config, not dynamics).
    nb = g.model.nbody
    cin_g = gobs[k : k + nb * 10].reshape(nb, 10)
    cin_m = mobs[k : k + nb * 10].reshape(nb, 10)
    np.testing.assert_allclose(cin_m[0], cin_g[0], atol=1e-6)
    np.testing.assert_allclose(cin_m[1:, 9], cin_g[1:, 9], atol=1e-3)
    genv.close()


def test_humanoid_reward_lockstep():
    """Humanoid reward from oracle-produced states (com-based velocity)."""
    genv = gymnasium.make("Humanoid-v4")
    genv.reset(seed=0)
    g = genv.unwrapped
    myenv = registry._env("Humanoid-v4", num_envs=1)
    rng = np.random.default_rng(2)
    for _ in range(3):
        qpos = g.init_qpos + rng.uniform(-0.01, 0.01, g.model.nq)
        qvel = rng.uniform(-0.05, 0.05, g.model.nv)
        g.set_state(qpos, qvel)
        action = rng.uniform(-0.4, 0.4, g.model.nu).astype(np.float32)
        before = {
            "qpos": np.asarray(qpos, np.float32),
            "qvel": np.asarray(qvel, np.float32),
        }
        obs, r_gym, term, trunc, info = g.step(action)
        after = {
            "qpos": np.asarray(g.data.qpos, np.float32),
            "qvel": np.asarray(g.data.qvel, np.float32),
        }
        r_mine, term_mine, _ = myenv.reward_done(before, after, action)
        np.testing.assert_allclose(float(r_mine), float(r_gym), atol=2e-2)
        assert bool(term_mine) == bool(term)
    genv.close()
