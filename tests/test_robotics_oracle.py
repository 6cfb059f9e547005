"""Robotics family lockstep tests vs the installed gymnasium_robotics.

The reference's bar is oracle alignment (``robotics_test.py``).  The pip
package's hand/fetch XMLs predate mujoco 3 (``apirate``), so oracle envs
are built against the patched asset tree used by the envs themselves
(envs/robotics/hand.py:patched_assets_dir).

Covered exactly: Fetch compute_reward / obs assembly / goal-sampling law,
PointMaze dynamics + reward + maze tables, HandReach fingertip FK +
reward, HandManipulate quaternion goal distance / success / reward.
Surrogate interaction dynamics (Fetch object contact, HandManipulate
object twist, Adroit, Kitchen) are invariant-tested in test_robotics.py.
"""

import numpy as np
import pytest

gr = pytest.importorskip("gymnasium_robotics")
pytest.importorskip("mujoco")

import gymnasium as gym  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from envpool_tpu.core.registry import registry  # noqa: E402
from envpool_tpu.envs.robotics.hand import patched_assets_dir  # noqa: E402

gym.register_envs(gr)


# ---------------------------------------------------------------------------
# PointMaze
# ---------------------------------------------------------------------------


def test_point_maze_reward_and_tables():
    genv = gym.make("PointMaze_MediumDense-v3").unwrapped
    me = registry._env("PointMaze_MediumDense-v3", num_envs=1)
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = rng.uniform(-4, 4, 2)
        g = rng.uniform(-4, 4, 2)
        r_o = genv.compute_reward(a, g, {})
        d = np.linalg.norm(a - g)
        r_m = float(np.exp(-d))
        np.testing.assert_allclose(r_m, r_o, rtol=1e-6)
    # Maze tables: same goal/reset cell sets.
    oracle_goals = np.asarray(genv.maze.unique_goal_locations)
    mine = np.asarray(me.goal_cells, np.float64)
    assert sorted(map(tuple, np.round(oracle_goals, 6))) == sorted(
        map(tuple, np.round(mine, 6))
    )
    oracle_resets = np.asarray(genv.maze.unique_reset_locations)
    mine_r = np.asarray(me.reset_cells, np.float64)
    assert sorted(map(tuple, np.round(oracle_resets, 6))) == sorted(
        map(tuple, np.round(mine_r, 6))
    )
    genv.close()


def test_point_maze_free_space_dynamics_lockstep():
    """Euler + implicit damping matches MuJoCo away from walls."""
    genv = gym.make("PointMaze_Open-v3").unwrapped
    me = registry._env("PointMaze_Open-v3", num_envs=1)
    point = genv.point_env
    rng = np.random.default_rng(1)
    genv.reset(seed=0)
    pos = np.array([0.3, 0.2])
    vel = np.array([0.5, -0.4])
    point.set_state(pos.copy(), vel.copy())
    mpos, mvel = jnp.asarray(pos, jnp.float32), jnp.asarray(vel, jnp.float32)
    import envpool_tpu.envs.robotics.point_maze as pm

    for t in range(20):
        a = rng.uniform(-1, 1, 2)
        obs, *_ = point.step(a.astype(np.float32))
        # Mirror: clip vel, implicit-damping Euler, integrate.
        v = np.clip(np.asarray(mvel, np.float64), -5, 5)
        force = np.clip(a, -1, 1) * pm._GEAR
        v = (pm._BALL_MASS * v + pm._DT * force) / (
            pm._BALL_MASS + pm._DT * pm._DAMPING
        )
        p = np.asarray(mpos, np.float64) + pm._DT * v
        mpos, mvel = jnp.asarray(p, jnp.float32), jnp.asarray(v, jnp.float32)
        np.testing.assert_allclose(
            np.concatenate([p, v]), obs, atol=2e-4,
            err_msg=f"point dynamics diverged at step {t}",
        )
    genv.close()


# ---------------------------------------------------------------------------
# Fetch
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "tid", ["FetchReach-v4", "FetchPushDense-v4", "FetchPickAndPlace-v4"]
)
def test_fetch_compute_reward_lockstep(tid):
    genv = gym.make(tid).unwrapped
    me = registry._env(tid, num_envs=1)
    rng = np.random.default_rng(2)
    for _ in range(50):
        a = rng.uniform(0.5, 1.5, 3)
        g = a + rng.uniform(-0.2, 0.2, 3)
        r_o = genv.compute_reward(a, g, {})
        r_m = float(me.compute_reward(jnp.asarray(a), jnp.asarray(g)))
        np.testing.assert_allclose(r_m, r_o, rtol=1e-5, atol=1e-6)
    genv.close()


def test_fetch_obs_assembly_lockstep():
    """assemble_obs reproduces the oracle's _get_obs concatenation."""
    from envpool_tpu.envs.robotics.fetch import FetchEnv

    genv = gym.make("FetchPush-v4").unwrapped
    obs0, _ = genv.reset(seed=3)
    for _ in range(5):
        a = np.random.default_rng(4).uniform(-1, 1, 4).astype(np.float32)
        obs, *_ = genv.step(a)
    (grip_pos, object_pos, object_rel_pos, gripper_state, object_rot,
     object_velp, object_velr, grip_velp, gripper_vel) = (
        genv.generate_mujoco_observations()
    )
    mine = np.asarray(
        FetchEnv.assemble_obs(
            jnp.asarray(grip_pos),
            jnp.asarray(object_pos),
            jnp.asarray(gripper_state),
            jnp.asarray(object_rot),
            jnp.asarray(object_velp),
            jnp.asarray(object_velr),
            jnp.asarray(grip_velp),
            jnp.asarray(gripper_vel),
            True,
        )
    )
    np.testing.assert_allclose(mine, obs["observation"], atol=1e-6)
    genv.close()


@pytest.mark.parametrize("tid", ["FetchReach-v4", "FetchSlide-v4"])
def test_fetch_goal_sampling_law(tid):
    """Same support and moments as the oracle's _sample_goal."""
    import jax

    genv = gym.make(tid).unwrapped
    genv.reset(seed=5)
    me = registry._env(tid, num_envs=1)
    oracle = np.stack([genv._sample_goal() for _ in range(400)])
    keys = jax.random.split(jax.random.PRNGKey(0), 400)
    mine = np.stack([np.asarray(me.sample_goal(k)) for k in keys])
    # Identical support box per dimension (within sampling error).
    np.testing.assert_allclose(
        mine.min(0), oracle.min(0), atol=0.05,
        err_msg=f"{tid} goal support lower bound",
    )
    np.testing.assert_allclose(
        mine.max(0), oracle.max(0), atol=0.05,
        err_msg=f"{tid} goal support upper bound",
    )
    np.testing.assert_allclose(mine.mean(0), oracle.mean(0), atol=0.04)
    genv.close()


def test_fetch_tracking_gain_calibration():
    """The modelled ee step response stays within 20% of the oracle's."""
    genv = gym.make("FetchReach-v4").unwrapped
    obs, _ = genv.reset(seed=0)
    total = 0.0
    for _ in range(5):
        before = obs["observation"][0]
        obs, *_ = genv.step(np.array([1.0, 0, 0, 0], np.float32))
        total += obs["observation"][0] - before
    oracle_step = total / 5
    from envpool_tpu.envs.robotics.fetch import _TRACK_GAIN

    assert abs(_TRACK_GAIN * 0.05 - oracle_step) < 0.2 * oracle_step
    genv.close()


# ---------------------------------------------------------------------------
# HandReach — fingertip FK is real: compare to mujoco site positions
# ---------------------------------------------------------------------------


def test_hand_reach_fingertip_fk_lockstep():
    import mujoco
    import os

    from envpool_tpu.envs.robotics.hand import FINGERTIP_SITES

    me = registry._env("HandReach-v3", num_envs=1)
    if me._site_idx is None:
        pytest.skip("hand MJCF not loadable by the physics engine")
    m = mujoco.MjModel.from_xml_path(
        os.path.join(patched_assets_dir(), "hand", "reach.xml")
    )
    d = mujoco.MjData(m)
    rng = np.random.default_rng(6)
    lo, hi = m.jnt_range[:, 0], m.jnt_range[:, 1]
    for trial in range(5):
        qpos = rng.uniform(lo, hi)
        d.qpos[:] = qpos
        d.qvel[:] = 0
        mujoco.mj_forward(m, d)
        oracle = np.stack(
            [d.site(s).xpos.copy() for s in FINGERTIP_SITES]
        ).reshape(-1)
        mine = np.asarray(me._fingertips(jnp.asarray(qpos, jnp.float32)))
        np.testing.assert_allclose(
            mine, oracle, atol=2e-5,
            err_msg=f"fingertip FK mismatch (trial {trial})",
        )


def test_hand_reach_reward_lockstep():
    me = registry._env("HandReachDense-v3", num_envs=1)
    rng = np.random.default_rng(7)
    for _ in range(20):
        a = rng.uniform(0.8, 1.2, 15)
        g = a + rng.uniform(-0.02, 0.02, 15)
        d = np.linalg.norm(a - g)
        r = float(me.compute_reward(jnp.asarray(a), jnp.asarray(g)))
        np.testing.assert_allclose(r, -d, rtol=1e-5, atol=1e-6)
    sparse = registry._env("HandReach-v3", num_envs=1)
    a = np.full(15, 1.0)
    assert float(sparse.compute_reward(jnp.asarray(a), jnp.asarray(a))) == 0.0
    g = a + 0.1
    assert float(sparse.compute_reward(jnp.asarray(a), jnp.asarray(g))) == -1.0


# ---------------------------------------------------------------------------
# HandManipulate — quaternion goal distance vs oracle rotations math
# ---------------------------------------------------------------------------


def _random_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


@pytest.mark.parametrize(
    "tid",
    ["HandManipulateBlock-v1", "HandManipulateBlockRotateZ-v1",
     "HandManipulatePenRotate-v1", "HandManipulateEggDense-v1"],
)
def test_hand_manipulate_goal_distance_lockstep(tid):
    from gymnasium_robotics.utils import rotations

    me = registry._env(tid, num_envs=1)
    rng = np.random.default_rng(8)
    for _ in range(25):
        a = np.concatenate([rng.uniform(0.9, 1.1, 3), _random_quat(rng)])
        b = np.concatenate([rng.uniform(0.9, 1.1, 3), _random_quat(rng)])
        # Oracle computation (manipulate.py _goal_distance).
        d_pos_o = 0.0
        if me.pos_mode != "ignore":
            d_pos_o = np.linalg.norm(a[:3] - b[:3])
        quat_a, quat_b = a[3:], b[3:]
        if me.ignore_z:
            ea = rotations.quat2euler(quat_a)
            eb = rotations.quat2euler(quat_b)
            ea[2] = eb[2]
            quat_a = rotations.euler2quat(ea)
        quat_diff = rotations.quat_mul(quat_a, rotations.quat_conjugate(quat_b))
        d_rot_o = 2 * np.arccos(np.clip(quat_diff[0], -1.0, 1.0))
        d_pos_m, d_rot_m = me.goal_distance(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(float(d_pos_m), d_pos_o, atol=1e-5)
        np.testing.assert_allclose(float(d_rot_m), d_rot_o, atol=1e-4)
        # Reward consistency.
        if me.sparse:
            succ = float(d_pos_o < me.d_thr) * float(d_rot_o < me.r_thr)
            np.testing.assert_allclose(
                float(me.compute_reward(jnp.asarray(a), jnp.asarray(b))),
                succ - 1.0,
            )
        else:
            np.testing.assert_allclose(
                float(me.compute_reward(jnp.asarray(a), jnp.asarray(b))),
                -(10.0 * d_pos_o + d_rot_o),
                atol=1e-4,
            )


def test_parallel_quats_match_oracle():
    from gymnasium_robotics.utils import rotations

    from envpool_tpu.envs.robotics.hand import PARALLEL_QUATS

    oracle = np.stack(
        [rotations.euler2quat(r) for r in rotations.get_parallel_rotations()]
    )
    assert PARALLEL_QUATS.shape == oracle.shape == (24, 4)
    # Same set (up to sign, q ~ -q).
    for q in oracle:
        diff = np.minimum(
            np.linalg.norm(PARALLEL_QUATS - q, axis=1),
            np.linalg.norm(PARALLEL_QUATS + q, axis=1),
        )
        assert diff.min() < 1e-5


# ---------------------------------------------------------------------------
# Kitchen — element constants parity
# ---------------------------------------------------------------------------


def test_kitchen_constants_match_oracle():
    from gymnasium_robotics.envs.franka_kitchen.kitchen_env import (
        OBS_ELEMENT_GOALS,
        OBS_ELEMENT_INDICES,
        BONUS_THRESH,
    )

    from envpool_tpu.envs.robotics import kitchen as k

    assert k.BONUS_THRESH == BONUS_THRESH
    for t in k.TASKS:
        np.testing.assert_array_equal(
            np.asarray(k.ELEMENT_INDICES[t]), OBS_ELEMENT_INDICES[t]
        )
        np.testing.assert_allclose(
            np.asarray(k.ELEMENT_GOALS[t]), OBS_ELEMENT_GOALS[t]
        )
