"""Robotics family invariants (registry, specs, behavior).

Oracle lockstep for the exact parts lives in test_robotics_oracle.py;
these tests cover the surrogate dynamics and the EnvPool-surface parity
(157 ids, obs dims per envpool/mujoco/robotics/registration.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.core.registry import registry

ROBOTICS_PREFIXES = (
    "Fetch", "HandReach", "HandManipulate", "AdroitHand", "PointMaze",
    "FrankaKitchen",
)


def test_157_ids_registered():
    ids = [
        t for t in envpool_tpu.list_all_envs()
        if t.startswith(ROBOTICS_PREFIXES)
    ]
    assert len(ids) == 157, len(ids)
    # Spot-check the exact id grammar of the reference.
    for tid in (
        "FetchReachDense-v1",
        "FetchSlide-v4",
        "HandReachDense-v0",
        "HandManipulateBlockRotateParallel-v0",
        "HandManipulateEggRotate_ContinuousTouchSensorsDense-v1",
        "HandManipulatePenFull-v0",
        "AdroitHandRelocateSparse-v1",
        "PointMaze_Open_Diverse_GRDense-v3",
        "FrankaKitchen-v1",
    ):
        assert tid in ids, tid


@pytest.mark.parametrize(
    "tid,obs_dim,goal_dim,act_dim",
    [
        ("FetchReach-v1", 10, 3, 4),
        ("FetchPush-v4", 25, 3, 4),
        ("FetchSlideDense-v1", 25, 3, 4),
        ("HandReach-v0", 63, 15, 20),
        ("HandManipulateBlockFull-v1", 61, 7, 20),
        ("HandManipulateEgg_BooleanTouchSensors-v0", 153, 7, 20),
        ("PointMaze_Large-v3", 4, 2, 2),
    ],
)
def test_goal_env_spec_dims(tid, obs_dim, goal_dim, act_dim):
    env = registry._env(tid, num_envs=1)
    spec = env.state_spec()
    assert spec["obs:observation"].shape == (obs_dim,)
    assert spec["obs:achieved_goal"].shape == (goal_dim,)
    assert spec["obs:desired_goal"].shape == (goal_dim,)
    assert env.action_spec()["action"].shape == (act_dim,)


@pytest.mark.parametrize(
    "tid,obs_dim,act_dim",
    [
        ("AdroitHandDoor-v1", 39, 28),
        ("AdroitHandHammer-v1", 46, 26),
        ("AdroitHandPen-v1", 45, 24),
        ("AdroitHandRelocate-v1", 39, 30),
    ],
)
def test_adroit_spec_dims(tid, obs_dim, act_dim):
    env = registry._env(tid, num_envs=1)
    assert env.state_spec()["obs"].shape == (obs_dim,)
    assert env.action_spec()["action"].shape == (act_dim,)


def test_point_maze_walls_block_and_slide():
    env = registry._env("PointMaze_UMaze-v3", num_envs=1)
    # Drive the ball hard into the left wall from the top corridor.
    pos = jnp.asarray([-1.2, 1.0], jnp.float32)
    vel = jnp.asarray([-3.0, 0.0], jnp.float32)
    new_pos, new_vel = env._resolve_walls(
        pos + 0.1 * vel, vel
    )
    # U_MAZE: cells at col 0 are walls (x in [-2.5,-1.5]); ball radius .1.
    assert float(new_pos[0]) >= -1.4 - 1e-5
    assert float(new_vel[0]) == 0.0  # normal velocity killed
    assert float(new_vel[1]) == vel[1]  # tangential preserved (slide)


def test_point_maze_reset_distribution():
    env = registry._env("PointMaze_UMaze-v3", num_envs=1)
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    for k in keys[:16]:
        st, obs = env.reset_env(k)
        # Reset >0.5 away from goal cell center semantics: noisy reset
        # position must never equal the goal.
        d = float(jnp.linalg.norm(st["pos"] - st["goal"]))
        assert d > 0.25 - 1e-6
        # Ball starts inside the maze bounds.
        assert abs(float(st["pos"][0])) <= 2.5
        assert abs(float(st["pos"][1])) <= 2.5


def test_point_maze_continuing_task_resamples_goal():
    env = registry._env(
        "PointMaze_Open_Diverse_G-v3", num_envs=1, max_episode_steps=1000
    )
    key = jax.random.PRNGKey(3)
    st, _ = env.reset_env(key)
    # Teleport onto the goal and step: goal must move, no termination.
    st = dict(st)
    st["pos"] = st["goal"]
    out = env.step_env(st, jnp.zeros(2, jnp.float32), key)
    assert not bool(out.terminated)
    assert float(jnp.linalg.norm(out.state["goal"] - st["goal"])) > 1e-6
    assert float(out.reward) == 1.0  # sparse success reward


def test_fetch_push_object_moves():
    env = registry._env("FetchPushDense-v4", num_envs=1)
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    obj0 = np.asarray(st["obj_pos"])
    # Drive the gripper toward the object for 30 steps.
    for t in range(30):
        direction = np.asarray(st["obj_pos"] - st["grip_pos"])[:3]
        n = np.linalg.norm(direction) + 1e-8
        a = jnp.asarray(
            np.concatenate([direction / n, [0.0]]), jnp.float32
        )
        out = env.step_env(st, a, jax.random.fold_in(key, t))
        st = out.state
    moved = np.linalg.norm(np.asarray(st["obj_pos"])[:2] - obj0[:2])
    assert moved > 0.01, f"push never moved the object ({moved})"
    assert not bool(out.terminated)  # fetch never terminates


def test_fetch_pick_and_place_grasp_lifts():
    env = registry._env("FetchPickAndPlace-v4", num_envs=1)
    key = jax.random.PRNGKey(1)
    st, _ = env.reset_env(key)
    # Move above the object, open, descend, close, lift.
    for t in range(60):
        rel = np.asarray(st["obj_pos"] - st["grip_pos"])
        a = np.zeros(4, np.float32)
        if np.linalg.norm(rel) > 0.03:
            a[:3] = np.clip(rel / 0.05, -1, 1)
            a[3] = 1.0  # open while approaching
        else:
            a[3] = -1.0  # close
        out = env.step_env(st, jnp.asarray(a), jax.random.fold_in(key, t))
        st = out.state
        if bool(st["grasped"]):
            break
    assert bool(st["grasped"]), "grasp never engaged"
    # Now lift: object should follow the gripper upward.
    z0 = float(st["obj_pos"][2])
    for t in range(10):
        out = env.step_env(
            st,
            jnp.asarray([0, 0, 1.0, -1.0], jnp.float32),
            jax.random.fold_in(key, 100 + t),
        )
        st = out.state
    assert float(st["obj_pos"][2]) > z0 + 0.05


def test_hand_reach_success_reachable():
    """Driving joints toward the goal-matching pose succeeds."""
    env = registry._env("HandReach-v3", num_envs=1)
    key = jax.random.PRNGKey(2)
    st, obs = env.reset_env(key)
    # initial_goal case (10% of resets): goal == fingertips at init pose.
    st = dict(st)
    st["goal"] = jnp.asarray(env.initial_goal.reshape(-1))
    d0 = float(jnp.linalg.norm(env._fingertips(st["qpos"]) - st["goal"]))
    assert d0 < 1e-4  # starts at the initial pose


def test_hand_manipulate_rotation_controllable():
    env = registry._env("HandManipulateBlockRotateZ-v1", num_envs=1)
    key = jax.random.PRNGKey(4)
    st, _ = env.reset_env(key)
    q0 = np.asarray(st["obj_quat"])
    # Wiggle fingers: object orientation must respond deterministically.
    a = jnp.asarray(np.tile([1.0, -1.0], 10), jnp.float32)
    out1 = env.step_env(st, a, key)
    out2 = env.step_env(st, a, key)
    np.testing.assert_allclose(
        np.asarray(out1.state["obj_quat"]), np.asarray(out2.state["obj_quat"])
    )
    assert np.linalg.norm(np.asarray(out1.state["obj_quat"]) - q0) > 1e-4


def test_adroit_sparse_reward_values():
    env = registry._env("AdroitHandDoorSparse-v1", num_envs=1)
    key = jax.random.PRNGKey(5)
    st, _ = env.reset_env(key)
    out = env.step_env(st, jnp.zeros(28, jnp.float32), key)
    assert abs(float(out.reward) - (-0.1)) < 1e-6
    st2 = dict(out.state)
    st2["hinge"] = jnp.float32(1.4)
    out2 = env.step_env(st2, jnp.zeros(28, jnp.float32), key)
    # hinge stays >= 1.35 (clip range 1.57) → success reward 10.
    assert float(out2.reward) == 10.0


def test_kitchen_completion_flow():
    env = registry._env("FrankaKitchen-v1", num_envs=1)
    key = jax.random.PRNGKey(6)
    st, obs = env.reset_env(key)
    assert float(jnp.sum(st["todo"])) == 7.0
    # Force-complete the microwave by setting its dof to the goal.
    st = dict(st)
    st["qpos"] = st["qpos"].at[22].set(-0.75)
    out = env.step_env(st, jnp.zeros(9, jnp.float32), key)
    assert float(out.reward) >= 1.0  # one task newly completed
    assert float(out.state["todo"][5]) == 0.0  # microwave removed
    # Completing it again scores nothing.
    out2 = env.step_env(dict(out.state), jnp.zeros(9, jnp.float32), key)
    assert float(out2.state["step_done"][5]) == 0.0


def test_pool_truncation_at_max_steps():
    env = envpool_tpu.make(
        "FetchReach-v4", env_type="gymnasium", num_envs=2, seed=0
    )
    obs, info = env.reset()
    for t in range(50):
        obs, rew, term, trunc, info = env.step(
            np.zeros((2, 4), np.float32)
        )
    assert trunc.all() and not term.any()


def test_dm_flavor_and_xla():
    dm = envpool_tpu.make_dm("PointMaze_UMaze-v3", num_envs=2, seed=1)
    ts = dm.reset()
    assert ts.observation.observation.shape == (2, 4)
    pool = envpool_tpu.make(
        "FetchReach-v4", env_type="gymnasium", num_envs=4, seed=2,
        numpy_output=False,
    )
    handle, recv, send, step = pool.xla()
    import jax

    @jax.jit
    def run(h):
        def body(i, h):
            h, _ = step(h, jnp.zeros((4, 4), jnp.float32))
            return h
        return jax.lax.fori_loop(0, 5, body, h)

    run(handle)
