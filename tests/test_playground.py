"""MuJoCo Playground family tests (27 ids, structure + behavior)."""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu
from envpool_tpu.core.registry import registry

REF_IDS = [
    "AlohaHandOver-v1", "AlohaSinglePegInsertion-v1",
    "ApolloJoystickFlatTerrain-v1", "BarkourJoystick-v1",
    "BerkeleyHumanoidJoystickFlatTerrain-v1",
    "BerkeleyHumanoidJoystickRoughTerrain-v1",
    "G1JoystickFlatTerrain-v1", "G1JoystickRoughTerrain-v1",
    "Go1JoystickFlatTerrain-v1", "Go1JoystickRoughTerrain-v1",
    "Go1Getup-v1", "Go1Handstand-v1", "Go1Footstand-v1",
    "H1InplaceGaitTracking-v1", "H1JoystickGaitTracking-v1",
    "LeapCubeReorient-v1", "LeapCubeRotateZAxis-v1",
    "Op3Joystick-v1", "PandaPickCube-v1", "PandaPickCubeCartesian-v1",
    "PandaPickCubeOrientation-v1", "PandaOpenCabinet-v1",
    "PandaRobotiqPushCube-v1", "AeroCubeRotateZAxis-v1",
    "SpotFlatTerrainJoystick-v1", "SpotGetup-v1",
    "SpotJoystickGaitTracking-v1", "T1JoystickFlatTerrain-v1",
    "T1JoystickRoughTerrain-v1",
]


def test_all_ids_and_aliases():
    ids = set(envpool_tpu.list_all_envs())
    missing = [t for t in REF_IDS if t not in ids]
    assert not missing, missing
    for t in REF_IDS:
        assert f"MuJoCoPlayground/{t}" in ids, t


def test_action_dims_match_real_robots():
    from envpool_tpu.envs.playground.locomotion import ROBOT_NU

    for tid, robot in (
        ("Go1JoystickFlatTerrain-v1", "go1"),
        ("G1JoystickFlatTerrain-v1", "g1"),
        ("H1JoystickGaitTracking-v1", "h1"),
        ("SpotFlatTerrainJoystick-v1", "spot"),
        ("Op3Joystick-v1", "op3"),
    ):
        env = registry._env(tid, num_envs=1)
        assert env.action_spec()["action"].shape == (ROBOT_NU[robot],)


def test_joystick_tracking_reward_responds_to_command():
    env = registry._env("Go1JoystickFlatTerrain-v1", num_envs=1)
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    # Zero command + standing still → near-max tracking reward terms.
    st = dict(st)
    st["command"] = jnp.zeros(3, jnp.float32)
    out = env.step_env(st, jnp.zeros(12, jnp.float32), key)
    r_still = float(out.reward)
    st["command"] = jnp.asarray([1.0, 0.0, 0.0])
    out2 = env.step_env(st, jnp.zeros(12, jnp.float32), key)
    r_moving_cmd = float(out2.reward)
    assert r_still > r_moving_cmd, (r_still, r_moving_cmd)
    # Command appears at the obs tail.
    np.testing.assert_allclose(
        np.asarray(out2.obs["obs"])[-3:], [1.0, 0.0, 0.0]
    )


def test_getup_reward_increases_with_uprightness():
    env = registry._env("Go1Getup-v1", num_envs=1)
    key = jax.random.PRNGKey(1)
    st, _ = env.reset_env(key)
    out_fallen = env.step_env(st, jnp.zeros(12, jnp.float32), key)
    # Upright pose scores higher.
    st2 = dict(st)
    st2["qpos"] = st2["qpos"].at[3:7].set(
        jnp.asarray([1.0, 0.0, 0.0, 0.0])
    ).at[2].set(0.55)
    out_up = env.step_env(st2, jnp.zeros(12, jnp.float32), key)
    assert float(out_up.reward) > float(out_fallen.reward)


def test_cube_rotate_success_and_goal_resample():
    env = registry._env("LeapCubeRotateZAxis-v1", num_envs=1)
    key = jax.random.PRNGKey(2)
    st, _ = env.reset_env(key)
    st = dict(st)
    st["quat"] = st["goal"]  # already at the goal orientation
    out = env.step_env(st, jnp.zeros(16, jnp.float32), key)
    assert float(out.reward) > 50.0  # success bonus
    # Goal resampled (continuing task).
    assert (
        np.linalg.norm(np.asarray(out.state["goal"]) - np.asarray(st["goal"]))
        > 1e-4
    )


def test_panda_pick_and_place_success():
    env = registry._env(
        "PandaPickCube-v1", num_envs=1, success_threshold=0.08
    )
    key = jax.random.PRNGKey(3)
    st, _ = env.reset_env(key)
    # Drive ee to the object, close, carry toward the goal.
    for t in range(200):
        ee = np.asarray(st["ee"][0])
        obj = np.asarray(st["obj"])
        goal = np.asarray(st["goal"])
        held = int(st["grasped"]) >= 0
        target = goal if held else obj
        rel = target - ee
        a = np.zeros((1, 4), np.float32)
        a[0, :3] = np.clip(rel / 0.04, -1, 1)
        a[0, 3] = 1.0 if (held or np.linalg.norm(rel) < 0.05) else -1.0
        out = env.step_env(
            st, jnp.asarray(a.ravel()), jax.random.fold_in(key, t)
        )
        st = dict(out.state)
        if float(out.obs["info:success"]) == 1.0:
            break
    assert float(out.obs["info:success"]) == 1.0


def test_joystick_tracking_reward_closed_form():
    """Quantitative fidelity bound for the joystick recipe: the tracking
    terms follow the published MuJoCo-Playground form
    scale·exp(-err/σ) with σ = 0.25 (= exp(-4·err)).  With all penalty
    scales zeroed, a stationary robot with a zero command must earn
    exactly lin_scale + ang_scale; with a commanded velocity v it must
    earn lin_scale·exp(-4·|v|²) + ang_scale (robot still at rest)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from envpool_tpu.core.registry import registry

    ids = [i for i in envpool_tpu.list_all_envs()
           if "Joystick" in i and "Go1" in i]
    env = registry._env(
        ids[0], num_envs=1,
        lin_vel_z_scale=0.0, ang_vel_xy_scale=0.0, action_rate_scale=0.0,
        obs_noise_level=0.0,
    )
    st, _ = env.reset_env(jax.random.PRNGKey(0))
    st = dict(st)
    # Put the robot exactly at rest in its nominal pose.
    st["qpos"] = jnp.asarray(env.model.qpos0, jnp.float32)
    st["qvel"] = jnp.zeros(env.model.nv, jnp.float32)
    st["prev_action"] = jnp.zeros(env.nu_agent, jnp.float32)

    lin_s = float(env.config["tracking_lin_vel_scale"])
    ang_s = float(env.config["tracking_ang_vel_scale"])

    st["command"] = jnp.zeros(3, jnp.float32)
    r0, _ = env._reward(st, st, jnp.zeros(env.nu_agent, jnp.float32))
    np.testing.assert_allclose(float(r0), lin_s + ang_s, rtol=1e-5)

    st["command"] = jnp.asarray([0.5, 0.0, 0.0], jnp.float32)
    r1, _ = env._reward(st, st, jnp.zeros(env.nu_agent, jnp.float32))
    want = lin_s * float(np.exp(-4.0 * 0.25)) + ang_s
    np.testing.assert_allclose(float(r1), want, rtol=1e-5)


def test_go1_runs_real_morphology():
    """Go1 tasks step the authored Unitree-spec morphology (12 native
    actuated hinges on a free trunk — no padded stand-in) with the
    playground PD recipe, and survive a standing rollout."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from envpool_tpu.core.registry import registry

    env = registry._env("Go1JoystickFlatTerrain-v1", num_envs=1)
    assert env.real_morph
    assert env.model.nu == 12 and env.nu_agent == 12  # native, unpadded
    assert env.model.nv == 18  # free base + 12 hinges
    st, obs = env.reset_env(jax.random.PRNGKey(0))
    z0 = float(st["qpos"][2])
    for t in range(25):
        out = env.step_env(
            st, jnp.zeros(12, jnp.float32), jax.random.PRNGKey(t)
        )
        st = out.state
    z = float(st["qpos"][2])
    # PD holds the standing pose: torso neither collapsed nor launched.
    assert 0.5 * z0 < z < 2.0 * z0, (z0, z)
    assert float(jnp.linalg.norm(st["qvel"])) < 10.0
