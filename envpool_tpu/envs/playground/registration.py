"""MuJoCo Playground registration — 27 ids
(``envpool/mujoco/playground/registration.py:21-168``)."""

from typing import Any

from ...core.registry import register

_PATH = "envpool_tpu.envs.playground"


def _reg(task_name: str, env_cls: str, steps: int, **kw: Any) -> None:
    register(
        task_id=f"{task_name}-v1",
        aliases=(f"MuJoCoPlayground/{task_name}-v1",),
        import_path=_PATH,
        env_cls=env_cls,
        max_episode_steps=steps,
        **kw,
    )


# Locomotion: joystick command tracking.  Per-robot PD gains: the
# class default (35, 0.5) is the published Go1 joystick gain; the
# heavier real morphologies (robot_models.py) need stiffer holding
# torques (sized to m*g*L gravity torque at the standing pose).
_GAINS = {
    "spot": {"kp": 300.0, "kd": 5.0},
    "h1": {"kp": 200.0, "kd": 5.0},
    "g1": {"kp": 300.0, "kd": 8.0},
}

for _name, _robot, _rough in (
    ("ApolloJoystickFlatTerrain", "apollo", False),
    ("BarkourJoystick", "barkour", False),
    ("BerkeleyHumanoidJoystickFlatTerrain", "berkeley_humanoid", False),
    ("BerkeleyHumanoidJoystickRoughTerrain", "berkeley_humanoid", True),
    ("G1JoystickFlatTerrain", "g1", False),
    ("G1JoystickRoughTerrain", "g1", True),
    ("Go1JoystickFlatTerrain", "go1", False),
    ("Go1JoystickRoughTerrain", "go1", True),
    ("Op3Joystick", "op3", False),
    ("T1JoystickFlatTerrain", "t1", False),
    ("T1JoystickRoughTerrain", "t1", True),
):
    _reg(_name, "JoystickEnv", 1000, robot=_robot, rough_terrain=_rough,
         **_GAINS.get(_robot, {}))

_reg(
    "H1InplaceGaitTracking", "JoystickEnv", 1000, robot="h1",
    action_scale=0.6, history_len=3, obs_noise_level=1.0,
    feet_phase_scale=2.0, pose_scale=-0.5, gait_frequency_max=4.0,
    gait_count=2, **_GAINS["h1"],
)
_reg("H1JoystickGaitTracking", "JoystickEnv", 1000, robot="h1",
     **_GAINS["h1"])
_reg(
    "SpotFlatTerrainJoystick", "JoystickEnv", 1000, robot="spot",
    **_GAINS["spot"]
)
_reg(
    "SpotJoystickGaitTracking", "JoystickEnv", 1000, robot="spot",
    kp=400.0, kd=10.0, action_scale=0.6, tracking_lin_vel_scale=0.5,
    tracking_ang_vel_scale=0.5, feet_phase_scale=2.0,
    ang_vel_xy_scale=-0.5, lin_vel_z_scale=-0.5, hip_splay_scale=-0.5,
    lin_vel_y_min=-0.5, lin_vel_y_max=0.5,
)

# Getup / handstand.
_reg("Go1Getup", "GetupEnv", 300, robot="go1")
_reg(
    "SpotGetup", "GetupEnv", 300, robot="spot", kp=400.0, kd=20.0,
    action_scale=0.6, noise_joint_pos=0.01, noise_gyro=0.2,
    noise_gravity=0.05, orientation_scale=1.0, torso_height_scale=1.0,
    posture_scale=1.0, stand_still_scale=1.0, torques_scale=0.0,
    action_rate_scale=0.0,
)
_reg("Go1Handstand", "HandstandEnv", 500, robot="go1", mode="handstand")
_reg("Go1Footstand", "HandstandEnv", 500, robot="go1", mode="footstand")

# Manipulation.
_reg("AlohaHandOver", "ArmPickEnv", 250, task="handover", n_arms=2)
_reg(
    "AlohaSinglePegInsertion", "ArmPickEnv", 1000, task="insert",
    n_arms=2, ctrl_dt=0.0025, sim_dt=0.0025, action_repeat=2,
    action_scale=0.005,
)
_reg("PandaPickCube", "ArmPickEnv", 150, task="pick")
_reg(
    "PandaPickCubeCartesian", "ArmPickEnv", 200, task="pick",
    ctrl_dt=0.05, sim_dt=0.005, action_scale=0.005,
    robot_target_qpos_scale=0.0,
)
_reg("PandaPickCubeOrientation", "ArmPickEnv", 150, task="pick")
_reg("PandaOpenCabinet", "ArmPickEnv", 150, task="cabinet")
_reg("PandaRobotiqPushCube", "ArmPickEnv", 3000, task="push")

# Hand cubes.
_reg(
    "LeapCubeReorient", "CubeRotateEnv", 1000, mode="reorient",
    action_scale=0.5, success_reward=100.0, angvel_scale=0.0,
    orientation_scale=5.0, position_scale=0.5, hand_pose_scale=-0.5,
    action_rate_scale=-0.001, energy_scale=-0.001,
)
_reg("LeapCubeRotateZAxis", "CubeRotateEnv", 500, mode="z_axis")
_reg(
    "AeroCubeRotateZAxis", "CubeRotateEnv", 500, mode="z_axis",
    action_rate_scale=-1.0,
)
