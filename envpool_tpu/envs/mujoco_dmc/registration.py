"""dm_control suite registration (``envpool/mujoco/dmc/registration.py``).

Task ids follow the reference's ``{Domain}{Task}-v1`` scheme — all 51
suite ids (``/root/reference/envpool/make_test.py:367-420``).
"""

from ...core.registry import register

_PATH = "envpool_tpu.envs.mujoco_dmc"

_TASKS = [
    ("AcrobotSwingup-v1", "DmcAcrobotEnv", "swingup"),
    ("AcrobotSwingupSparse-v1", "DmcAcrobotEnv", "swingup_sparse"),
    ("PendulumSwingup-v1", "PendulumEnv", "swingup"),
    ("CartpoleBalance-v1", "CartpoleEnv", "balance"),
    ("CartpoleBalanceSparse-v1", "CartpoleEnv", "balance_sparse"),
    ("CartpoleSwingup-v1", "CartpoleEnv", "swingup"),
    ("CartpoleSwingupSparse-v1", "CartpoleEnv", "swingup_sparse"),
    ("CheetahRun-v1", "CheetahEnv", "run"),
    ("WalkerStand-v1", "WalkerEnv", "stand"),
    ("WalkerWalk-v1", "WalkerEnv", "walk"),
    ("WalkerRun-v1", "WalkerEnv", "run"),
    ("HopperStand-v1", "HopperEnv", "stand"),
    ("HopperHop-v1", "HopperEnv", "hop"),
    ("ReacherEasy-v1", "DmcReacherEnv", "easy"),
    ("ReacherHard-v1", "DmcReacherEnv", "hard"),
    ("PointMassEasy-v1", "PointMassEnv", "easy"),
    ("PointMassHard-v1", "PointMassEnv", "hard"),
]

for task_id, env_cls, task_name in _TASKS:
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls=env_cls,
        task_name=task_name,
        max_episode_steps=1000,
    )

# Procedural-model domains (n-pole cartpole, n-link swimmer).
for task_id, n_poles, task_name in (
    ("CartpoleTwoPoles-v1", 2, "two_poles"),
    ("CartpoleThreePoles-v1", 3, "three_poles"),
):
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls="CartpoleEnv",
        task_name=task_name,
        n_poles=n_poles,
        max_episode_steps=1000,
    )

for task_id, n_links, task_name in (
    ("SwimmerSwimmer6-v1", 6, "swimmer6"),
    ("SwimmerSwimmer15-v1", 15, "swimmer15"),
):
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls="SwimmerEnv",
        task_name=task_name,
        n_links=n_links,
        max_episode_steps=1000,
    )

# Wave 2: ball_in_cup, fish, lqr, humanoid, humanoid_CMU
# (reference ids: /root/reference/envpool/make_test.py:367-420).
for task_id, env_cls, task_name in (
    ("BallInCupCatch-v1", "BallInCupEnv", "catch"),
    ("FishUpright-v1", "FishEnv", "upright"),
    ("FishSwim-v1", "FishEnv", "swim"),
    ("LqrLqr21-v1", "LqrEnv", "lqr_2_1"),
    ("LqrLqr62-v1", "LqrEnv", "lqr_6_2"),
    ("HumanoidStand-v1", "DmcHumanoidEnv", "stand"),
    ("HumanoidWalk-v1", "DmcHumanoidEnv", "walk"),
    ("HumanoidRun-v1", "DmcHumanoidEnv", "run"),
    ("HumanoidRunPureState-v1", "DmcHumanoidEnv", "run_pure_state"),
    ("HumanoidCMUStand-v1", "HumanoidCMUEnv", "stand"),
    ("HumanoidCMUWalk-v1", "HumanoidCMUEnv", "walk"),
    ("HumanoidCMURun-v1", "HumanoidCMUEnv", "run"),
):
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls=env_cls,
        task_name=task_name,
        max_episode_steps=1000,
    )

for task_id, task_name in (
    ("FingerSpin-v1", "spin"),
    ("FingerTurnEasy-v1", "turn_easy"),
    ("FingerTurnHard-v1", "turn_hard"),
):
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls="FingerEnv",
        task_name=task_name,
        max_episode_steps=1000,
    )

# Wave 3: quadruped (walk/run/escape/fetch).
for task_id, task_name in (
    ("QuadrupedWalk-v1", "walk"),
    ("QuadrupedRun-v1", "run"),
    ("QuadrupedEscape-v1", "escape"),
    ("QuadrupedFetch-v1", "fetch"),
):
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls="QuadrupedEnv",
        task_name=task_name,
        max_episode_steps=1000,
    )

for task_id, task_name in (
    ("ManipulatorBringBall-v1", "bring_ball"),
    ("ManipulatorBringPeg-v1", "bring_peg"),
    ("ManipulatorInsertBall-v1", "insert_ball"),
    ("ManipulatorInsertPeg-v1", "insert_peg"),
):
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls="ManipulatorEnv",
        task_name=task_name,
        max_episode_steps=1000,
    )

for task_id, task_name in (
    ("StackerStack2-v1", "stack_2"),
    ("StackerStack4-v1", "stack_4"),
):
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls="StackerEnv",
        task_name=task_name,
        max_episode_steps=1000,
    )

for task_id, task_name in (
    ("DogStand-v1", "stand"),
    ("DogWalk-v1", "walk"),
    ("DogTrot-v1", "trot"),
    ("DogRun-v1", "run"),
    ("DogFetch-v1", "fetch"),
):
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls="DogEnv",
        task_name=task_name,
        max_episode_steps=1000,
    )
