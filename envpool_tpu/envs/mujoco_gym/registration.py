"""Gym-MuJoCo registration (``envpool/mujoco/gym/registration.py:20-95``).

The reference registers v2-v5 variants per task.  This build implements v4
semantics plus the v5 reward tweaks the reference toggles by config
(``reward_if_not_terminated``, ``reward_after_step``,
``legacy_healthy_reward``); Humanoid/HumanoidStandup/Pusher are queued
(PLAN.md).
"""

from typing import Any

from ...core.registry import register

_PATH = "envpool_tpu.envs.mujoco_gym"

_TASKS = [
    ("Ant", "AntEnv", ("v3", "v4", "v5"), 1000),
    ("HalfCheetah", "HalfCheetahEnv", ("v3", "v4", "v5"), 1000),
    ("Hopper", "HopperEnv", ("v3", "v4", "v5"), 1000),
    ("Humanoid", "HumanoidEnv", ("v3", "v4", "v5"), 1000),
    ("HumanoidStandup", "HumanoidStandupEnv", ("v2", "v4", "v5"), 1000),
    ("InvertedDoublePendulum", "InvertedDoublePendulumEnv",
     ("v2", "v4", "v5"), 1000),
    ("InvertedPendulum", "InvertedPendulumEnv", ("v2", "v4", "v5"), 1000),
    ("Pusher", "PusherEnv", ("v2", "v4", "v5"), 100),
    ("Reacher", "ReacherEnv", ("v2", "v4", "v5"), 50),
    ("Swimmer", "SwimmerEnv", ("v3", "v4", "v5"), 1000),
    ("Walker2d", "Walker2dEnv", ("v3", "v4", "v5"), 1000),
]

for task, cls, versions, max_episode_steps in _TASKS:
    for version in versions:
        extra: dict[str, Any] = {}
        if version == "v5":
            if task in ("InvertedPendulum", "InvertedDoublePendulum"):
                extra["reward_if_not_terminated"] = True
            if task in ("Reacher", "Pusher"):
                extra["reward_after_step"] = True
            if task == "Reacher":
                extra["v5_obs"] = True
            if task in ("Hopper", "Walker2d", "Ant"):
                extra["legacy_healthy_reward"] = False
            if task == "Pusher":
                extra["xml_file"] = "pusher_v5.xml"
            if task == "Humanoid":
                extra["legacy_healthy_reward"] = False
                extra["contact_cost_weight"] = 5e-7
                extra["v5_obs"] = True
            if task == "HumanoidStandup":
                extra["v5_obs"] = True
        register(
            task_id=f"{task}-{version}",
            import_path=_PATH,
            env_cls=cls,
            max_episode_steps=max_episode_steps,
            **extra,
        )
