"""Gym-MuJoCo registration (``envpool/mujoco/gym/registration.py:20-95``).

The reference registers v2–v5 variants per task; the versions differ in
reward/obs details.  This build implements v4 semantics and registers the
same ids for v3/v4 (v5-specific reward tweaks are future work and noted
per task).
"""

from ...core.registry import register

_PATH = "envpool_tpu.envs.mujoco_gym"

_TASKS = [
    ("Ant", "AntEnv", ("v3", "v4"), 1000),
    ("HalfCheetah", "HalfCheetahEnv", ("v3", "v4"), 1000),
    ("Hopper", "HopperEnv", ("v3", "v4"), 1000),
    ("InvertedDoublePendulum", "InvertedDoublePendulumEnv", ("v2", "v4"), 1000),
    ("InvertedPendulum", "InvertedPendulumEnv", ("v2", "v4"), 1000),
    ("Reacher", "ReacherEnv", ("v2", "v4"), 50),
    ("Swimmer", "SwimmerEnv", ("v3", "v4"), 1000),
    ("Walker2d", "Walker2dEnv", ("v3", "v4"), 1000),
]

for task, cls, versions, max_episode_steps in _TASKS:
    for version in versions:
        register(
            task_id=f"{task}-{version}",
            import_path=_PATH,
            env_cls=cls,
            max_episode_steps=max_episode_steps,
        )
