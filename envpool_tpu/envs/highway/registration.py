"""Highway registration (``envpool/highway/registration.py``)."""

from ...core.registry import register

_PATH = "envpool_tpu.envs.highway"

register(
    task_id="Highway-v0",
    import_path=_PATH,
    env_cls="HighwayEnv",
    aliases=["highway-v0"],
    max_episode_steps=40,
    duration=40,
)

register(
    task_id="HighwayFast-v0",
    import_path=_PATH,
    env_cls="HighwayEnv",
    aliases=["highway-fast-v0"],
    max_episode_steps=30,
    duration=30,
    simulation_frequency=5,
    lanes_count=3,
    vehicles_count=20,
    ego_spacing=1.5,
    other_vehicles_check_collisions=False,
)
