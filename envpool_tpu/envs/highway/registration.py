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

# Wave 2 scenarios (reference kwargs mirrored:
# /root/reference/envpool/highway/registration.py).
register(
    task_id="Parking-v0",
    import_path=_PATH,
    env_cls="ParkingEnv",
    aliases=["parking-v0"],
    max_episode_steps=500,
    duration=100,
    policy_frequency=5,
)
register(
    task_id="ParkingActionRepeat-v0",
    import_path=_PATH,
    env_cls="ParkingEnv",
    aliases=["parking-ActionRepeat-v0"],
    max_episode_steps=20,
    duration=20,
    policy_frequency=1,
)
register(
    task_id="ParkingParked-v0",
    import_path=_PATH,
    env_cls="ParkingEnv",
    aliases=["parking-parked-v0"],
    max_episode_steps=500,
    duration=100,
    policy_frequency=5,
    add_parked_vehicles=True,
)
register(
    task_id="LaneKeeping-v0",
    import_path=_PATH,
    env_cls="LaneKeepingEnv",
    aliases=["lane-keeping-v0"],
    max_episode_steps=200,
    duration=20,
    simulation_frequency=10,
    policy_frequency=10,
)
