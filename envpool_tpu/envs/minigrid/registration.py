"""MiniGrid registration (subset of ``envpool/minigrid/registration.py``).

MiniGrid max_steps defaults: Empty 4*size^2, DoorKey 10*size^2, FourRooms
100? (MiniGrid FourRooms: max_steps=100), LavaGap 4*size^2, DistShift
4*size^2 (size=7... width 9 height 7 → 4*9^2), Crossing 4*size^2.
"""

from ...core.registry import register

_PATH = "envpool_tpu.envs.minigrid"


def _reg(task_id: str, max_episode_steps: int, **kwargs) -> None:
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls="MiniGridEnv",
        max_episode_steps=max_episode_steps,
        **kwargs,
    )


for size in (5, 6, 8, 16):
    _reg(
        f"MiniGrid-Empty-{size}x{size}-v0",
        4 * size * size,
        env_name="empty",
        size=size,
    )
for size in (5, 6):
    _reg(
        f"MiniGrid-Empty-Random-{size}x{size}-v0",
        4 * size * size,
        env_name="empty",
        size=size,
        random_start=True,
    )
for size in (5, 6, 8, 16):
    _reg(
        f"MiniGrid-DoorKey-{size}x{size}-v0",
        10 * size * size,
        env_name="doorkey",
        size=size,
    )
_reg("MiniGrid-FourRooms-v0", 100, env_name="fourrooms", size=19)
for size in (5, 6, 7):
    _reg(
        f"MiniGrid-LavaGapS{size}-v0",
        4 * size * size,
        env_name="lavagap",
        size=size,
    )
_reg(
    "MiniGrid-DistShift1-v0",
    4 * 81,
    env_name="distshift",
    width=9,
    height=7,
    strip2_row=2,
)
_reg(
    "MiniGrid-DistShift2-v0",
    4 * 81,
    env_name="distshift",
    width=9,
    height=7,
    strip2_row=5,
)
for n in (1, 2, 3):
    _reg(
        f"MiniGrid-SimpleCrossingS9N{n}-v0",
        4 * 81,
        env_name="crossing",
        size=9,
        num_crossings=n,
        obstacle_type="wall",
    )
    _reg(
        f"MiniGrid-LavaCrossingS9N{n}-v0",
        4 * 81,
        env_name="crossing",
        size=9,
        num_crossings=n,
        obstacle_type="lava",
    )

register(
    task_id="BabyAI-GoToObj-v0",
    import_path=_PATH,
    env_cls="BabyAIGoToEnv",
    env_name="goto_obj",
    size=8,
    max_episode_steps=64,
)
register(
    task_id="BabyAI-GoToDoor-v0",
    import_path=_PATH,
    env_cls="BabyAIGoToEnv",
    env_name="goto_door",
    size=8,
    max_episode_steps=256,
)

# --- wave 2 (tasks2.py) ----------------------------------------------------

for n in (5,):
    _reg(
        "MiniGrid-SimpleCrossingS11N5-v0",
        4 * 121,
        env_name="crossing",
        size=11,
        num_crossings=n,
        obstacle_type="wall",
    )
    _reg(
        "MiniGrid-LavaCrossingS11N5-v0",
        4 * 121,
        env_name="crossing",
        size=11,
        num_crossings=n,
        obstacle_type="lava",
    )

for task_id, size, n_obstacles, random_start in (
    ("MiniGrid-Dynamic-Obstacles-5x5-v0", 5, 2, False),
    ("MiniGrid-Dynamic-Obstacles-Random-5x5-v0", 5, 2, True),
    ("MiniGrid-Dynamic-Obstacles-6x6-v0", 6, 3, False),
    ("MiniGrid-Dynamic-Obstacles-Random-6x6-v0", 6, 3, True),
    ("MiniGrid-Dynamic-Obstacles-8x8-v0", 8, 4, False),
    ("MiniGrid-Dynamic-Obstacles-16x16-v0", 16, 8, False),
):
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls="DynamicObstaclesEnv",
        max_episode_steps=4 * size * size,
        size=size,
        n_obstacles=n_obstacles,
        random_start=random_start,
    )

for task_id, size, num_objs in (
    ("MiniGrid-Fetch-5x5-N2-v0", 5, 2),
    ("MiniGrid-Fetch-6x6-N2-v0", 6, 2),
    ("MiniGrid-Fetch-8x8-N3-v0", 8, 3),
):
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls="FetchEnv",
        max_episode_steps=5 * size * size,
        size=size,
        num_objs=num_objs,
    )

for size in (5, 6, 8):
    register(
        task_id=f"MiniGrid-GoToDoor-{size}x{size}-v0",
        import_path=_PATH,
        env_cls="GoToEnv",
        env_name="goto_door",
        max_episode_steps=4 * size * size,
        size=size,
    )

for task_id, size, num_objs in (
    ("MiniGrid-GoToObject-6x6-N2-v0", 6, 2),
    ("MiniGrid-GoToObject-8x8-N2-v0", 8, 2),
):
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls="GoToEnv",
        env_name="goto_object",
        max_episode_steps=5 * size * size,
        size=size,
        num_objs=num_objs,
    )

for size in (6, 8):
    register(
        task_id=f"MiniGrid-RedBlueDoors-{size}x{size}-v0",
        import_path=_PATH,
        env_cls="RedBlueDoorsEnv",
        max_episode_steps=20 * size * size,
        size=size,
    )

register(
    task_id="MiniGrid-Unlock-v0",
    import_path=_PATH,
    env_cls="UnlockEnv",
    env_name="unlock",
    max_episode_steps=8 * 36,
)
register(
    task_id="MiniGrid-UnlockPickup-v0",
    import_path=_PATH,
    env_cls="UnlockEnv",
    env_name="unlock_pickup",
    max_episode_steps=8 * 36,
)

for task_id, size, random_length in (
    ("MiniGrid-MemoryS17Random-v0", 17, True),
    ("MiniGrid-MemoryS13Random-v0", 13, True),
    ("MiniGrid-MemoryS13-v0", 13, False),
    ("MiniGrid-MemoryS11-v0", 11, False),
    ("MiniGrid-MemoryS9-v0", 9, False),
    ("MiniGrid-MemoryS7-v0", 7, False),
):
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls="MemoryEnv",
        max_episode_steps=5 * size * size,
        size=size,
        random_length=random_length,
    )

# --- BabyAI wave 2 (desc-matched GoTo levels) -------------------------------

def _reg_babyai(task_id, size=8, num_dists=7, **kwargs):
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls="BabyAILocalEnv",
        max_episode_steps=8 * size * size,
        size=size,
        num_dists=num_dists,
        **kwargs,
    )


_reg_babyai("BabyAI-GoToRedBall-v0", env_name="goto_red_ball")
_reg_babyai("BabyAI-GoToRedBallGrey-v0", env_name="goto_red_ball_grey")
_reg_babyai(
    "BabyAI-GoToRedBallNoDists-v0", env_name="goto_red_ball", num_dists=0
)
_reg_babyai("BabyAI-GoToRedBlueBall-v0", env_name="goto_red_blue_ball")

for task_id, num_dists, size in (
    ("BabyAI-GoToLocal-v0", 8, 8),
    ("BabyAI-GoToLocalS5N2-v0", 2, 5),
    ("BabyAI-GoToLocalS6N2-v0", 2, 6),
    ("BabyAI-GoToLocalS6N3-v0", 3, 6),
    ("BabyAI-GoToLocalS6N4-v0", 4, 6),
    ("BabyAI-GoToLocalS7N4-v0", 4, 7),
    ("BabyAI-GoToLocalS7N5-v0", 5, 7),
    ("BabyAI-GoToLocalS8N2-v0", 2, 8),
    ("BabyAI-GoToLocalS8N3-v0", 3, 8),
    ("BabyAI-GoToLocalS8N4-v0", 4, 8),
    ("BabyAI-GoToLocalS8N5-v0", 5, 8),
    ("BabyAI-GoToLocalS8N6-v0", 6, 8),
    ("BabyAI-GoToLocalS8N7-v0", 7, 8),
):
    _reg_babyai(task_id, size=size, num_dists=num_dists, env_name="goto_local")

for task_id, size in (
    ("BabyAI-GoToObjS4-v0", 4),
    ("BabyAI-GoToObjS6-v1", 6),
):
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls="BabyAIGoToEnv",
        env_name="goto_obj",
        size=size,
        max_episode_steps=8 * size * size,
    )
