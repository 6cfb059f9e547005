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
