"""Jumanji-class registration (subset of ``envpool/jumanji/``).

Reference ids follow ``{Name}-v1``; the reference registers 24 envs
(``jumanji/jumanji_env.h:20-43``) — this round covers Snake, Knapsack,
TSP, Maze (2048 lives in the board family as ``Play2048-v1``).
"""

from ...core.registry import register

_PATH = "envpool_tpu.envs.jumanji"

register(
    task_id="Snake-v1",
    import_path=_PATH,
    env_cls="SnakeEnv",
    max_episode_steps=4000,
)
register(
    task_id="Knapsack-v1",
    import_path=_PATH,
    env_cls="KnapsackEnv",
    num_items=50,
    total_budget=12.5,
)
register(
    task_id="TSP-v1",
    import_path=_PATH,
    env_cls="TSPEnv",
    num_cities=20,
)
register(
    task_id="Maze-v1",
    import_path=_PATH,
    env_cls="MazeEnv",
    rows=10,
    cols=10,
    max_episode_steps=400,
)
