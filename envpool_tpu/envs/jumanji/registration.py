"""Jumanji-class registration (subset of ``envpool/jumanji/``).

Reference ids and per-task step limits follow
``envpool/jumanji/registration.py:28-55`` (jumanji v1.1.1), including the
``Jumanji/<id>`` aliases.  Envs with an *internal* time-limit termination
(SlidingTilePuzzle, RubiksCube, Cleaner) register ``max_episode_steps =
limit + 1`` so the env's own terminal fires first, mirroring the
reference's ``CurrentMaxEpisodeSteps() = TimeLimit + 1`` overrides.
"""

from ...core.registry import register

_PATH = "envpool_tpu.envs.jumanji"


def _reg(task_id, env_cls, **kwargs):
    register(
        task_id=task_id,
        import_path=_PATH,
        env_cls=env_cls,
        aliases=(f"Jumanji/{task_id}",),
        **kwargs,
    )


_reg("Snake-v1", "SnakeEnv", max_episode_steps=4000)
_reg("Knapsack-v1", "KnapsackEnv", num_items=50, total_budget=12.5)
_reg("TSP-v1", "TSPEnv", num_cities=20)
_reg("Maze-v0", "MazeEnv", rows=10, cols=10, max_episode_steps=100)
# Back-compat id from earlier rounds of this build.
register(
    task_id="Maze-v1",
    import_path=_PATH,
    env_cls="MazeEnv",
    rows=10,
    cols=10,
    max_episode_steps=400,
)
_reg("Minesweeper-v0", "MinesweeperEnv", max_episode_steps=90)
_reg("SlidingTilePuzzle-v0", "SlidingTilePuzzleEnv", max_episode_steps=501)
_reg(
    "RubiksCube-v0",
    "RubiksCubeEnv",
    num_scrambles=100,
    time_limit=200,
    max_episode_steps=201,
)
_reg(
    "RubiksCube-partly-scrambled-v0",
    "RubiksCubeEnv",
    num_scrambles=20,
    time_limit=20,
    max_episode_steps=21,
)
_reg("Cleaner-v0", "CleanerEnv", max_episode_steps=101)
_reg("CVRP-v1", "CVRPEnv", max_episode_steps=41)
_reg("GraphColoring-v1", "GraphColoringEnv", max_episode_steps=21)
_reg("Sudoku-v0", "SudokuEnv", sudoku_database="mixed", max_episode_steps=82)
_reg(
    "Sudoku-very-easy-v0",
    "SudokuEnv",
    sudoku_database="very-easy",
    max_episode_steps=82,
)
_reg("Game2048-v1", "JumanjiGame2048Env", max_episode_steps=1000)
_reg("Tetris-v0", "TetrisEnv", max_episode_steps=401)
_reg("Connector-v2", "ConnectorEnv", max_episode_steps=51)
_reg("FlatPack-v0", "FlatPackEnv", max_episode_steps=26)
_reg(
    "LevelBasedForaging-v0",
    "LevelBasedForagingEnv",
    max_episode_steps=100,
)
_reg("RobotWarehouse-v0", "RobotWarehouseEnv", max_episode_steps=501)
_reg("JobShop-v0", "JobShopEnv", max_episode_steps=1001)
_reg("MultiCVRP-v0", "MultiCVRPEnv", max_episode_steps=41)
_reg("BinPack-v2", "BinPackEnv", max_episode_steps=21)
_reg("Sokoban-v0", "SokobanEnv", max_episode_steps=120)
_reg("PacMan-v1", "PacManEnv", max_episode_steps=1001)
_reg("MMST-v0", "MMSTEnv", max_episode_steps=71)
_reg("SearchAndRescue-v0", "SearchAndRescueEnv", max_episode_steps=401)
