"""Jumanji-class env family."""

from .._lazy import lazy_exports

_EXPORTS = {
    "BinPackEnv": "scheduling",
    "CVRPEnv": "combinatorial",
    "CleanerEnv": "cleaner",
    "ConnectorEnv": "multi_agent",
    "FlatPackEnv": "packing",
    "GraphColoringEnv": "combinatorial",
    "JobShopEnv": "scheduling",
    "JumanjiGame2048Env": "puzzles",
    "KnapsackEnv": "combinatorial",
    "LevelBasedForagingEnv": "multi_agent",
    "MMSTEnv": "search",
    "MazeEnv": "combinatorial",
    "MinesweeperEnv": "puzzles",
    "MultiCVRPEnv": "scheduling",
    "PacManEnv": "search",
    "RobotWarehouseEnv": "multi_agent",
    "RubiksCubeEnv": "puzzles",
    "SearchAndRescueEnv": "search",
    "SlidingTilePuzzleEnv": "puzzles",
    "SnakeEnv": "snake",
    "SokobanEnv": "search",
    "SudokuEnv": "puzzles",
    "TSPEnv": "combinatorial",
    "TetrisEnv": "packing",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
