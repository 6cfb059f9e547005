"""Jumanji-class env family."""

from .cleaner import CleanerEnv
from .combinatorial import (
    CVRPEnv,
    GraphColoringEnv,
    KnapsackEnv,
    MazeEnv,
    TSPEnv,
)
from .puzzles import (
    JumanjiGame2048Env,
    MinesweeperEnv,
    RubiksCubeEnv,
    SlidingTilePuzzleEnv,
    SudokuEnv,
)
from .multi_agent import (
    ConnectorEnv,
    LevelBasedForagingEnv,
    RobotWarehouseEnv,
)
from .packing import FlatPackEnv, TetrisEnv
from .scheduling import BinPackEnv, JobShopEnv, MultiCVRPEnv
from .search import (
    MMSTEnv,
    PacManEnv,
    SearchAndRescueEnv,
    SokobanEnv,
)
from .snake import SnakeEnv

__all__ = [
    "BinPackEnv",
    "CVRPEnv",
    "CleanerEnv",
    "ConnectorEnv",
    "JobShopEnv",
    "MMSTEnv",
    "MultiCVRPEnv",
    "PacManEnv",
    "SearchAndRescueEnv",
    "SokobanEnv",
    "FlatPackEnv",
    "GraphColoringEnv",
    "JumanjiGame2048Env",
    "KnapsackEnv",
    "LevelBasedForagingEnv",
    "MazeEnv",
    "MinesweeperEnv",
    "RobotWarehouseEnv",
    "RubiksCubeEnv",
    "SlidingTilePuzzleEnv",
    "SnakeEnv",
    "SudokuEnv",
    "TSPEnv",
    "TetrisEnv",
]
