"""Jumanji-class env family."""

from .cleaner import CleanerEnv
from .combinatorial import KnapsackEnv, MazeEnv, TSPEnv
from .puzzles import MinesweeperEnv, RubiksCubeEnv, SlidingTilePuzzleEnv
from .snake import SnakeEnv

__all__ = [
    "CleanerEnv",
    "KnapsackEnv",
    "MazeEnv",
    "MinesweeperEnv",
    "RubiksCubeEnv",
    "SlidingTilePuzzleEnv",
    "SnakeEnv",
    "TSPEnv",
]
