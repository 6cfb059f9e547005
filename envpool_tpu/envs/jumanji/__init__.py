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
from .snake import SnakeEnv

__all__ = [
    "CVRPEnv",
    "CleanerEnv",
    "GraphColoringEnv",
    "JumanjiGame2048Env",
    "KnapsackEnv",
    "MazeEnv",
    "MinesweeperEnv",
    "RubiksCubeEnv",
    "SlidingTilePuzzleEnv",
    "SnakeEnv",
    "SudokuEnv",
    "TSPEnv",
]
