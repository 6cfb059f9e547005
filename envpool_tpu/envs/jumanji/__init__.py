"""Jumanji-class env family."""

from .combinatorial import KnapsackEnv, MazeEnv, TSPEnv
from .snake import SnakeEnv

__all__ = ["KnapsackEnv", "MazeEnv", "SnakeEnv", "TSPEnv"]
