"""MiniGrid + BabyAI env families (TPU-native int-array gridworlds)."""

from .babyai import BabyAIGoToEnv, BabyAILocalEnv
from .minigrid_env import MiniGridEnv
from .tasks2 import (
    DynamicObstaclesEnv,
    FetchEnv,
    GoToEnv,
    MemoryEnv,
    RedBlueDoorsEnv,
    UnlockEnv,
)

__all__ = [
    "BabyAIGoToEnv",
    "BabyAILocalEnv",
    "DynamicObstaclesEnv",
    "FetchEnv",
    "GoToEnv",
    "MemoryEnv",
    "MiniGridEnv",
    "RedBlueDoorsEnv",
    "UnlockEnv",
]
