"""MiniGrid + BabyAI env families (TPU-native int-array gridworlds)."""

from .babyai import BabyAIGoToEnv
from .minigrid_env import MiniGridEnv

__all__ = ["BabyAIGoToEnv", "MiniGridEnv"]
