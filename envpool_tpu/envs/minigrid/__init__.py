"""MiniGrid env family (TPU-native int-array gridworlds)."""

from .minigrid_env import MiniGridEnv

__all__ = ["MiniGridEnv"]
