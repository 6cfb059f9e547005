"""Box2D-class env family (planar rigid-body reimplementations)."""

from .lunar_lander import LunarLanderEnv

__all__ = ["LunarLanderEnv"]
