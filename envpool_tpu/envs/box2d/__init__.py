"""Box2D-class env family (planar rigid-body reimplementations)."""

from .bipedal_walker import BipedalWalkerEnv
from .car_racing import CarRacingEnv
from .lunar_lander import LunarLanderEnv

__all__ = ["BipedalWalkerEnv", "CarRacingEnv", "LunarLanderEnv"]
