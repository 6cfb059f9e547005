"""Classic-control env family (TPU-native).

Reference behavior: ``envpool/classic_control/*.h``.
"""

from .acrobot import AcrobotEnv
from .cartpole import CartPoleEnv
from .mountain_car import MountainCarContinuousEnv, MountainCarEnv
from .pendulum import PendulumEnv

__all__ = [
    "AcrobotEnv",
    "CartPoleEnv",
    "MountainCarContinuousEnv",
    "MountainCarEnv",
    "PendulumEnv",
]
