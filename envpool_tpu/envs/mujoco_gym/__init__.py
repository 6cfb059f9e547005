"""Gym-MuJoCo env family over the TPU-native physics engine."""

from .humanoid import HumanoidEnv, HumanoidStandupEnv
from .tasks import (
    AntEnv,
    HalfCheetahEnv,
    HopperEnv,
    InvertedDoublePendulumEnv,
    InvertedPendulumEnv,
    PusherEnv,
    ReacherEnv,
    SwimmerEnv,
    Walker2dEnv,
)

__all__ = [
    "AntEnv",
    "HumanoidEnv",
    "HumanoidStandupEnv",
    "HalfCheetahEnv",
    "HopperEnv",
    "InvertedDoublePendulumEnv",
    "InvertedPendulumEnv",
    "PusherEnv",
    "ReacherEnv",
    "SwimmerEnv",
    "Walker2dEnv",
]
