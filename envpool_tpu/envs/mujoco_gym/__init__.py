"""Gym-MuJoCo env family over the TPU-native physics engine."""

from .tasks import (
    AntEnv,
    HalfCheetahEnv,
    HopperEnv,
    InvertedDoublePendulumEnv,
    InvertedPendulumEnv,
    ReacherEnv,
    SwimmerEnv,
    Walker2dEnv,
)

__all__ = [
    "AntEnv",
    "HalfCheetahEnv",
    "HopperEnv",
    "InvertedDoublePendulumEnv",
    "InvertedPendulumEnv",
    "ReacherEnv",
    "SwimmerEnv",
    "Walker2dEnv",
]
