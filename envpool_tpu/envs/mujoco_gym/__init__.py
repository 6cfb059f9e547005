"""Gym-MuJoCo env family over the TPU-native physics engine."""

from .._lazy import lazy_exports

_EXPORTS = {
    "AntEnv": "tasks",
    "HalfCheetahEnv": "tasks",
    "HopperEnv": "tasks",
    "HumanoidEnv": "humanoid",
    "HumanoidStandupEnv": "humanoid",
    "InvertedDoublePendulumEnv": "tasks",
    "InvertedPendulumEnv": "tasks",
    "PusherEnv": "tasks",
    "ReacherEnv": "tasks",
    "SwimmerEnv": "tasks",
    "Walker2dEnv": "tasks",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
