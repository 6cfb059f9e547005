"""dm_control-suite env family over the TPU physics engine."""

from .tasks import (
    CartpoleEnv,
    DmcAcrobotEnv,
    CheetahEnv,
    DmcReacherEnv,
    HopperEnv,
    PendulumEnv,
    PointMassEnv,
    SwimmerEnv,
    WalkerEnv,
)

__all__ = [
    "CartpoleEnv",
    "DmcAcrobotEnv",
    "CheetahEnv",
    "DmcReacherEnv",
    "HopperEnv",
    "PendulumEnv",
    "PointMassEnv",
    "SwimmerEnv",
    "WalkerEnv",
]
