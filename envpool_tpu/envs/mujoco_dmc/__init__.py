"""dm_control-suite env family over the TPU physics engine."""

from .tasks2 import (
    FingerEnv,
    BallInCupEnv,
    DmcHumanoidEnv,
    FishEnv,
    HumanoidCMUEnv,
    LqrEnv,
)
from .tasks3 import DogEnv, ManipulatorEnv, QuadrupedEnv, StackerEnv
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
    "FingerEnv",
    "DogEnv",
    "ManipulatorEnv",
    "QuadrupedEnv",
    "StackerEnv",
    "BallInCupEnv",
    "DmcHumanoidEnv",
    "FishEnv",
    "HumanoidCMUEnv",
    "LqrEnv",
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
