"""dm_control-suite env family over the TPU physics engine."""

from .._lazy import lazy_exports

_EXPORTS = {
    "BallInCupEnv": "tasks2",
    "CartpoleEnv": "tasks",
    "CheetahEnv": "tasks",
    "DmcAcrobotEnv": "tasks",
    "DmcHumanoidEnv": "tasks2",
    "DmcReacherEnv": "tasks",
    "DogEnv": "tasks3",
    "FingerEnv": "tasks2",
    "FishEnv": "tasks2",
    "HopperEnv": "tasks",
    "HumanoidCMUEnv": "tasks2",
    "LqrEnv": "tasks2",
    "ManipulatorEnv": "tasks3",
    "PendulumEnv": "tasks",
    "PointMassEnv": "tasks",
    "QuadrupedEnv": "tasks3",
    "StackerEnv": "tasks3",
    "SwimmerEnv": "tasks",
    "WalkerEnv": "tasks",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
