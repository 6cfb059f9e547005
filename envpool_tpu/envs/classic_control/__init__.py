"""Classic-control env family (TPU-native).

Reference behavior: ``envpool/classic_control/*.h``."""

from .._lazy import lazy_exports

_EXPORTS = {
    "AcrobotEnv": "acrobot",
    "CartPoleEnv": "cartpole",
    "MountainCarContinuousEnv": "mountain_car",
    "MountainCarEnv": "mountain_car",
    "PendulumEnv": "pendulum",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
