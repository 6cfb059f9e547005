"""Box2D-class env family (planar rigid-body reimplementations)."""

from .._lazy import lazy_exports

_EXPORTS = {
    "BipedalWalkerEnv": "bipedal_walker",
    "CarRacingEnv": "car_racing",
    "LunarLanderEnv": "lunar_lander",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
