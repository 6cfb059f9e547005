"""Gymnasium-Robotics env family (goal-conditioned, TPU-native).

Reference surface: ``envpool/mujoco/robotics/`` — 157 task ids across
Fetch, HandReach/HandManipulate, AdroitHand, PointMaze and FrankaKitchen
(``robotics/registration.py:305-330``).  Observations are goal-env dicts
``{observation, achieved_goal, desired_goal}`` with ``info:success`` /
``info:distance``, mirroring ``fetch.h:61-75`` / ``point_maze.h:61-82``."""

from .._lazy import lazy_exports

_EXPORTS = {
    "AdroitEnv": "adroit",
    "FetchEnv": "fetch",
    "FrankaKitchenEnv": "kitchen",
    "HandManipulateEnv": "hand",
    "HandReachEnv": "hand",
    "PointMazeEnv": "point_maze",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
