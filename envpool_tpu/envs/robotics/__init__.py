"""Gymnasium-Robotics env family (goal-conditioned, TPU-native).

Reference surface: ``envpool/mujoco/robotics/`` — 157 task ids across
Fetch, HandReach/HandManipulate, AdroitHand, PointMaze and FrankaKitchen
(``robotics/registration.py:305-330``).  Observations are goal-env dicts
``{observation, achieved_goal, desired_goal}`` with ``info:success`` /
``info:distance``, mirroring ``fetch.h:61-75`` / ``point_maze.h:61-82``.
"""

from .point_maze import PointMazeEnv
from .fetch import FetchEnv
from .hand import HandManipulateEnv, HandReachEnv
from .adroit import AdroitEnv
from .kitchen import FrankaKitchenEnv

__all__ = [
    "AdroitEnv",
    "FetchEnv",
    "FrankaKitchenEnv",
    "HandManipulateEnv",
    "HandReachEnv",
    "PointMazeEnv",
]
