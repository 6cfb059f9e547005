"""Highway family — TPU-native reimplementation of envpool/highway."""

from .net_tasks import (
    IntersectionMultiAgentEnv,
    ExitEnv,
    IntersectionContinuousEnv,
    IntersectionEnv,
    MergeEnv,
    RacetrackEnv,
    RacetrackLargeEnv,
    RacetrackOvalEnv,
    RoundaboutEnv,
    TwoWayEnv,
    UTurnEnv,
)
from .scenarios import LaneKeepingEnv, ParkingEnv
from .straight import HighwayEnv

__all__ = [
    "ExitEnv",
    "HighwayEnv",
    "IntersectionContinuousEnv",
    "IntersectionMultiAgentEnv",
    "IntersectionEnv",
    "LaneKeepingEnv",
    "MergeEnv",
    "ParkingEnv",
    "RacetrackEnv",
    "RacetrackLargeEnv",
    "RacetrackOvalEnv",
    "RoundaboutEnv",
    "TwoWayEnv",
    "UTurnEnv",
]
