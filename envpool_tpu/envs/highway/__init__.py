"""Highway family — TPU-native reimplementation of envpool/highway."""

from .scenarios import LaneKeepingEnv, ParkingEnv
from .straight import HighwayEnv

__all__ = ["HighwayEnv", "LaneKeepingEnv", "ParkingEnv"]
