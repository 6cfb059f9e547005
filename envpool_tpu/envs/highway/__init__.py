"""Highway family — TPU-native reimplementation of envpool/highway."""

from .straight import HighwayEnv

__all__ = ["HighwayEnv"]
