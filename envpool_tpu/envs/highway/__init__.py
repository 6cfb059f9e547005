"""Highway family — TPU-native reimplementation of envpool/highway."""

from .._lazy import lazy_exports

_EXPORTS = {
    "ExitEnv": "net_tasks",
    "HighwayEnv": "straight",
    "IntersectionContinuousEnv": "net_tasks",
    "IntersectionEnv": "net_tasks",
    "IntersectionMultiAgentEnv": "net_tasks",
    "LaneKeepingEnv": "scenarios",
    "MergeEnv": "net_tasks",
    "ParkingEnv": "scenarios",
    "RacetrackEnv": "net_tasks",
    "RacetrackLargeEnv": "net_tasks",
    "RacetrackOvalEnv": "net_tasks",
    "RoundaboutEnv": "net_tasks",
    "TwoWayEnv": "net_tasks",
    "UTurnEnv": "net_tasks",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
