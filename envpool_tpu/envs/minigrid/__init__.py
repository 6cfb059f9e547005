"""MiniGrid + BabyAI env families (TPU-native int-array gridworlds)."""

from .._lazy import lazy_exports

_EXPORTS = {
    "ActionObjDoorEnv": "roomgrid",
    "BabyAIGoToEnv": "babyai",
    "BabyAILocalEnv": "babyai",
    "DynamicObstaclesEnv": "tasks2",
    "FetchEnv": "tasks2",
    "FindObjEnv": "roomgrid",
    "GoToEnv": "tasks2",
    "GoToMazeEnv": "roomgrid",
    "GoToObjDoorEnv": "roomgrid",
    "GoToSeqEnv": "roomgrid",
    "KeyCorridorEnv": "roomgrid",
    "LockedRoomEnv": "roomgrid",
    "MemoryEnv": "tasks2",
    "MiniGridEnv": "minigrid_env",
    "MultiRoomEnv": "roomgrid",
    "ObstructedMazeEnv": "roomgrid",
    "OneRoomEnv": "roomgrid",
    "OpenDoorEnv": "roomgrid",
    "OpenMazeEnv": "roomgrid",
    "OpenTwoDoorsEnv": "roomgrid",
    "PickupAboveEnv": "roomgrid",
    "PickupEnv": "roomgrid",
    "PlaygroundEnv": "roomgrid",
    "PutNextEnv": "roomgrid",
    "RedBlueDoorsEnv": "tasks2",
    "RoomGridEnv": "roomgrid",
    "SynthEnv": "roomgrid",
    "UnlockEnv": "tasks2",
    "UnlockRGEnv": "roomgrid",
    "WFCEnv": "wfc",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
