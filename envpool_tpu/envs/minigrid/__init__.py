"""MiniGrid + BabyAI env families (TPU-native int-array gridworlds)."""

from .babyai import BabyAIGoToEnv, BabyAILocalEnv
from .roomgrid import (
    ActionObjDoorEnv,
    FindObjEnv,
    GoToMazeEnv,
    GoToObjDoorEnv,
    GoToSeqEnv,
    KeyCorridorEnv,
    LockedRoomEnv,
    MultiRoomEnv,
    ObstructedMazeEnv,
    OneRoomEnv,
    OpenDoorEnv,
    OpenMazeEnv,
    OpenTwoDoorsEnv,
    PickupAboveEnv,
    PickupEnv,
    PlaygroundEnv,
    PutNextEnv,
    RoomGridEnv,
    SynthEnv,
    UnlockRGEnv,
)
from .minigrid_env import MiniGridEnv
from .wfc import WFCEnv
from .tasks2 import (
    DynamicObstaclesEnv,
    FetchEnv,
    GoToEnv,
    MemoryEnv,
    RedBlueDoorsEnv,
    UnlockEnv,
)

__all__ = [
    "BabyAIGoToEnv",
    "BabyAILocalEnv",
    "DynamicObstaclesEnv",
    "FetchEnv",
    "GoToEnv",
    "MemoryEnv",
    "MiniGridEnv",
    "RedBlueDoorsEnv",
    "UnlockEnv",
]
