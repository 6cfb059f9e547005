"""Composable pure-function env wrappers."""

from .transforms import (
    FrameStack,
    RewardClip,
    TransformObservation,
    TransformReward,
    Wrapper,
)

__all__ = [
    "FrameStack",
    "RewardClip",
    "TransformObservation",
    "TransformReward",
    "Wrapper",
]
