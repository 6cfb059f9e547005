"""Toy-text env family (TPU-native).

Reference behavior: ``envpool/toy_text/*.h``.
"""

from .blackjack import BlackjackEnv
from .catch import CatchEnv
from .cliffwalking import CliffWalkingEnv
from .frozen_lake import FrozenLakeEnv
from .nchain import NChainEnv
from .taxi import TaxiEnv

__all__ = [
    "BlackjackEnv",
    "CatchEnv",
    "CliffWalkingEnv",
    "FrozenLakeEnv",
    "NChainEnv",
    "TaxiEnv",
]
