"""Toy-text env family (TPU-native).

Reference behavior: ``envpool/toy_text/*.h``."""

from .._lazy import lazy_exports

_EXPORTS = {
    "BlackjackEnv": "blackjack",
    "CatchEnv": "catch",
    "CliffWalkingEnv": "cliffwalking",
    "FrozenLakeEnv": "frozen_lake",
    "NChainEnv": "nchain",
    "TaxiEnv": "taxi",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
