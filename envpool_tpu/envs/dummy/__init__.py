"""Dummy env family (dev fixture)."""

from .dummy_env import DummyEnv

__all__ = ["DummyEnv"]
