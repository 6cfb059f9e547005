"""Dummy env family (dev fixture)."""

from .._lazy import lazy_exports

_EXPORTS = {
    "DummyEnv": "dummy_env",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
