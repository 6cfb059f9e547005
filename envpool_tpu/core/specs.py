"""Array and tree specs for the TPU-native env engine.

Mirrors the observable surface of the reference's spec system
(``envpool/core/spec.h:42-140`` and ``envpool/python/protocol.py:109-138``):
an :class:`ArraySpec` carries dtype, per-env shape, bounds (scalar or
element-wise) and a discreteness flag.  Unlike the reference there is no
``Container`` (ragged) spec — XLA requires static shapes, and the reference
itself disables XLA for dynamic shapes (``envpool/core/py_envpool.h:222-229``);
variable-size fields are expressed as fixed-size arrays plus masks.

A leading ``-1`` dimension marks a per-player axis (multi-player envs); it is
materialised as ``max_num_players`` at batch time, again following the
reference (``envpool/core/spec.h:62-75``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

__all__ = ["ArraySpec", "batch_shape", "zeros_like_spec"]


@dataclasses.dataclass(frozen=True)
class ArraySpec:
    """Static description of one array field of a state or action tree."""

    dtype: Any
    shape: tuple[int, ...] = ()
    minimum: Any = None
    maximum: Any = None
    is_discrete: bool = False

    def __post_init__(self) -> None:
        object.__setattr__(self, "shape", tuple(int(s) for s in self.shape))
        object.__setattr__(self, "dtype", np.dtype(self.dtype))
        lo, hi = self.minimum, self.maximum
        if lo is None:
            lo = _default_min(self.dtype)
        if hi is None:
            hi = _default_max(self.dtype)
        object.__setattr__(self, "minimum", _canon_bound(lo))
        object.__setattr__(self, "maximum", _canon_bound(hi))

    @property
    def per_player(self) -> bool:
        """True if the leading dim is the per-player axis (-1 sentinel)."""
        return len(self.shape) > 0 and self.shape[0] == -1

    def static_shape(self, max_num_players: int = 1) -> tuple[int, ...]:
        """Concrete per-env shape with the player axis materialised.

        Single-player envs collapse the ``-1`` axis entirely, matching how
        the reference squeezes the player dimension for
        ``max_num_players == 1`` pools (``envpool/core/xla.h:85-113``).
        """
        if not self.per_player:
            return self.shape
        if max_num_players == 1:
            return self.shape[1:]
        return (max_num_players, *self.shape[1:])

    def __repr__(self) -> str:
        return (
            f"ArraySpec(shape={list(self.shape)}, dtype={self.dtype}, "
            f"minimum={self.minimum}, maximum={self.maximum})"
        )


def _canon_bound(value: Any) -> Any:
    arr = np.asarray(value)
    if arr.ndim == 0:
        return arr.item()
    return arr


def _default_min(dtype: np.dtype) -> Any:
    if np.issubdtype(dtype, np.floating):
        return float("-inf")
    if dtype == np.bool_:
        return False
    return int(np.iinfo(dtype).min)


def _default_max(dtype: np.dtype) -> Any:
    if np.issubdtype(dtype, np.floating):
        return float("inf")
    if dtype == np.bool_:
        return True
    return int(np.iinfo(dtype).max)


def batch_shape(
    spec: ArraySpec, num_envs: int, max_num_players: int = 1
) -> tuple[int, ...]:
    """Batched array shape for ``num_envs`` environments."""
    return (num_envs, *spec.static_shape(max_num_players))


def zeros_like_spec(
    spec: ArraySpec, num_envs: int | None = None, max_num_players: int = 1
):
    """Numpy zeros with the (optionally batched) shape of ``spec``."""
    shape = spec.static_shape(max_num_players)
    if num_envs is not None:
        shape = (num_envs, *shape)
    return np.zeros(shape, dtype=spec.dtype)
