"""ViZDoom env family (10 scenarios + custom slot).

Reference surface: ``envpool/vizdoom/vizdoom_env.h`` — stacked CHW RGB
frames ``[stack_num * 3, 84, 84] uint8``, combined button action space,
game-variable info keys (HEALTH, AMMO*, FRAGCOUNT, KILLCOUNT, ...),
reward shaping from variable deltas (``:60-110``).

TPU-native design: the Doom engine is a native sim unavailable in-image;
scenes here render through an on-device DDA raycaster (Wolfenstein-style
wall columns + entity billboards) over per-scenario grid maps, with each
scenario's entity logic and reward schedule (Basic, DeadlyCorridor,
Deathmatch, DefendTheCenter, DefendTheLine, HealthGathering(+Supreme),
MyWayHome, PredictPosition, TakeCover).  Documented approximation: not
the Doom engine."""

from .._lazy import lazy_exports

_EXPORTS = {
    "DoomEnv": "doom_env",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
