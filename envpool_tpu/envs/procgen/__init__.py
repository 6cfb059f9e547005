"""Procgen env family (16 games × distribution modes = 50 ids).

Reference surface: ``envpool/procgen/procgen_env.h:39-80`` — 64x64x3
uint8 RGB observations, the 15-action combo set, per-episode procedural
level generation seeded from ``level_seed``, distribution modes
(Easy/Hard/Extreme/Exploration/Memory) scaling world size and entity
counts.

TPU-native design: the reference wraps the native procgen libenv (not
installed in-image).  The games here are faithful-behavior on-device
reimplementations in three engines — grid (maze, heist, chaser, miner),
scroller (bigfish, starpilot, fruitbot, dodgeball, bossfight,
caveflyer, plunder) and platformer (coinrun, ninja, jumper, climber,
leaper) — with procgen's reward schedules and terminal rules; pixel
art is schematic (documented; not the procgen asset sprites)."""

from .._lazy import lazy_exports

_EXPORTS = {
    "ProcgenEnv": "env",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
