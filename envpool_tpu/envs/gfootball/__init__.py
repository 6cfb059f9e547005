"""Google Research Football env family (18 scenarios).

Reference surface: ``envpool/gfootball/`` — SMM observations
(72, 96, 4) uint8 (left team / right team / ball / active player
bitmaps), the 19-action default set, infos score/game_mode/
ball_owned_team/ball_owned_player/steps_left
(``gfootball_common.h:34-46``, ``gfootball_env.h:33-57``).

TPU-native design: the reference wraps the GRF game engine (a native
sim not installed in this image).  Here a vectorized 2D football core
runs on device — player kinematics, possession, passing/shooting ball
flight, simple opponent policy, kickoff/goal rules — with the exact SMM
observation encoding and scenario initial placements.  Documented
approximation: not the GRF physics/AI."""

from .._lazy import lazy_exports

_EXPORTS = {
    "FootballEnv": "football",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
